"""Persisted ANN index — fit the IVF coarse quantizer ONCE, store it as
versioned lake tables, and serve top-k against the stored index without
refitting.

This is the standard 100 TB embedding-retrieval shape (FAISS-style:
train offline, then probe forever) and the missing third leg of the IVF
family: `operators/clustering.ivf_kmeans_topk` refits per query run, and
`streaming/ann_stream.StreamingVectorIndex` maintains postings but holds
its quantizer only in memory. Here both halves live under the lake root
as ordinary version-partitioned table feeds (reusing the commit-log
claim/commit semantics of `lake/writer.py:export_table`, which the
reference sets with its version directories,
reference/export_to_data_lake.py:160-212), so an index build is atomic,
versioned, retained by keep_versions, and readable by ANY later session.

Two tables per index `<name>`:

- ``<name>_centroids``: (cid, cd array<double>) — the frozen coarse
  quantizer, K rows.
- ``<name>_postings``:  (vec_id, cid, vint array<bigint>) — every vector
  in exact int64 micro-units with its cell id (the inverted lists).

Exactness: quantization, training, assignment, and the probe/rerank all
reuse the clustering module's fixed-point kernels (prep_vectors, _train,
_assign, ivf_probe_topk), and parquet round-trips both the int64 units
and the centroid doubles bit-for-bit — so query-after-reload equals
query-against-fresh-fit EXACTLY (tests/test_ann_index.py locks this).

Scale shape: build = one training run (per iteration: broadcast
crossJoin against K rows + a K×DIM-group shuffle) plus one map-side
assignment pass; the postings write is partitioned by nothing here but
at 10^9 vectors you'd `partitionBy("cid")` so a probe prunes to
nprobe/K of the files. Queries broadcast K centroid rows and join on
cid — inverted-list locality, never a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import (
    NPROBE,
    SCALE,
    TOP_K,
    _NORM,
    _assign,
    _train,
    ivf_probe_topk,
    prep_vectors,
)
from .catalog import FeedCatalog, FeedConfig, FeedType, PartitioningType, StorageMode
from .writer import DataLakeWriter


def _table_cfg(feed_name: str) -> FeedConfig:
    return FeedConfig(
        feed_name=feed_name,
        feed_type=FeedType.TABLE,
        source="ann-index",
        description="persisted ANN index component",
        partitioning=PartitioningType.VERSION,
        storage_mode=StorageMode.OVERWRITE,
    )


class AnnIndex:
    """Versioned IVF index persisted under a lake root.

    ``AnnIndex.build(spark, lake_root, vectors)`` fits and stores a new
    version; ``AnnIndex(spark, lake_root)`` opens the latest committed
    version for querying (no refit)."""

    def __init__(self, spark: SparkSession, lake_root: str, name: str = "ann"):
        self.spark = spark
        self.name = name
        self.catalog = FeedCatalog(lake_root)
        self.writer = DataLakeWriter(spark, self.catalog)

    # ---- feed plumbing ---------------------------------------------------

    def _cfg(self, part: str) -> FeedConfig:
        feed = f"{self.name}_{part}"
        try:
            return self.catalog.get(feed)
        except KeyError:
            return self.catalog.add(_table_cfg(feed))

    # ---- build side ------------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        lake_root: str,
        vectors: DataFrame,
        name: str = "ann",
    ) -> dict:
        """Fit the quantizer on (vec_id, embedding) rows and persist both
        index tables as new committed versions. Returns build metadata."""
        idx = cls(spark, lake_root, name)
        vecs = prep_vectors(vectors)
        cents = _train(vecs)
        postings = _assign(vecs, cents).select("vec_id", "cid", "vint")
        meta_c = idx.writer.export_table(cents.select("cid", "cd"), idx._cfg("centroids"))
        meta_p = idx.writer.export_table(postings, idx._cfg("postings"))
        return {
            "name": name,
            "centroid_version": meta_c.get("version"),
            "posting_version": meta_p.get("version"),
            "centroids": meta_c.get("records"),
            "vectors": meta_p.get("records"),
        }

    @classmethod
    def publish_from(
        cls,
        spark: SparkSession,
        lake_root: str,
        stream_index,
        name: str = "ann",
    ) -> dict:
        """Publish a continuously-maintained StreamingVectorIndex
        (streaming/ann_stream.py) as a new committed persisted-index
        version: the stream store's postings (already cell-assigned with
        the SAME _assign kernel) and its frozen centroids export through
        the commit-log path. This is the FAISS-style lifecycle closed
        end to end — train offline, ingest continuously, snapshot the
        live index into a versioned artifact any later session can
        probe; the in-flight stream keeps folding while readers pin the
        published version."""
        idx = cls(spark, lake_root, name)
        meta_c = idx.writer.export_table(
            stream_index.centroids.select("cid", "cd"), idx._cfg("centroids")
        )
        meta_p = idx.writer.export_table(
            stream_index.table.read().select("vec_id", "cid", "vint"),
            idx._cfg("postings"),
        )
        return {
            "name": name,
            "centroid_version": meta_c.get("version"),
            "posting_version": meta_p.get("version"),
            "centroids": meta_c.get("records"),
            "vectors": meta_p.get("records"),
        }

    def publish_postings(self, postings: DataFrame) -> dict:
        """Export a (vec_id, cid, vint) postings frame as a new committed
        postings version under the EXISTING centroids — the CLI half of
        publish_from for a stream store opened by path. Requires a
        committed centroids version: postings carry cell ids that only
        mean anything under the quantizer that assigned them."""
        if not self.writer.committed_versions(self._cfg("centroids")):
            raise LookupError(
                f"index {self.name!r} has no committed centroids; "
                "run `ann build` first — stream postings are only valid "
                "under the quantizer that assigned them"
            )
        meta_p = self.writer.export_table(
            postings.select("vec_id", "cid", "vint"), self._cfg("postings")
        )
        return {
            "name": self.name,
            "posting_version": meta_p.get("version"),
            "vectors": meta_p.get("records"),
        }

    # ---- read side -------------------------------------------------------

    def centroids(self, version: int | None = None) -> DataFrame:
        return self.writer.read_table_feed(self._cfg("centroids"), version=version)

    def postings(self, version: int | None = None) -> DataFrame:
        return self.writer.read_table_feed(self._cfg("postings"), version=version)

    def topk(
        self,
        queries: DataFrame,
        k: int = TOP_K,
        nprobe: int = NPROBE,
        version: int | None = None,
    ) -> DataFrame:
        """ANN top-k for (query_id, embedding) rows against the stored
        index — identical kernel (ivf_probe_topk) to the fresh-fit and
        streaming paths, reading centroids + postings from the lake."""
        q = prep_vectors(
            queries.select(F.col("query_id").alias("vec_id"), "embedding")
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("vd").alias("qv"),
            F.expr(_NORM.format(a="vd")).alias("qn"),
        )
        stored = (
            self.postings(version)
            .select(
                F.col("vec_id").alias("cand_id"),
                "cid",
                F.expr(f"transform(vint, i -> i / CAST({SCALE} AS DOUBLE))").alias("cv"),
            )
            .withColumn("cn", F.expr(_NORM.format(a="cv")))
        )
        return ivf_probe_topk(self.centroids(version), stored, q, k=k, nprobe=nprobe)
