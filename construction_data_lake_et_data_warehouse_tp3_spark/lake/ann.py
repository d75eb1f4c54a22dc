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
reuse the clustering module's fixed-point kernels (prep_vectors,
assign_adaptive, ivf_probe_topk), and parquet round-trips both the int64 units
and the centroid doubles bit-for-bit — so query-after-reload equals
query-against-fresh-fit EXACTLY (tests/test_ann_index.py locks this).

Scale shape: build = one training run (per iteration: broadcast
crossJoin against K rows + a K×DIM-group shuffle) plus one map-side
assignment pass; the postings version is laid out `partitionBy("cid")`
(VERDICT r9 ask #4) and the probe pushes a static `cid IN (probed)`
predicate, so a probe OPENS only nprobe/K of the posting files —
partition pruning measured in tests/test_ann_index.py and SCALING.md.
Queries broadcast K centroid rows and join on cid — inverted-list
locality, never a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import (
    NPROBE,
    SCALE,
    TOP_K,
    _NORM,
    ivf_probe_topk,
    prep_vectors,
    probe_cells,
    quantizer_fingerprint,
)
from .catalog import FeedCatalog, FeedConfig, FeedType, PartitioningType, StorageMode
from .writer import DataLakeWriter


def _fp_mismatch_hint(a: str, b: str) -> str:
    """Extra diagnosis when two quantizer fingerprints differ: if their
    ALGORITHM VERSION prefixes differ (ADVICE r8 — v1 stamps were
    unprefixed grid-rounded hashes, v2+ are 'vN:'-prefixed exact-bits
    hashes), the mismatch is the fingerprint algorithm changing, not the
    quantizers — the fix is a one-time store rebuild, not chasing a
    phantom corpus divergence."""
    va = a.split(":", 1)[0] if ":" in a else "v1"
    vb = b.split(":", 1)[0] if ":" in b else "v1"
    if va != vb:
        return (
            f" NOTE: the two stamps use different fingerprint ALGORITHM "
            f"versions ({va} vs {vb}) — the store predates the current "
            "algorithm; rebuild it once (ann build / republish) rather "
            "than diagnosing a quantizer divergence."
        )
    return ""


def _sole_fingerprint(df: DataFrame, what: str) -> str | None:
    """The single quantizer fingerprint a frame is stamped with, or None
    when the frame predates stamping (no qfp column / no rows). A frame
    carrying MORE than one distinct fingerprint is corrupt by definition
    (its cell ids were assigned by different quantizers) and raises —
    deterministically, unlike sampling one arbitrary row."""
    if "qfp" not in df.columns:
        return None
    fps = sorted(r.qfp for r in df.select("qfp").distinct().collect() if r.qfp is not None)
    if len(fps) > 1:
        raise ValueError(
            f"{what} mixes rows stamped under {len(fps)} different "
            f"quantizers ({', '.join(fp[:12] + '…' for fp in fps)}) — "
            "the store is corrupt; rebuild it under one quantizer"
        )
    return fps[0] if fps else None


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
        #: (centroid_version, posting_version) pairs whose fingerprint
        #: equality has already been verified by this instance (ADVICE
        #: r8): committed version dirs are immutable (overwrite-publish
        #: allocates a NEW version), so a validated pair stays valid and
        #: repeated probes of a pinned version skip the qfp column scan.
        self._verified_pairs: set[tuple[int, int]] = set()

    # ---- feed plumbing ---------------------------------------------------

    def _cfg(self, part: str) -> FeedConfig:
        feed = f"{self.name}_{part}"
        try:
            return self.catalog.get(feed)
        except KeyError:
            return self.catalog.add(_table_cfg(feed))

    def _export_postings(self, postings: DataFrame) -> dict:
        """Publish a postings frame laid out for probe-time pruning
        (VERDICT r9 ask #4): `partitionBy("cid")` makes each inverted
        list its own directory so a probe's static `cid IN (...)` filter
        prunes whole files at planning time, and the hash repartition on
        cid co-locates each cell into one task's output instead of
        tasks×cells small files (at 10⁹ vectors: ~cells/shuffle-partition
        cells per file, still cleanly prunable; without it every write
        task emits a sliver per cell it happens to hold)."""
        return self.writer.export_table(
            postings.repartition("cid"),
            self._cfg("postings"),
            partition_cols=("cid",),
        )

    # ---- build side ------------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        lake_root: str,
        vectors: DataFrame,
        name: str = "ann",
        k: int | None = None,
    ) -> dict:
        """Fit the quantizer on (vec_id, embedding) rows and persist both
        index tables as new committed versions. Returns build metadata.

        ``k`` sizes the quantizer (default: the testdata K_CLUSTERS the
        oracles unroll). A production build passes k ≈ √N so expected
        cell size stays constant; above the HIER_CUTOFF the training
        routes through the two-level assign_adaptive form (N·√K work,
        not the N·K flat crossJoin that compounds when K ∝ N) while the
        PERSISTED tables keep the exact flat shape — (cid, cd) leaf
        centroids + cid-partitioned postings — so probe, pruning, and
        fingerprint pairing are identical either way."""
        from ..operators.clustering import K_CLUSTERS, assign_adaptive

        idx = cls(spark, lake_root, name)
        vecs = prep_vectors(vectors)
        assigned, cents = assign_adaptive(
            vecs, K_CLUSTERS if k is None else k, return_centroids=True
        )
        fp = quantizer_fingerprint(cents)
        postings = assigned.select("vec_id", "cid", "vint")
        meta_c = idx.writer.export_table(
            cents.select("cid", "cd").withColumn("qfp", F.lit(fp)),
            idx._cfg("centroids"),
        )
        meta_p = idx._export_postings(postings.withColumn("qfp", F.lit(fp)))
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
        fp = quantizer_fingerprint(stream_index.centroids)
        meta_c = idx.writer.export_table(
            stream_index.centroids.select("cid", "cd").withColumn("qfp", F.lit(fp)),
            idx._cfg("centroids"),
        )
        meta_p = idx._export_postings(
            stream_index.table.read()
            .select("vec_id", "cid", "vint")
            .withColumn("qfp", F.lit(fp))
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
        # stamp AND verify the quantizer identity: a stream store carries
        # the fingerprint of the quantizer that assigned its cells
        # (StreamingVectorIndex stamps each row); publishing it under a
        # mismatching centroids version would make every probe silently
        # wrong, so that is an error, not a warning. The column-existence
        # check runs BEFORE any select so a legacy centroids table
        # without qfp takes the own_fp=None fallback instead of raising
        # AnalysisException, and DISTINCT fingerprints are compared (not
        # one arbitrary limit(1) row) so a store mixing rows stamped
        # under two quantizers fails deterministically.
        own_fp = _sole_fingerprint(self.centroids(), f"index {self.name!r} centroids")
        if "qfp" in postings.columns:
            store_fp = _sole_fingerprint(postings, "stream store postings")
            if store_fp is not None and own_fp is not None and store_fp != own_fp:
                raise ValueError(
                    f"quantizer mismatch: stream store was assigned under "
                    f"quantizer {store_fp[:12]}… but index "
                    f"{self.name!r}'s committed centroids are "
                    f"{own_fp[:12]}… — rebuild the stream store against "
                    "the current centroids or re-run ann build"
                    + _fp_mismatch_hint(store_fp, own_fp)
                )
        meta_p = self._export_postings(
            # cast the stamp: F.lit(None) alone is void-typed, which the
            # parquet writer rejects when own_fp is the legacy fallback
            postings.select("vec_id", "cid", "vint").withColumn(
                "qfp", F.lit(own_fp).cast("string")
            )
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
        # resolve the CONCRETE version pair first (metadata-only; no data
        # scan) and read THOSE versions explicitly (ADVICE r9): resolving
        # the memo key and then re-reading "latest" separately would let a
        # publish landing in between verify one version pair but memoize
        # another — permanently skipping the pairing guard for a pair this
        # instance never actually checked.
        c_ver = version if version is not None else max(
            self.writer.committed_versions(self._cfg("centroids")) or {-1}
        )
        p_ver = version if version is not None else max(
            self.writer.committed_versions(self._cfg("postings")) or {-1}
        )
        # -1 = no committed version; pass None through so read_table_feed
        # raises its canonical LookupError
        cents = self.centroids(c_ver if c_ver >= 0 else None)
        posts = self.postings(p_ver if p_ver >= 0 else None)
        # pairing guard: the probed postings must have been assigned by
        # the probed centroids (publish can advance the two feeds at
        # different rates; a mismatched pair returns silently wrong
        # neighbors, so it raises instead). DISTINCT fingerprints, not
        # limit(1): a postings version mixing rows stamped under two
        # quantizers must fail every probe, not only the probes whose
        # arbitrary sampled row happened to mismatch. The distinct is a
        # column-pruned scan of one dictionary-encoded string column —
        # and it runs ONCE per (centroid, posting) version pair per
        # instance (ADVICE r8): committed version dirs are immutable, so
        # repeated probes of a validated pair skip the rescan.
        if (
            (c_ver, p_ver) not in self._verified_pairs
            and "qfp" in cents.columns
            and "qfp" in posts.columns
        ):
            c_fp = _sole_fingerprint(cents, f"index {self.name!r} centroids")
            p_fp = _sole_fingerprint(posts, f"index {self.name!r} postings")
            if c_fp is not None and p_fp is not None and c_fp != p_fp:
                raise ValueError(
                    f"quantizer mismatch in index {self.name!r}: centroids "
                    f"{c_fp[:12]}… vs postings {p_fp[:12]}… — "
                    "pin matching versions or republish"
                    + _fp_mismatch_hint(c_fp, p_fp)
                )
            self._verified_pairs.add((c_ver, p_ver))
        q = prep_vectors(
            queries.select(F.col("query_id").alias("vec_id"), "embedding")
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("vd").alias("qv"),
            F.expr(_NORM.format(a="vd")).alias("qn"),
        )
        # probed-cell pushdown: the postings version is laid out
        # partitionBy("cid") (build/publish), so a STATIC `cid IN (...)`
        # predicate prunes whole posting files at planning time —
        # nprobe/K of the inverted lists are ever opened, the IVF promise
        # made physical. The probe set is computed ONCE (ADVICE r10):
        # localCheckpoint materializes the query×centroid scoring, the
        # distinct probed cids collect from THOSE blocks (driver-side but
        # bounded by K — the quantizer size — NEVER the corpus or query
        # count), and the SAME frame feeds the probe kernel, so the
        # pruned scan and the join read one cell set by construction
        # instead of by coupled determinism across two jobs. Queries
        # with zero norm are excluded exactly as the kernel excludes
        # them; the checkpointed blocks are queries×nprobe rows and are
        # freed with the frame.
        qcells = probe_cells(
            cents, q.where(F.col("qn") > 0), nprobe
        ).localCheckpoint(eager=True)
        cells = [r.cid for r in qcells.select("cid").distinct().collect()]
        stored = (
            posts.where(F.col("cid").isin(cells))
            .select(
                F.col("vec_id").alias("cand_id"),
                "cid",
                F.expr(f"transform(vint, i -> i / CAST({SCALE} AS DOUBLE))").alias("cv"),
            )
            .withColumn("cn", F.expr(_NORM.format(a="cv")))
        )
        return ivf_probe_topk(cents, stored, q, k=k, nprobe=nprobe, qcells=qcells)
