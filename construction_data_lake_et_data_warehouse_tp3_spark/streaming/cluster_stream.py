"""Incremental dup-cluster maintenance — the streaming twin of the batch
connected-components labeling (operators/curation.py:cluster_edges /
dup_clusters), closing the batch↔streaming story for the curation
pipeline (VERDICT r5 "Next round" #8).

The reference has no dedup story at all (its ingest path,
reference/kafka_consumer_datalake.py:59-66, appends raw); the batch
operators here label a finished corpus.  A pipeline that ingests forever
needs the labels maintained as verified near-dup pairs ARRIVE: each
micro-batch of edges can only MERGE existing clusters (edges are never
retracted), so the union-find-style fold below touches one reduced graph
per batch instead of re-running corpus-wide CC.

Per micro-batch of verified pairs (doc_a, doc_b):

1. ledger check — replays of an applied batch are no-ops (the
   index_stream/rollup_stream exactly-once discipline).
2. MERGE the edges into the persistent edge store keyed (doc_a, doc_b)
   (idempotent; also what the differential test replays batch CC over).
3. resolve both endpoints to their CURRENT labels (left join against the
   label store; an unseen node is its own label) and build the REDUCED
   graph whose nodes are labels, not documents.  Its size is bounded by
   2×|batch| regardless of corpus size.
4. run the SAME min-label propagation as the batch path (cluster_edges
   is imported, not reimplemented, so the two can never drift) on the
   reduced graph → a remap old_label -> new_root.
5. apply the remap: store rows whose label was absorbed re-label via a
   BROADCAST join (the remap is batch-bounded, never corpus-sized), and
   the batch's own nodes upsert with their final labels.  Both writes are
   keyed MERGEs on node, so a crash-and-replay converges to the same
   store.

Monotonicity is the correctness backbone: labels only ever decrease
(min-label), so replays and re-deliveries can never split or regress a
cluster — the fold is an idempotent, commutative-across-batches monoid
on the edge set, which is exactly why incremental == batch bit-for-bit
(tests/test_cluster_stream.py proves it differentially).

Scale: per batch the reduced-graph CC is O(batch-cluster overlap), the
remap application is one broadcast join against the label store, and the
store rewrite is the plain-parquet MERGE trade-off (warehouse/merge.py
scale notes) — at 100 TB back the stores with a partitioned/Delta table
hash-partitioned on node so the MERGE touches only affected partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import cluster_edges
from ..warehouse.merge import ParquetTable, merge_into

#: reduced-graph size gate for the driver-side union-find fast path.
#: The reduced graph is ≤ |batch| edges over label-nodes BY CONSTRUCTION
#: (one reduced edge per batch pair), and n_edges is COUNTED before the
#: choice — below the gate a local union-find replaces ~10 Spark jobs of
#: iterative propagation with one collect of batch-bounded metadata
#: (this is remap computation, not corpus data); above it the SAME
#: distributed min-label loop as the batch path runs. Both produce the
#: identical old_label -> min-reachable-label map.
SMALL_GRAPH_EDGES = 100_000


def _local_min_label(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Union-find with min-member roots: (node, min reachable label) for
    every node appearing in `edges` — the exact semantics of
    cluster_edges restricted to the remap columns."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [(n, find(n)) for n in parent]


class StreamingClusterMaintainer:
    """Persistent incremental connected-components over micro-batches of
    verified dup pairs (doc_a, doc_b)."""

    def __init__(self, spark: SparkSession, store_root: str):
        self.spark = spark
        self.edge_table = ParquetTable(spark, os.path.join(store_root, "edges"))
        self.label_table = ParquetTable(spark, os.path.join(store_root, "labels"))
        self.applied = ParquetTable(spark, os.path.join(store_root, "applied"))

    # ---- state views ----------------------------------------------------

    def edges(self) -> DataFrame:
        if self.edge_table.exists():
            return self.edge_table.read()
        return self.spark.createDataFrame([], "doc_a long, doc_b long")

    def labels(self) -> DataFrame:
        if self.label_table.exists():
            return self.label_table.read()
        return self.spark.createDataFrame([], "node long, lbl long")

    def clusters(self) -> DataFrame:
        """The dup_clusters-shaped view of the maintained state:
        (doc_id, cluster_id, cluster_size, is_canonical)."""
        labels = self.labels()
        sizes = labels.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
        return labels.join(sizes, "lbl").select(
            F.col("node").alias("doc_id"),
            F.col("lbl").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("lbl")).alias("is_canonical"),
        )

    # ---- the foreachBatch body ------------------------------------------

    def _is_applied(self, batch_id: int) -> bool:
        if not self.applied.exists():
            return False
        return (
            self.applied.read().where(F.col("batch_id") == batch_id).limit(1).count()
            > 0
        )

    def process_batch(self, pairs: DataFrame, batch_id: int) -> dict:
        """Fold one micro-batch of verified pairs into the cluster state.
        Returns {edges, relabeled} counts; replays are no-ops."""
        if self._is_applied(batch_id):
            return {"edges": 0, "relabeled": 0}
        batch = (
            pairs.select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .where(F.col("doc_a") != F.col("doc_b"))
            .distinct()
            .persist()
        )
        n_edges = batch.count()
        if n_edges:
            merge_into(self.edge_table, batch, ("doc_a", "doc_b"))

            # endpoints -> current labels (unseen node = its own label)
            cur = self.labels()
            nodes = (
                batch.select(F.col("doc_a").alias("node"))
                .union(batch.select(F.col("doc_b").alias("node")))
                .distinct()
                .join(cur, "node", "left")
                .select("node", F.coalesce("lbl", "node").alias("cur_lbl"))
                .persist()
            )
            la = nodes.select(
                F.col("node").alias("doc_a"), F.col("cur_lbl").alias("la")
            )
            lb = nodes.select(
                F.col("node").alias("doc_b"), F.col("cur_lbl").alias("lb")
            )
            reduced = (
                batch.join(la, "doc_a")
                .join(lb, "doc_b")
                .select(F.col("la").alias("doc_a"), F.col("lb").alias("doc_b"))
            )
            # old_label -> min reachable label over the reduced graph:
            # local union-find below the size gate (n_edges is already
            # counted and bounds the reduced edge count), the SAME
            # distributed min-label propagation as the batch path above
            if n_edges <= SMALL_GRAPH_EDGES:
                pairs_local = [
                    (r.doc_a, r.doc_b) for r in reduced.collect()
                ]
                remap = self.spark.createDataFrame(
                    _local_min_label(pairs_local),
                    "old_lbl long, new_lbl long",
                )
            else:
                # max_iters=None: the reduced graph is batch-bounded, so
                # running to convergence is safe and keeps the documented
                # "identical remap" invariant for diameters > the batch cap
                remap = cluster_edges(reduced, max_iters=None).select(
                    F.col("doc_id").alias("old_lbl"),
                    F.col("cluster_id").alias("new_lbl"),
                )

            # store rows whose label was absorbed by a merge re-label;
            # remap is batch-bounded -> broadcast, no store-wide shuffle
            absorbed = (
                cur.join(
                    F.broadcast(remap.where(F.col("old_lbl") != F.col("new_lbl"))),
                    cur.lbl == F.col("old_lbl"),
                )
                .select("node", F.col("new_lbl").alias("lbl"))
            )
            # the batch's own nodes land with their final labels
            batch_labels = (
                nodes.join(
                    F.broadcast(remap), nodes.cur_lbl == F.col("old_lbl"), "left"
                )
                .select(
                    "node", F.coalesce("new_lbl", "cur_lbl").alias("lbl")
                )
            )
            updates = absorbed.union(batch_labels).groupBy("node").agg(
                F.min("lbl").alias("lbl")
            )
            n_relabeled = merge_into(self.label_table, updates, ("node",))
            nodes.unpersist()
        else:
            n_relabeled = 0
        batch.unpersist()
        ledger = self.spark.createDataFrame([(batch_id,)], "batch_id long")
        merge_into(self.applied, ledger, ("batch_id",))
        return {"edges": n_edges, "relabeled": n_relabeled}

    # ---- streaming attach ------------------------------------------------

    def attach(self, stream: DataFrame, checkpoint: str):
        """Attach to a stream of (doc_a, doc_b) verified-pair rows."""
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
