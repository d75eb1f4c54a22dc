"""Semantics + physical-plan locks for the corpus-quality operators
(operators/quality.py). Value correctness is oracle-checked in
test_oracle_parity.py; these tests lock the invariants and the plan
shapes that make the operators viable at 100 TB."""

from __future__ import annotations

from construction_data_lake_et_data_warehouse_tp3_spark.operators import quality
from construction_data_lake_et_data_warehouse_tp3_spark.plans import (
    has_broadcast_join,
    shuffle_exchange_count,
    wholestage_codegen_spans,
)

SF_DIR = "/root/testdata/sf0.001"


class TestQualitySemantics:
    def test_quality_filters_invariants(self, spark):
        rows = quality.quality_filters(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert r.n_words > 0
            assert 0.0 <= r.symbol_ratio <= 1.0
            if r.keep:
                assert r.has_stopword
                assert quality.MIN_WORDS <= r.n_words <= quality.MAX_WORDS

    def test_repetition_stats_bounds(self, spark):
        rows = quality.repetition_stats(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            # top-word fraction ≥ 1/n (something is always the mode) and
            # distinct ratio × top fraction can't both be 1 unless n=1
            assert 0 < r.top_word_frac <= 1.0
            assert 0 < r.distinct_word_ratio <= 1.0
            if r.n_words >= 2:
                assert 0 < r.top_bigram_frac <= 1.0

    def test_decontaminate_excludes_eval_slice(self, spark):
        rows = quality.decontaminate(spark, SF_DIR).collect()
        assert all(r.doc_id % quality.EVAL_MOD != 0 for r in rows)
        assert all(r.n_contaminated_ngrams >= 1 for r in rows)

    def test_decontaminate_with_external_eval_table(self, spark):
        """The production entry point: passing the same docs the modulo
        slice selects as an explicit eval table must reproduce the
        registry result exactly."""
        from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
            load_table,
        )
        from pyspark.sql import functions as F

        ev = (
            load_table(spark, SF_DIR, "documents")
            .where(F.col("doc_id") % quality.EVAL_MOD == 0)
            .select("doc_id", "text")
        )
        via_table = {
            (r.doc_id, r.n_contaminated_ngrams)
            for r in quality.decontaminate(spark, SF_DIR, eval_docs=ev).collect()
        }
        via_slice = {
            (r.doc_id, r.n_contaminated_ngrams)
            for r in quality.decontaminate(spark, SF_DIR).collect()
        }
        assert via_table == via_slice

    def test_short_doc_shingles_and_bigrams_are_empty(self, spark):
        """Docs with fewer words than the n-gram width must yield an EMPTY
        array, not an error: Spark's sequence(1, 0) is a decrementing
        [1, 0], so an unguarded generator throws INVALID_ARRAY_INDEX /
        INVALID_PARAMETER_VALUE.START on any corpus with a short doc
        (the bundled corpus never has one — production corpora do)."""
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d"), (5, "")],
            "doc_id INT, text STRING",
        )
        rows = docs.select(
            "doc_id",
            F.expr(quality._SHINGLES.format(ws=quality.TOKENS)).alias("sh"),
            F.expr(quality._BIGRAMS.format(ws=quality.TOKENS)).alias("bg"),
        ).collect()
        by_id = {r.doc_id: r for r in rows}
        assert by_id[1].sh == [] and by_id[1].bg == []
        assert by_id[2].sh == [] and by_id[2].bg == ["a b"]
        assert by_id[3].sh == [] and by_id[3].bg == ["a b", "b c"]
        assert by_id[4].sh == ["a b c d"]
        assert by_id[5].sh == [] and by_id[5].bg == []

    def test_decontaminate_handles_short_eval_docs(self, spark):
        """decontaminate(eval_docs=...) is the advertised production entry
        point — a 1-word eval doc must not crash the shingle generator."""
        ev = spark.createDataFrame([(999_999, "hi")], "doc_id BIGINT, text STRING")
        rows = quality.decontaminate(spark, SF_DIR, eval_docs=ev).collect()
        assert rows == []  # no 4-word shingle can overlap

    def test_pii_scrub_finds_injected_pii(self, spark):
        rows = quality.pii_scrub(spark, SF_DIR).collect()
        assert rows
        # exactly the one injected email + one phone per document, and the
        # scrub must remove every match (hash of a string still containing
        # '@example.com' would differ — length shrinks for long ids)
        assert all(r.n_emails == 1 for r in rows)
        assert all(r.n_phones == 1 for r in rows)

    def test_domain_mix_shares_sum_to_one(self, spark):
        rows = quality.domain_mix(spark, SF_DIR).collect()
        assert rows
        assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-3
        assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
        assert all(0 < r.sample_weight <= 1.0 for r in rows)

    def test_length_histogram_counts_every_doc(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
            load_table,
        )

        total = load_table(spark, SF_DIR, "documents").count()
        rows = quality.length_histogram(spark, SF_DIR).collect()
        assert sum(r.n_docs for r in rows) == total
        assert all(r.bucket_lo % quality.LEN_BUCKET == 0 for r in rows)


class TestQualityPlans:
    def test_repetition_stats_is_map_only(self, spark):
        """The sorted-run fold must not explode tokens: the only Exchange
        allowed is load_table's small-input parallelism repartition (which
        never fires on a real multi-file layout) — no aggregation
        shuffle."""
        df = quality.repetition_stats(spark, SF_DIR)
        assert shuffle_exchange_count(df) <= 1
        assert wholestage_codegen_spans(df) >= 1

    def test_quality_filters_is_map_only(self, spark):
        df = quality.quality_filters(spark, SF_DIR)
        assert shuffle_exchange_count(df) <= 1

    def test_decontaminate_broadcasts_eval_ngrams(self, spark):
        assert has_broadcast_join(quality.decontaminate(spark, SF_DIR))

    def test_training_manifest_composition(self, spark):
        """The capstone keep set: every kept doc passes the gate, is its
        hash's survivor, is outside the eval slice, and carries its
        source's domain weight; contaminated docs are gone."""
        m = {r.doc_id: r for r in quality.training_manifest(spark, SF_DIR).collect()}
        assert m
        gate = {r.doc_id: r.keep for r in quality.quality_filters(spark, SF_DIR).collect()}
        contaminated = {
            r.doc_id for r in quality.decontaminate(spark, SF_DIR).collect()
        }
        weights = {
            r.source: r.sample_weight for r in quality.domain_mix(spark, SF_DIR).collect()
        }
        for doc_id, r in m.items():
            assert gate[doc_id]
            assert doc_id % quality.EVAL_MOD != 0
            assert doc_id not in contaminated
            assert r.weight == weights[r.source]

    def test_training_manifest_broadcasts_small_sides(self, spark):
        from construction_data_lake_et_data_warehouse_tp3_spark.plans import (
            has_broadcast_join,
        )

        assert has_broadcast_join(quality.training_manifest(spark, SF_DIR))

    def test_training_manifest_single_corpus_text_scan(self, spark):
        """The capstone's only corpus-wide text work — gate signals,
        content hash, contamination flag — must live in ONE documents
        scan. The other documents scans in the plan are the eval slice
        (doc_id % EVAL_MOD pushed to the scan) and the pruned source
        column for domain_mix; a scan that reads text WITHOUT the eval
        pushdown beyond the first is a regression to the r4 three-scan
        shape."""
        plan = (
            quality.training_manifest(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        text_scans = [
            line
            for line in plan.splitlines()
            if "FileScan parquet" in line
            and "documents.parquet" in line
            and "text#" in line.split("FileScan")[1][:120]  # ReadSchema cols
        ]
        # scans whose pushed filters lack the eval modulo — exactly one
        # such scan may read text. Match the modulo PREDICATE, not a bare
        # "97" substring (expression ids like text#197 would false-match)
        full = [line for line in text_scans if "% 97" not in line]
        assert len(full) <= 1, plan

    def test_domain_mix_single_corpus_scan(self, spark):
        """The totals come from a window over the ~|sources| aggregated
        rows — the corpus parquet must appear in the plan exactly once
        (the crossJoin-1-row-agg shape re-scans it)."""
        plan = quality.domain_mix(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("documents.parquet") <= 1
