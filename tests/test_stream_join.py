"""Stream-stream interval join: match semantics, state-bounding plan,
end-to-end file-stream run."""

from __future__ import annotations

import shutil
import tempfile

from construction_data_lake_et_data_warehouse_tp3_spark.streaming.joins import (
    interval_join_streams,
)

TX_SCHEMA = "tx_id long, user_id long, tx_time timestamp, amount double"
ACK_SCHEMA = "ack_id long, user_id long, ack_time timestamp, status string"


def _write_json(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").json(path)


class TestRedeliveryDedup:
    def test_redelivered_record_lands_once(self, spark):
        """The same transaction_id delivered twice (at-least-once replay)
        must reach the sink exactly once; distinct ids all pass."""
        import datetime as dt

        from construction_data_lake_et_data_warehouse_tp3_spark.streaming.ingest import (
            dedup_redelivered,
        )

        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
        schema = "transaction_id long, event_time timestamp, amount double"
        root = tempfile.mkdtemp(prefix="tp3_redeliver_")
        try:
            rows = [
                (1, t0, 10.0),
                (1, t0, 10.0),  # redelivery, same id
                (2, t0 + dt.timedelta(minutes=1), 20.0),
            ]
            _write_json(spark, rows, schema, f"{root}/src")
            stream = spark.readStream.schema(schema).json(f"{root}/src")
            q = (
                dedup_redelivered(stream)
                .writeStream.format("memory")
                .queryName("redeliver_out")
                .outputMode("append")
                .option("checkpointLocation", f"{root}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            got = sorted(
                (r.transaction_id, r.amount)
                for r in spark.sql("select * from redeliver_out").collect()
            )
            assert got == [(1, 10.0), (2, 20.0)]
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestStreamStreamJoin:
    def test_interval_match_semantics_end_to_end(self, spark):
        """tx(u1, 10:00) matches ack(u1, 10:05) inside 30 min; the ack at
        11:00 is outside the interval and the ack for u9 has no tx."""
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

        def ts(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        root = tempfile.mkdtemp(prefix="tp3_ss_join_")
        try:
            tx_rows = [(1, 1, ts(0), 10.0), (2, 2, ts(0), 20.0)]
            ack_rows = [
                (100, 1, ts(5), "ok"),     # in window → match
                (101, 1, ts(60), "late"),  # 60 min > 30 min → no match
                (102, 9, ts(5), "orphan"), # no tx for user 9
            ]
            _write_json(spark, tx_rows, TX_SCHEMA, f"{root}/tx")
            _write_json(spark, ack_rows, ACK_SCHEMA, f"{root}/ack")
            tx = spark.readStream.schema(TX_SCHEMA).json(f"{root}/tx")
            ack = spark.readStream.schema(ACK_SCHEMA).json(f"{root}/ack")
            joined = interval_join_streams(
                tx, ack, key="user_id", left_time="tx_time", right_time="ack_time"
            )
            q = (
                joined.writeStream.format("memory")
                .queryName("ss_join_out")
                .outputMode("append")
                .option("checkpointLocation", f"{root}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            rows = spark.sql("select * from ss_join_out").collect()
            assert [(r.tx_id, r.ack_id, r.status) for r in rows] == [(1, 100, "ok")]
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def test_plan_is_streaming_symmetric_hash_join(self, spark):
        """The physical join must be the stateful symmetric hash join —
        i.e. Spark accepted the watermark + time bound as a state-bounded
        stream-stream join, not a fallback batch plan."""
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
        root = tempfile.mkdtemp(prefix="tp3_ss_plan_")
        try:
            _write_json(spark, [(1, 1, t0, 1.0)], TX_SCHEMA, f"{root}/tx")
            _write_json(spark, [(9, 1, t0, "ok")], ACK_SCHEMA, f"{root}/ack")
            tx = spark.readStream.schema(TX_SCHEMA).json(f"{root}/tx")
            ack = spark.readStream.schema(ACK_SCHEMA).json(f"{root}/ack")
            joined = interval_join_streams(
                tx, ack, key="user_id", left_time="tx_time", right_time="ack_time"
            )
            q = (
                joined.writeStream.format("noop")
                .option("checkpointLocation", f"{root}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            progress = str(q.lastProgress)
            assert "symmetricHashJoin" in progress, progress
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestStreamStaticEnrichment:
    def test_enrichment_broadcasts_and_keeps_misses(self, spark):
        """Stream-static dim enrichment: matched rows carry dim columns,
        FK misses survive the LEFT join with nulls (quarantine-able, not
        silently dropped), and the static side broadcasts."""
        import tempfile

        from construction_data_lake_et_data_warehouse_tp3_spark.streaming.joins import (
            enrich_stream_with_dim,
        )

        root = tempfile.mkdtemp(prefix="tp3_enrich_")
        try:
            schema = "tx_id long, method string, amount double"
            rows = [(1, "card", 10.0), (2, "paypal", 20.0), (3, "crypto", 30.0)]
            _write_json(spark, rows, schema, f"{root}/src")
            dim = spark.createDataFrame(
                [("card", 101), ("paypal", 102)],
                "payment_method_name string, payment_method_id int",
            )
            stream = spark.readStream.schema(schema).json(f"{root}/src")
            enriched = enrich_stream_with_dim(
                stream, dim, "method", "payment_method_name"
            )
            q = (
                enriched.writeStream.format("memory")
                .queryName("enrich_out")
                .outputMode("append")
                .option("checkpointLocation", f"{root}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            got = {
                r.tx_id: r.payment_method_id
                for r in spark.sql("select * from enrich_out").collect()
            }
            assert got == {1: 101, 2: 102, 3: None}
            # the dim side must be a broadcast join in the streaming plan
            plan = enriched._jdf.queryExecution().analyzed().toString()
            assert "ResolvedHint" in plan or "broadcast" in plan.lower()
        finally:
            shutil.rmtree(root, ignore_errors=True)
