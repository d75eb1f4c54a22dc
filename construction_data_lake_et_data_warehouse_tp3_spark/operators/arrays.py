"""Array-function surface over the embeddings table (the reference has no
array data — SURVEY §1.3 note says the engine should still accept and
operate on ArrayType; this exercises the lambda-expression family:
transform / filter / aggregate / slice / sort against DuckDB's list
functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table


def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector array ops: length, extremes, head-slice sum, count of
    positive components, L1 norm — all JVM lambda expressions (values
    rounded at 4dp; folds run in identical element order both engines)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = "transform(embedding, x -> cast(x as double))"
    return emb.select(
        "vec_id",
        F.expr(f"size(embedding)").alias("dim"),
        F.expr(f"round(array_max({v}), 4)").alias("max_c"),
        F.expr(f"round(array_min({v}), 4)").alias("min_c"),
        F.expr(
            f"round(aggregate(slice({v}, 1, 8), cast(0 as double), (a, x) -> a + x), 4)"
        ).alias("head8_sum"),
        F.expr(f"size(filter({v}, x -> x > 0))").alias("n_positive"),
        F.expr(
            f"round(aggregate({v}, cast(0 as double), (a, x) -> a + abs(x)), 4)"
        ).alias("l1_norm"),
    )


QUERIES = {"array_functions_showcase": array_functions_showcase}

ORACLE = {
    "array_functions_showcase": """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT vec_id,
               len(v) AS dim,
               round(list_max(v), 4) AS max_c,
               round(list_min(v), 4) AS min_c,
               round(list_sum(v[1:8]), 4) AS head8_sum,
               len(list_filter(v, x -> x > 0)) AS n_positive,
               round(list_sum(list_transform(v, x -> abs(x))), 4) AS l1_norm
        FROM e
    """,
}
