"""Similarity search over the `embeddings` table (array<float>, dim 64) —
beyond-reference ANN surface (SURVEY §7 M7).

- brute-force cosine top-k: the exactness baseline. zip_with/aggregate
  fold (JVM-side, codegen) — no Python, no UDF.
- LSH bucketing (random hyperplanes): the scale path. Hyperplane
  components derive deterministically from md5 hex digits so Spark and the
  DuckDB oracle build the *same* planes — no RNG, resumable, portable.

Scale notes (10^9+ vectors):
- brute force is O(Q × N): fine for small query sets / reranking, never
  the full-corpus path.
- lsh_buckets keys every vector by an 8-bit signature → candidate search
  touches ~N/256 per query. The signature is computed map-side in one
  pass; bucket join replaces the N×N cross product. An IVF variant would
  swap hyperplane signs for k-means centroid ids — same plumbing.
- dup detection (cosine ≥ τ over all pairs) stays quadratic by definition;
  at scale run it per-LSH-bucket (candidates) exactly as minhash does for
  text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

#: fold expressions over double arrays (Spark SQL lambda syntax).
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"
_NORM = "sqrt(aggregate(transform({a}, x -> x * x), cast(0 as double), (acc, x) -> acc + x))"

_TO_DOUBLE = "transform(embedding, x -> cast(x as double))"

N_QUERIES = 5  # vec_id < 5 are the demo query vectors
TOP_K = 5
N_PLANES = 8


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors with their norm precomputed ONCE per vector — inside the
    pair loop only the dot-product fold remains (computing norms per pair
    tripled the fold work and the generated code size)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", F.expr(_TO_DOUBLE).alias("v")).withColumn(
        "norm", F.expr(_NORM.format(a="v"))
    )


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for query vectors (vec_id < N_QUERIES),
    excluding self; rank on rounded cosine with vec_id tiebreak so the
    result is deterministic."""
    from pyspark.sql.window import Window

    vec = _vectors(spark, sf_dir)
    q = vec.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    c = vec.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), F.col("norm").alias("cn"))
    pairs = q.crossJoin(c).where(F.col("query_id") != F.col("cand_id"))
    cosine = F.round(
        F.expr(_DOT.format(a="qv", b="cv")) / (F.col("qn") * F.col("cn")), 4
    )
    scored = pairs.select("query_id", "cand_id", cosine.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: all pairs with cosine ≥ 0.8 (embedding-cosine
    near-dup dedup). Quadratic baseline — scale path runs this inside LSH
    buckets."""
    vec = _vectors(spark, sf_dir)
    a = vec.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = vec.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    cosine = F.round(
        F.expr(_DOT.format(a="va", b="vb")) / (F.col("na") * F.col("nb")), 4
    )
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .where(F.col("cosine") >= 0.8)
    )


#: deterministic hyperplane component for plane j, dimension d:
#: md5 hex digit mapped to {-7.5 … +7.5}\{0} — portable to DuckDB.
_PLANE = (
    "cast(instr('0123456789abcdef',"
    " substr(md5(concat(cast({j} as string), ':', cast(d as string))), 1, 1)) - 1"
    " as double) - 7.5"
)


def plane_components(j: int, dim: int = 64) -> list[float]:
    """Hyperplane j's components, computed once driver-side with hashlib —
    byte-identical to the md5 SQL the oracle evaluates per row (DuckDB
    recomputes them; Spark gets them folded in as literals, so the hot
    loop is a pure arithmetic fold with zero hashing)."""
    import hashlib

    out = []
    for d in range(dim):
        digest = hashlib.md5(f"{j}:{d}".encode()).hexdigest()
        out.append(float(int(digest[0], 16)) - 7.5)
    return out


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 sign bits per vector → bucket histogram.
    (The ANN query path: restrict cosine search to same-bucket candidates.)"""
    vec = _vectors(spark, sf_dir)
    bits = []
    for j in range(1, N_PLANES + 1):
        plane = ", ".join(f"{c}D" for c in plane_components(j))
        dot = (
            f"aggregate(zip_with(v, array({plane}), (x, p) -> x * p),"
            f" cast(0 as double), (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    signature = F.expr("concat(" + ", ".join(bits) + ")")
    return (
        vec.select(signature.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


QUERIES = {
    "cosine_topk": cosine_topk,
    "embedding_dup_pairs": embedding_dup_pairs,
    "lsh_buckets": lsh_buckets,
}


def _duck_plane(j: int) -> str:
    return (
        f"CAST(strpos('0123456789abcdef',"
        f" substr(md5({j}::VARCHAR || ':' || d::VARCHAR), 1, 1)) - 1 AS DOUBLE) - 7.5"
    )


_DUCK_BITS = ", ".join(
    f"""CASE WHEN (
            SELECT sum(v[d + 1] * ({_duck_plane(j)})) FROM range(0, 64) AS r(d)
        ) >= 0 THEN '1' ELSE '0' END"""
    for j in range(1, N_PLANES + 1)
)

ORACLE = {
    "cosine_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        p AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   round(list_dot_product(q.v, c.v)
                         / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 4) AS cosine
            FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
        )
        SELECT query_id, cand_id, cosine, rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
            FROM p
        ) WHERE rank <= {TOP_K}
    """,
    "embedding_dup_pairs": """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.8
    """,
    "lsh_buckets": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sigs AS (SELECT vec_id, concat({_DUCK_BITS}) AS bucket FROM e)
        SELECT bucket, count(*) AS n_vectors FROM sigs GROUP BY 1
    """,
}
