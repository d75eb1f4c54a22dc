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
DIM = 64  # corpus dimensionality; vectors of any other length are malformed

#: near-dup cosine threshold shared by the brute-force and bucketed
#: variants (so the bucketed result is provably ⊆ the brute-force one).
#: This corpus tops out around cosine 0.6, so both return 0 rows on the
#: test tables — recall/selectivity of the bucketed path is exercised on
#: planted near-dup vectors in tests/test_similarity_bucketed.py instead.
DUP_TAU = 0.8

#: LSH tables for the bucketed dup scan: band 0 is EXACTLY the
#: lsh_buckets signature (planes 1-8); band 1 uses planes 9-16. With
#: p = 1 - θ/π per plane, pair recall is 1-(1-p^8)^2: ~0.90 at
#: cosine 0.99, ~0.49 at 0.9, ~0.29 at 0.8 — the single-table/8-bit
#: curve doubled. At 100 TB you raise N_BANDS (more tables) for recall;
#: candidates stay ~N_BANDS × N²/256, never all pairs.
N_BANDS = 2


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors with their norm precomputed ONCE per vector — inside the
    pair loop only the dot-product fold remains (computing norms per pair
    tripled the fold work and the generated code size)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb
        # malformed vectors (NULL or wrong dimensionality) are excluded
        # from the similarity universe — a 63-component vector has no
        # defined dot product against the 64-dim corpus (Spark zip_with
        # NULL-pads the tail where DuckDB raises, so admitting one also
        # silently diverges the engines; the dirty-input parity sweep is
        # the regression lock). size(NULL) is NULL, so NULL embeddings
        # fall out of the same predicate on both engines.
        .where(F.expr(f"size(embedding) = {DIM}"))
        .select("vec_id", "label", F.expr(_TO_DOUBLE).alias("v"))
        .withColumn("norm", F.expr(_NORM.format(a="v")))
        # zero-norm vectors cannot participate in cosine similarity
        # (undefined; would DIVIDE_BY_ZERO under ANSI) — excluded from
        # the similarity universe here, with the same predicate in every
        # consumer's oracle so hashes lock even on pathological input
        .where(F.col("norm") > 0)
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
    """Near-duplicate vectors: all pairs with cosine ≥ DUP_TAU
    (embedding-cosine near-dup dedup). Quadratic baseline kept as the
    exactness cross-check; the scale path is
    embedding_dup_pairs_bucketed below."""
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
        .where(F.col("cosine") >= DUP_TAU)
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


def _sig_sql(first_plane: int, vec_col: str = "v") -> str:
    """Spark SQL for the 8-bit hyperplane signature over planes
    [first_plane, first_plane + N_PLANES). Plane components fold in as
    literals, so the hot loop is a pure arithmetic fold — zero hashing."""
    bits = []
    for j in range(first_plane, first_plane + N_PLANES):
        plane = ", ".join(f"{c}D" for c in plane_components(j))
        dot = (
            f"aggregate(zip_with({vec_col}, array({plane}), (x, p) -> x * p),"
            f" cast(0 as double), (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 sign bits per vector → bucket histogram.
    (The ANN query path: restrict cosine search to same-bucket candidates.)"""
    vec = _vectors(spark, sf_dir)
    return (
        vec.select(F.expr(_sig_sql(1)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def _banded_vectors(vec: DataFrame) -> DataFrame:
    """(band, sig, vec_id, v, norm): each vector keyed by its signature in
    every band — the N_BANDS LSH hash tables stacked as rows. The stack is
    built with one inline-array explode, not a union, so the source scans
    once."""
    bands = ", ".join(
        f"struct({b} AS band, {_sig_sql(b * N_PLANES + 1)} AS sig)"
        for b in range(N_BANDS)
    )
    return vec.select(
        "vec_id", "v", "norm", F.explode(F.expr(f"array({bands})")).alias("bs")
    ).select("vec_id", "v", "norm", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def embedding_dup_pairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors, scale path: cosine ≥ DUP_TAU computed only
    for pairs sharing an LSH bucket in at least one of N_BANDS hyperplane
    tables (VERDICT r1 §What's wrong #2 — the brute-force crossJoin twin
    `embedding_dup_pairs` stays as the oracle-exact cross-check).

    Cost: signatures are one map-side fold per vector; the self-join
    shuffles on (band, sig), so only same-bucket pairs ever reach the
    cosine fold — ~N_BANDS × N²/2^k candidates instead of N²/2. A pair
    colliding in both bands is deduplicated by the final distinct, which
    operates on the (vec_a, vec_b, cosine) output rows, not the vectors."""
    sigs = _banded_vectors(_vectors(spark, sf_dir))
    a = sigs.select(
        "band", "sig", F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"), F.col("norm").alias("na"),
    )
    b = sigs.select(
        "band", "sig", F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"), F.col("norm").alias("nb"),
    )
    cosine = F.round(
        F.expr(_DOT.format(a="va", b="vb")) / (F.col("na") * F.col("nb")), 4
    )
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .where(F.col("cosine") >= DUP_TAU)
        .distinct()
    )


QUERIES = {
    "cosine_topk": cosine_topk,
    "embedding_dup_pairs": embedding_dup_pairs,
    "embedding_dup_pairs_bucketed": embedding_dup_pairs_bucketed,
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

def _duck_sig(first_plane: int) -> str:
    """DuckDB twin of _sig_sql: same plane_components (driver-side
    hashlib = byte-identical to the md5 SQL), folded in as list literals."""
    bits = []
    for j in range(first_plane, first_plane + N_PLANES):
        lits = ", ".join(str(c) for c in plane_components(j))
        bits.append(
            f"CASE WHEN list_dot_product(v, [{lits}]) >= 0 THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(bits) + ")"


def _duck_band_sigs() -> str:
    return ", ".join(f"{_duck_sig(b * N_PLANES + 1)} AS s{b}" for b in range(N_BANDS))


def _duck_band_union() -> str:
    return " UNION ALL ".join(
        f"SELECT vec_id, v, {b} AS band, s{b} AS sig FROM sigs" for b in range(N_BANDS)
    )


ORACLE = {
    "cosine_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                   WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0
                     AND len(embedding) = 64),
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
    "embedding_dup_pairs": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                   WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0
                     AND len(embedding) = 64)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= {DUP_TAU}
    """,
    "embedding_dup_pairs_bucketed": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                   WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0
                     AND len(embedding) = 64),
        sigs AS (SELECT vec_id, v, {_duck_band_sigs()} FROM e),
        bands AS ({_duck_band_union()})
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= {DUP_TAU}
    """,
    "lsh_buckets": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                   WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0
                     AND len(embedding) = 64),
        sigs AS (SELECT vec_id, concat({_DUCK_BITS}) AS bucket FROM e)
        SELECT bucket, count(*) AS n_vectors FROM sigs GROUP BY 1
    """,
}
