"""Deduplication operators over the `documents` table — the training-data
pipeline surface (beyond-reference, SURVEY §7 M7).

Four strategies, all expressed with JVM-side built-ins (no Python in the
hot path) and all deterministic so the DuckDB oracle can check them:

- exact:      hash-groupBy on md5(text) — one shuffle on the hash.
- minhash:    char-5-gram shingles → k=8 minhashes (min of md5(j:shingle))
              → 4 LSH bands → candidate pairs via band-bucket self-join.
              Portable determinism trick: the "hash family" is md5 with the
              function index prefixed, and "min" is lexicographic — identical
              in Spark and DuckDB, no integer-hash portability problems.
- simhash:    32-bit signature from token-hash hex digits (±1 vote per
              digit), emitted as a bit string.
- n-gram jaccard: word-3-gram shingle join → |∩| / |A∪B| per pair.

Scale notes (100 TB corpus):
- minhash is the scale path: cost is O(docs × shingles × k) map-side plus a
  shuffle keyed on (band, signature); candidate generation never compares
  all pairs. Band buckets are the classic LSH trade: 4 bands × 2 rows ⇒
  pairs with J ≳ 0.7 almost surely collide somewhere.
- the jaccard join is quadratic in the worst case (all docs share a
  shingle); at scale you run it only on minhash candidates. It's exposed
  standalone here because the oracle can verify it exactly.
- exact dedup at 100 TB: hash first (md5 projected at scan), so the
  shuffle carries 32-byte keys + doc ids, never the documents themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

#: char-5-gram distinct shingle array (Spark SQL expression).
CHAR_SHINGLES = (
    "array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)),"
    " i -> substr(text, i, 5)))"
)

#: same shingle set in DuckDB list-comprehension form.
CHAR_SHINGLES_DUCK = (
    "list_distinct([substr(text, i, 5) for i in range(1, greatest(len(text) - 4, 1) + 1)])"
)

#: word-3-gram distinct shingles from whitespace tokens.
WORD_SHINGLES = (
    "array_distinct(transform(sequence(1, greatest(size(split(trim(text), '\\\\s+')) - 2, 1)),"
    " i -> array_join(slice(split(trim(text), '\\\\s+'), i, 3), ' ')))"
)

WORD_SHINGLES_DUCK = (
    "list_distinct([array_to_string(toks[i:i+2], ' ') "
    "for i in range(1, greatest(len(toks) - 2, 1) + 1)])"
)

MINHASH_K = 8
MINHASH_ROWS_PER_BAND = 2  # 4 bands


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content hash, keep the smallest doc_id
    (deterministic survivor), report copy counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("copies"))
    )


def _minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, j, mh): the j-th minhash of each doc's char-shingle set."""
    shingles = docs.select(
        "doc_id", F.explode(F.expr(CHAR_SHINGLES)).alias("s")
    )
    expanded = shingles.select(
        "doc_id",
        "s",
        F.explode(F.sequence(F.lit(1), F.lit(MINHASH_K))).alias("j"),
    )
    return expanded.groupBy("doc_id", "j").agg(
        F.min(F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("s")))).alias("mh")
    )


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates: band signatures → bucket self-join
    → distinct (doc_a < doc_b) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    mh = _minhash_signatures(docs)
    bands = (
        mh.withColumn("band", ((F.col("j") - 1) / MINHASH_ROWS_PER_BAND).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.expr("transform(array_sort(collect_list(struct(j, mh))), x -> x.mh)"),
                    "|",
                )
            ).alias("sig")
        )
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("band").alias("band_a"), F.col("sig").alias("sig_a")
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("sig").alias("sig_b")
    )
    return (
        left.join(
            right,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 32 hex digits of each distinct token's md5 vote ±1 per
    position; sign of the vote sum is the signature bit."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(F.expr("array_distinct(split(trim(text), '\\\\s+'))")).alias("t"),
    )
    votes = tokens.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b"),
    ).select(
        "doc_id",
        "b",
        F.expr(
            "CASE WHEN instr('0123456789abcdef', substr(md5(t), b, 1)) - 1 >= 8"
            " THEN 1 ELSE -1 END"
        ).alias("vote"),
    )
    bits = votes.groupBy("doc_id", "b").agg(
        F.when(F.sum("vote") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("bit")
    )
    return bits.groupBy("doc_id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(b, bit))), x -> x.bit)"), ""
        ).alias("simhash")
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard similarity for pairs sharing ≥1 shingle, kept at
    J ≥ 0.2. At 100 TB this runs on LSH candidates only; standalone here so
    the oracle can verify the exact math."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(F.expr(WORD_SHINGLES)).alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b, ["s"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
                4,
            ),
        )
        .where(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_lsh_candidates": minhash_lsh_candidates,
    "simhash_signatures": simhash_signatures,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
}

ORACLE = {
    "dedup_exact": """
        SELECT md5(text) AS content_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS copies
        FROM documents
        GROUP BY 1
    """,
    "minhash_lsh_candidates": f"""
        WITH sh AS (
            SELECT doc_id, unnest({CHAR_SHINGLES_DUCK}) AS s FROM documents
        ),
        mh AS (
            SELECT doc_id, j, min(md5(j::VARCHAR || ':' || s)) AS mh
            FROM sh, range(1, {MINHASH_K + 1}) AS r(j)
            GROUP BY 1, 2
        ),
        bands AS (
            SELECT doc_id, CAST((j - 1) // {MINHASH_ROWS_PER_BAND} AS INT) AS band,
                   md5(string_agg(mh, '|' ORDER BY j)) AS sig
            FROM mh GROUP BY 1, 2
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
    "simhash_signatures": """
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS t
            FROM documents
        ),
        bits AS (
            SELECT doc_id, b,
                   CASE WHEN sum(CASE WHEN strpos('0123456789abcdef', md5(t)[b:b]) - 1 >= 8
                                      THEN 1 ELSE -1 END) >= 0
                        THEN '1' ELSE '0' END AS bit
            FROM tok, range(1, 33) AS r(b)
            GROUP BY 1, 2
        )
        SELECT doc_id, string_agg(bit, '' ORDER BY b) AS simhash
        FROM bits GROUP BY 1
    """,
    "ngram_jaccard_pairs": f"""
        WITH sh AS (
            SELECT doc_id, unnest(shingles) AS s
            FROM (
                SELECT doc_id, {WORD_SHINGLES_DUCK} AS shingles
                FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
            )
        ),
        sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE), 4) >= 0.2
    """,
}
