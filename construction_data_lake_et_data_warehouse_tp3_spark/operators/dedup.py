"""Deduplication operators over the `documents` table — the training-data
pipeline surface (beyond-reference, SURVEY §7 M7).

Four strategies, all expressed with JVM-side built-ins (no Python in the
hot path) and all deterministic so the DuckDB oracle can check them:

- exact:      hash-groupBy on md5(text) — one shuffle on the hash.
- minhash:    char-7-gram shingles → k=12 Carter-Wegman minhashes over one
              md5 per shingle → 3 LSH bands of 4 rows → candidates via
              band-bucket grouping. Portable determinism trick: both engines
              parse the same md5 hex halves to BIGINT, so the hash family is
              bit-identical with no engine-specific hash functions.
- simhash:    32-bit signature from token-hash hex digits (±1 vote per
              digit), emitted as a bit string.
- n-gram jaccard: word-3-gram shingle join → |∩| / |A∪B| per pair.

Scale notes (100 TB corpus):
- minhash is the scale path: cost is O(docs × shingles × k) map-side plus a
  shuffle keyed on (band, signature); candidate generation never compares
  all pairs. 3 bands × 4 rows ⇒ P(candidate) = 1-(1-J^4)^3: ~0.95 at
  J=0.9, ~0.18 at J=0.5 — tuned so near-dups collide and the word-soup
  background doesn't.
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

#: char-7-gram distinct shingle array (Spark SQL expression). 7 chars
#: (vs the classic 5) because this corpus draws on a small shared
#: vocabulary — short shingles make *every* pair look similar and blow up
#: the candidate set (measured: 5-gram banding produced 1.69M candidate
#: pairs at sf0.1; 7-gram with 3 bands of 4 rows produces ~1k).
CHAR_SHINGLES = (
    "array_distinct(transform(sequence(1, greatest(length(text) - 6, 1)),"
    " i -> substr(text, i, 7)))"
)

#: same shingle set in DuckDB list-comprehension form.
CHAR_SHINGLES_DUCK = (
    "list_distinct([substr(text, i, 7) for i in range(1, greatest(len(text) - 6, 1) + 1)])"
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

MINHASH_K = 12
MINHASH_ROWS_PER_BAND = 4  # 3 bands: P(candidate) = 1-(1-J^4)^3


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content hash, keep the smallest doc_id
    (deterministic survivor), report copy counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("copies"))
    )


def _band_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig): one row per LSH band per doc.

    Hash family: Carter-Wegman over ONE md5 per shingle — h1/h2 are the
    two 48-bit halves of md5(s) and the j-th hash is h1 + j·h2 (exact
    BIGINT, no overflow: 13·2^48 ≪ 2^63; identical in DuckDB via
    ('0x'||hex)::BIGINT). One digest per shingle instead of k, and the k
    minhash aggregates are pure long arithmetic with map-side partial
    aggregation — the shuffle carries ≤ docs × partitions rows of k
    minima, never the shingles.

    (Rejected formulations, measured at sf0.1: explode(shingle)×explode(j)
    + groupBy(doc,j) shuffles docs×shingles×k rows — 37 s; k array_min
    columns over the shingle array re-inline the array construction k
    times under CollapseProject — 60 s; k per-shingle md5-string
    min-aggs — 4 s warm.)"""
    shingles = docs.select("doc_id", F.explode(F.expr(CHAR_SHINGLES)).alias("s"))
    hashed = shingles.select("doc_id", F.md5("s").alias("h")).select(
        "doc_id",
        F.expr("CAST(conv(substr(h, 1, 12), 16, 10) AS BIGINT)").alias("h1"),
        F.expr("CAST(conv(substr(h, 13, 12), 16, 10) AS BIGINT)").alias("h2"),
    )
    mh_aggs = [
        F.min(F.col("h1") + j * F.col("h2")).alias(f"mh_{j}")
        for j in range(1, MINHASH_K + 1)
    ]
    sigs = hashed.groupBy("doc_id").agg(*mh_aggs)
    n_bands = MINHASH_K // MINHASH_ROWS_PER_BAND
    band_structs = []
    for band in range(n_bands):
        members = [
            f"mh_{j}"
            for j in range(band * MINHASH_ROWS_PER_BAND + 1, (band + 1) * MINHASH_ROWS_PER_BAND + 1)
        ]
        band_structs.append(
            F.struct(
                F.lit(band).alias("band"),
                F.md5(F.concat_ws("|", *members)).alias("sig"),
            )
        )
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates: band signatures → bucket grouping
    → per-bucket pair expansion → distinct (doc_a < doc_b) pairs.

    Buckets are materialized with ONE pass over the signatures (groupBy +
    collect_list) and pairs expand with an array expression — a band
    self-join would recompute the whole minhash lineage for each side
    (measured ~2× slower). Pathological buckets stay quadratic by nature;
    at 100 TB cap bucket size upstream (drop or re-shingle buckets with
    more members than plausibly duplicate)."""
    docs = load_table(spark, sf_dir, "documents")
    bands = _band_signatures(docs)
    buckets = (
        bands.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pair_expr = (
        "flatten(transform(sequence(1, size(ds) - 1), "
        "i -> transform(slice(ds, i + 1, size(ds) - i), "
        "b -> struct(element_at(ds, i) AS doc_a, b AS doc_b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
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
        hashed AS (
            SELECT doc_id,
                   ('0x' || substr(md5(s), 1, 12))::BIGINT AS h1,
                   ('0x' || substr(md5(s), 13, 12))::BIGINT AS h2
            FROM sh
        ),
        mh AS (
            SELECT doc_id,
                   min(h1 + 1 * h2) AS mh_1,
                   min(h1 + 2 * h2) AS mh_2,
                   min(h1 + 3 * h2) AS mh_3,
                   min(h1 + 4 * h2) AS mh_4,
                   min(h1 + 5 * h2) AS mh_5,
                   min(h1 + 6 * h2) AS mh_6,
                   min(h1 + 7 * h2) AS mh_7,
                   min(h1 + 8 * h2) AS mh_8,
                   min(h1 + 9 * h2) AS mh_9,
                   min(h1 + 10 * h2) AS mh_10,
                   min(h1 + 11 * h2) AS mh_11,
                   min(h1 + 12 * h2) AS mh_12
            FROM hashed GROUP BY 1
        ),
        sigs AS (
            SELECT doc_id,
                   md5(mh_1::VARCHAR || '|' || mh_2::VARCHAR || '|' || mh_3::VARCHAR || '|' || mh_4::VARCHAR) AS s0,
                   md5(mh_5::VARCHAR || '|' || mh_6::VARCHAR || '|' || mh_7::VARCHAR || '|' || mh_8::VARCHAR) AS s1,
                   md5(mh_9::VARCHAR || '|' || mh_10::VARCHAR || '|' || mh_11::VARCHAR || '|' || mh_12::VARCHAR) AS s2
            FROM mh
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sigs a JOIN sigs b
          ON a.doc_id < b.doc_id
         AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2)
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
