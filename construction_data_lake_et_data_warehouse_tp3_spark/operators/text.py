"""Text-analysis operators over `documents` (beyond-reference training-data
surface, SURVEY §7 M7): token counting, quality scoring, language-ID
heuristic, document fingerprinting.

All pure built-in expressions (split/filter/transform) — whole-stage
codegen end to end, embarrassingly parallel at 100 TB (no shuffle except
final small aggregations; per-document work is map-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .dedup import CHAR_SHINGLES_DUCK as _CHAR_SHINGLES_DUCK

TOKENS = "split(trim(text), '\\\\s+')"
TOKENS_DUCK = "string_split_regex(trim(text), '\\s+')"

STOPWORDS = ("the", "a", "and", "of", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

#: trivial per-language marker lists for the n-gram/stopword language-ID
#: heuristic (deterministic; real lists would be swapped in at deploy time).
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "las"),
}


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting (bpe_token_count below is the
    subword-regex sibling)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"size({TOKENS})").alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


#: GPT-2-ish pre-tokenizer approximation: letter runs, digit runs, single
#: punctuation marks. Identical regex syntax in Spark and DuckDB.
_BPE_PIECES = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (the brief's second counting mode): split
    into pre-tokenizer pieces, then estimate subword tokens as
    ceil(len/4) per piece (~4 chars/token, the common BPE density). All
    map-side expression work — at 100 TB this is the cheap budget pass
    that decides what even reaches a real tokenizer."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = f"regexp_extract_all(text, '{_BPE_PIECES}', 0)"
    est = (
        f"aggregate({pieces}, cast(0 as bigint),"
        " (acc, p) -> acc + CAST(ceil(length(p) / 4.0) AS BIGINT))"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size({pieces})").alias("n_pieces"),
        F.expr(est).alias("est_bpe_tokens"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token stats + stopword ratio → [0,1] score.
    Score = min(1, n_tokens/50) × (1 − stopword_ratio), rounded."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr(f"size({TOKENS})").alias("n_tokens"),
        F.expr(f"size(filter({TOKENS}, x -> x IN ({_STOP_SQL})))").alias("n_stop"),
        F.length("text").alias("n_chars_measured"),
    )
    ratio = F.col("n_stop") / F.col("n_tokens").cast("double")
    return t.select(
        "doc_id",
        "n_tokens",
        "n_chars_measured",
        F.round(ratio, 4).alias("stopword_ratio"),
        F.round(
            F.least(F.lit(1.0), F.col("n_tokens") / F.lit(50.0)) * (1 - ratio), 4
        ).alias("quality_score"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count hits per language, predict the argmax
    (ties broken en > fr > es; no hits → 'unknown'). Emits the labeled lang
    for agreement analysis."""
    docs = load_table(spark, sf_dir, "documents")
    hits = {
        lang: F.expr(
            f"size(filter({TOKENS}, x -> x IN ({', '.join(repr(w) for w in markers)})))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits["en"].alias("en_hits"),
        hits["fr"].alias("fr_hits"),
        hits["es"].alias("es_hits"),
    )
    pred = (
        F.when(
            (F.col("en_hits") == 0) & (F.col("fr_hits") == 0) & (F.col("es_hits") == 0),
            "unknown",
        )
        .when(
            (F.col("en_hits") >= F.col("fr_hits")) & (F.col("en_hits") >= F.col("es_hits")),
            "en",
        )
        .when(F.col("fr_hits") >= F.col("es_hits"), "fr")
        .otherwise("es")
    )
    return scored.select("doc_id", "labeled_lang", pred.alias("predicted_lang"))


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sketch fingerprint: the 4 lexicographically-smallest
    char-shingle hashes, joined — a compact, order-invariant content id
    (rolling-hash winnowing analog, portable to the oracle)."""
    from .dedup import CHAR_SHINGLES

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            f"array_join(slice(array_sort(transform({CHAR_SHINGLES}, s -> md5(s))), 1, 4), '|')"
        ).alias("fingerprint"),
    )


QUERIES = {
    "token_count": token_count,
    "bpe_token_count": bpe_token_count,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "doc_fingerprint": doc_fingerprint,
}

_HITS_DUCK = {
    lang: f"len(list_filter({TOKENS_DUCK}, x -> x IN ({', '.join(repr(w) for w in markers)})))"
    for lang, markers in LANG_MARKERS.items()
}

ORACLE = {
    "token_count": f"""
        SELECT doc_id,
               len({TOKENS_DUCK}) AS n_tokens,
               len(text) AS n_chars_measured
        FROM documents
    """,
    "bpe_token_count": r"""
        WITH p AS (
            SELECT doc_id,
                   regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS pieces
            FROM documents
        )
        SELECT doc_id,
               len(pieces) AS n_pieces,
               CAST(list_sum(list_transform(pieces,
                    p -> CAST(ceil(length(p) / 4.0) AS BIGINT))) AS BIGINT) AS est_bpe_tokens
        FROM p
    """,
    "text_quality": f"""
        WITH t AS (
            SELECT doc_id,
                   len({TOKENS_DUCK}) AS n_tokens,
                   len(list_filter({TOKENS_DUCK}, x -> x IN ({_STOP_SQL}))) AS n_stop,
                   len(text) AS n_chars_measured
            FROM documents
        )
        SELECT doc_id, n_tokens, n_chars_measured,
               round(n_stop / CAST(n_tokens AS DOUBLE), 4) AS stopword_ratio,
               round(least(CAST(1.0 AS DOUBLE), n_tokens / CAST(50.0 AS DOUBLE))
                     * (1 - n_stop / CAST(n_tokens AS DOUBLE)), 4) AS quality_score
        FROM t
    """,
    "lang_id": f"""
        WITH t AS (
            SELECT doc_id, lang AS labeled_lang,
                   {_HITS_DUCK['en']} AS en_hits,
                   {_HITS_DUCK['fr']} AS fr_hits,
                   {_HITS_DUCK['es']} AS es_hits
            FROM documents
        )
        SELECT doc_id, labeled_lang,
               CASE WHEN en_hits = 0 AND fr_hits = 0 AND es_hits = 0 THEN 'unknown'
                    WHEN en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
                    WHEN fr_hits >= es_hits THEN 'fr'
                    ELSE 'es' END AS predicted_lang
        FROM t
    """,
    "doc_fingerprint": f"""
        SELECT doc_id,
               array_to_string(
                   list_sort([md5(s) for s in {_CHAR_SHINGLES_DUCK}])[1:4], '|') AS fingerprint
        FROM documents
    """,
}
