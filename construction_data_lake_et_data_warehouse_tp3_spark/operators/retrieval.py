"""Retrieval / representation operators — the search-and-embedding layer a
training-data platform runs beside dedup and curation (beyond-reference
surface; reference parity anchor: the aggregation scripts under
reference/data_warehouse/ have no retrieval surface, so these extend the
brief's "operations a large-scale training-data pipeline would need"):

- bm25_search: corpus-trained BM25 (Robertson/Spärck Jones; the Lucene
  idf variant) top-k document ranking for a fixed query term set.
- shingle_containment_pairs: DIRECTIONAL near-dup detection — containment
  |A∩B|/|A| over 4-word shingles catches quote inclusion / subset
  duplication that symmetric Jaccard misses (a 50-word quote inside a
  5,000-word doc has Jaccard ≈ 0.01 but containment 1.0).
- jl_projection: Johnson-Lindenstrauss signed random projection
  64 → 16 dims — the cheap dimensionality-reduction pass run before ANN
  index build; map-only, ZERO shuffle.
- semdedup_pairs: SemDeDup (Abbas et al., 2023) — semantic near-dup
  pairs found inside k-means cells: the coarse quantizer bounds the
  quadratic pair expansion, exact cosine inside each cell.

Exactness discipline (shared with lm_surprisal / kmeans_embeddings):
ln() results round to integer micro-nats immediately; vector arithmetic
runs on int64 micro-units or on doubles produced by IDENTICAL operation
sequences in both engines, so every comparison and hash is bit-stable.

Scale notes are per-operator; none of these queries collects to the
driver, and the only crossJoins broadcast 1-row or K-row sides.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .clustering import SCALE, _assign, _train, _vectors, assign_adaptive
from .clustering import _V_DUCK, _TRAIN_DUCK
from .dedup import TOKENS, TOKENS_DUCK

# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------

#: fixed demo query; at deploy time the terms arrive as a parameter (the
#: per-term expressions below are generated, so any term count works).
QUERY_TERMS = ("spark", "join", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20


def _bm25_contrib(i: int) -> str:
    """Per-term BM25 contribution with the SAME operation sequence in both
    engines (parenthesization included) so the doubles are bit-identical:
    idf · tf·(k1+1) / (tf + k1·(1−b + b·dl·N/total_tokens))."""
    tf = f"CAST(tf{i} AS DOUBLE)"
    dl_norm = "(CAST(dl AS DOUBLE) * n_docs / total_tokens)"
    k1p1 = str(BM25_K1 + 1.0)
    return (
        f"(CAST(idf{i} AS DOUBLE) * (({tf} * {k1p1}) / "
        f"({tf} + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * {dl_norm}))))"
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over the documents corpus for QUERY_TERMS.

    Plan: pass 1 aggregates corpus stats (N, total token count, per-term
    document frequency) to ONE row — map-side partial aggregation, every
    signal a pure expression over the token array (no token explode).
    idf is computed on that row and rounded to integer micro-nats (the
    lm_surprisal discipline). Pass 2 broadcasts the 1-row stats, scores
    each doc map-side (tf per query term via size(filter(...)) — again
    no explode), and TakeOrderedAndProject keeps the global top-k with a
    doc_id tiebreak: no global sort, no single-partition window. At
    100 TB both passes are embarrassingly parallel scans; the stats scan
    reads only the pruned text column."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.expr(TOKENS).alias("ws"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr("size(ws)")).alias("total_tokens"),
        *[
            F.sum(
                F.expr(f"CASE WHEN array_contains(ws, '{t}') THEN 1 ELSE 0 END")
            ).alias(f"df{i}")
            for i, t in enumerate(QUERY_TERMS)
        ],
    )
    for i in range(len(QUERY_TERMS)):
        stats = stats.withColumn(
            f"idf{i}",
            F.expr(
                f"CAST(round(ln((CAST(n_docs - df{i} AS DOUBLE) + 0.5)"
                f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0) * 1e6) AS BIGINT)"
            ),
        )
    scored = base.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.expr("size(ws)").alias("dl"),
        *[
            F.expr(f"size(filter(ws, x -> x = '{t}'))").alias(f"tf{i}")
            for i, t in enumerate(QUERY_TERMS)
        ],
        "n_docs",
        "total_tokens",
        *[F.col(f"idf{i}") for i in range(len(QUERY_TERMS))],
    )
    contrib = " + ".join(_bm25_contrib(i) for i in range(len(QUERY_TERMS)))
    ranked = scored.select(
        "doc_id",
        "dl",
        *[F.col(f"tf{i}") for i in range(len(QUERY_TERMS))],
        F.expr(f"CAST(round(({contrib})) AS BIGINT)").alias("score_micro"),
    )
    return ranked.orderBy(F.desc("score_micro"), "doc_id").limit(BM25_TOP_K)


# --------------------------------------------------------------------------
# Containment (directional near-dup)
# --------------------------------------------------------------------------

#: 4-word distinct shingles; docs with < 4 words have no shingles and
#: drop out (containment over an empty set is undefined, not zero).
CONT_NGRAM = 4
_CONT_SHINGLES = (
    f"if(size({{ws}}) < {CONT_NGRAM}, array(),"
    f" array_distinct(transform(sequence(1, size({{ws}}) - {CONT_NGRAM - 1}),"
    f" i -> concat_ws(' ', slice({{ws}}, i, {CONT_NGRAM})))))"
)
_CONT_SHINGLES_DUCK = (
    f"list_distinct(CASE WHEN len({{ws}}) < {CONT_NGRAM} THEN []"
    f" ELSE [array_to_string({{ws}}[i:i+{CONT_NGRAM - 1}], ' ')"
    f" for i in range(1, len({{ws}}) - {CONT_NGRAM - 2})] END)"
)

#: shingles present in more than this many docs are dropped before pair
#: expansion — the boilerplate guard that keeps the inverted-index join
#: linear (a stop-shingle in f docs expands to f² pairs). Exactness
#: caveat, documented: a pair ALL of whose shared shingles are hot is
#: missed; the oracle replays the identical cap, so parity still proves
#: the Spark plan computes the declared (capped) semantics.
CONT_FREQ_CAP = 50

#: emit pairs where the MORE-contained side is at least this (basis pts).
CONT_MIN_BP = 5000


def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment pairs via an inverted-index self-join.

    Plan: shingles generate map-side (distinct per doc); one groupBy
    counts per-doc set sizes; hot shingles (df > CONT_FREQ_CAP) are
    dropped by a shingle-keyed aggregation; the self-join on the
    surviving shingle key produces each co-occurring pair once per
    SHARED shingle, and the (a, b) groupBy count IS |A∩B| because the
    per-doc sets are distinct. Containment on either side ≥ CONT_MIN_BP
    emits. Any pair with containment > 0 shares ≥ 1 shingle, so modulo
    the documented hot-shingle cap the join is COMPLETE — no LSH
    probability curve involved (contrast minhash_lsh_candidates)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(F.expr(_CONT_SHINGLES.format(ws=TOKENS))).alias("ng")
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_set"))
    # window-over-ng keeps the frequency filter on the SAME shuffle the
    # self-join needs anyway (ng-partitioned); a groupBy+join would add a
    # second exchange of the full gram set.
    rare = (
        grams.withColumn("df", F.count("*").over(Window.partitionBy("ng")))
        .where(F.col("df") <= CONT_FREQ_CAP)
        .select("doc_id", "ng")
    )
    a = rare.select(F.col("doc_id").alias("doc_a"), "ng")
    b = rare.select(F.col("doc_id").alias("doc_b"), "ng")
    shared = (
        a.join(b, "ng")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_set").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_set").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            "n_a",
            "n_b",
            F.expr("(shared * 10000) DIV n_a").alias("cont_a_bp"),
            F.expr("(shared * 10000) DIV n_b").alias("cont_b_bp"),
        )
        .where(
            (F.col("cont_a_bp") >= CONT_MIN_BP) | (F.col("cont_b_bp") >= CONT_MIN_BP)
        )
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss projection
# --------------------------------------------------------------------------

JL_OUT_DIM = 16
JL_IN_DIM = 64


def jl_signs(j: int, in_dim: int = JL_IN_DIM) -> list[int]:
    """Deterministic ±1 row j of the projection matrix: the parity of the
    first hex nibble of md5('jl:j:i') — reproducible anywhere, no RNG
    state shipped (same derivation idiom as similarity.plane_components)."""
    return [
        1 if int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
        for i in range(in_dim)
    ]


def _jl_expr(j: int, element: str) -> str:
    """±element_at sums spliced as ONE literal expression (64 terms): the
    matrix lives in the plan, not in a join — zero shuffle, whole-stage
    codegen. element is a format string taking the 1-based index."""
    terms = [
        ("+ " if s > 0 else "- ") + element.format(i=i + 1)
        for i, s in enumerate(jl_signs(j))
    ]
    return "(0 " + " ".join(terms) + ")"


def jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed random projection of the 64-dim embeddings to 16 dims
    (Achlioptas ±1 variant of Johnson-Lindenstrauss). Components are
    int64 micro-units, so each output coordinate is an exact integer sum
    — engine-exact with no float anywhere. Map-only: the plan is a
    single scan with zero exchanges; at 100 TB this is the cheapest
    possible pass (the follow-on ANN index build then works on 4× fewer
    bytes per vector)."""
    vecs = _vectors(spark, sf_dir)
    proj = F.array(
        *[F.expr(_jl_expr(j, "element_at(vint, {i})")) for j in range(JL_OUT_DIM)]
    )
    # proj_csv, not a raw ARRAY column: the driver canonicalizer cannot
    # sort array cells — the projected vector rides as its deterministic
    # CSV rendering; split(proj_csv, ',') recovers the exact integers.
    return vecs.select(
        "vec_id",
        proj.alias("proj_micro"),
    ).select(
        "vec_id",
        F.expr(
            "array_join(transform(proj_micro, x -> cast(x AS string)), ',')"
        ).alias("proj_csv"),
        F.expr(
            "aggregate(proj_micro, CAST(0 AS BIGINT), (a, x) -> a + abs(x))"
        ).alias("l1_micro"),
    )


# --------------------------------------------------------------------------
# SemDeDup
# --------------------------------------------------------------------------

#: cosine threshold for a semantic duplicate. The synthetic embeddings
#: top out around cosine 0.6 (see similarity.DUP_TAU's note), so the
#: production-style 0.8 would make this query degenerate-empty at every
#: SF; 0.45 keeps the driver row non-trivial while the REAL near-dup
#: (cos ≈ 1) recall path is proven on planted vectors in
#: tests/test_retrieval.py. At deploy time this is the SemDeDup ε knob.
SEM_TAU = 0.45

#: target expected k-means cell size for semdedup's adaptive quantizer
#: (k = max(8, N DIV SEM_CELL_TARGET)): bounds the within-cell pair join
#: to ~N·SEM_CELL_TARGET comparisons at any corpus size.
SEM_CELL_TARGET = 250

_COS_NUM = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " cast(0 as double), (acc, x) -> acc + x)"
)
_COS_NRM = (
    "sqrt(aggregate(transform({a}, x -> x * x),"
    " cast(0 as double), (acc, x) -> acc + x))"
)


def semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic near-duplicate pairs discovered INSIDE k-means
    cells — train the deterministic Lloyd quantizer (clustering._train,
    the exact fixed-point loop the kmeans oracle replays), assign every
    vector to its cell, then pair-join only within cells and keep pairs
    with exact cosine ≥ SEM_TAU; the survivor is the smaller vec_id.

    Scale: the cell join bounds pair expansion to Σ|cell|² instead of
    N² — with K grown ∝ N (the SemDeDup paper runs 50k clusters for
    LAION-scale corpora) expected cell size is constant, so the operator
    stays linear. The quantizer size IS grown that way here:
    k = max(8, N // SEM_CELL_TARGET), so expected cell size stays ≤
    SEM_CELL_TARGET and the pair join stays linear at any corpus — at
    every driver-checked SF (N ≤ 2000) the formula yields exactly the
    K=8 testdata quantizer the unrolled oracle replays (measured: the
    fixed-K=8 form cost 8.4× at a 10× corpus — the quadratic
    Σ|cell|² regime this formula removes; see SCALING.md r7). Cosine
    folds are the sequential double folds proven bit-identical in
    similarity.py; rounding to 4 decimals happens AFTER the ≥ τ
    comparison, which itself runs on the bit-identical raw doubles."""
    vecs = _vectors(spark, sf_dir)
    k = max(8, vecs.count() // SEM_CELL_TARGET)
    # per-vector norm computed ONCE before the pair expansion — inside
    # the |cell|² join only the dot-product fold remains (recomputing
    # both norms per pair tripled the fold work; the VALUE is unchanged
    # because it is the same fold over the same doubles, so the oracle,
    # which still writes the norms inline, hashes identically).
    # Measured at sf0.1: 4.9 s → ~2 s for the bench line.
    # assign_adaptive (r9): flat Lloyd assignment is N·K work, which is
    # N² when k ∝ N — the r9 two-decade sweep measured 499 s at the
    # 100x tier (vs ~58 s decade-linear). Above its cutoff the adaptive
    # path trains a two-level quantizer (N·√K assignment); every
    # oracle-checked SF yields k = 8 ≤ cutoff and runs the EXACT
    # single-level chain the DuckDB oracle unrolls.
    assigned = (
        assign_adaptive(vecs, k)
        .withColumn(
            "vd", F.expr(f"transform(vint, i -> i / CAST({SCALE} AS DOUBLE))")
        )
        .withColumn("nrm", F.expr(_COS_NRM.format(a="vd")))
        # zero-norm vectors can train/assign but cannot join the cosine
        # pair expansion (undefined; ANSI DIVIDE_BY_ZERO) — same
        # predicate in the oracle's withvd CTE
        .where(F.col("nrm") > 0)
    )
    a = assigned.select(
        F.col("cid"),
        F.col("vec_id").alias("vec_a"),
        F.col("vd").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        F.col("cid"),
        F.col("vec_id").alias("vec_b"),
        F.col("vd").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "cid")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos",
            F.expr(_COS_NUM.format(a="va", b="vb")) / (F.col("na") * F.col("nb")),
        )
        .where(F.col("cos") >= SEM_TAU)
    )
    return pairs.select(
        "cid",
        "vec_a",
        "vec_b",
        F.round("cos", 4).alias("cos_sim"),
        F.col("vec_a").alias("keep_vec_id"),
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid lexical + semantic retrieval)
# --------------------------------------------------------------------------

#: RRF constant (Cormack et al. 2009 use 60; it damps the head so one
#: system's #1 can't drown the other's consensus).
RRF_K = 60
#: per-system candidate pool and fused output size.
RRF_POOL = BM25_TOP_K
RRF_TOP_N = 20
#: the semantic query: vector 0 (same demo-query convention as
#: similarity.N_QUERIES); doc_id and vec_id are the same corpus id space.
RRF_QUERY_VEC = 0


def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 (lexical) fused with cosine top-20
    against query vector 0 (semantic) by reciprocal-rank fusion —
    score(d) = Σ 1/(RRF_K + rank_sys(d)), the standard way RAG stacks
    combine a keyword index with an ANN index without score calibration.
    Kept integer: each reciprocal is 1000000 DIV (K + rank), so fusion
    arithmetic and tie-breaks are engine-exact.

    Plan: each arm ends in TakeOrderedAndProject (pool = 20), so the
    rank windows run on 20-row frames — the single-partition window
    never sees the corpus.  The fuse join is 20×20 FULL OUTER on the
    item id; at 100 TB the arms are the expensive part (BM25's two
    scans, one embedding scan + broadcast query) and both are
    embarrassingly parallel; swap the brute-force semantic arm for
    ann_ivf_topk's cell-probe when the corpus outgrows it."""
    from .similarity import _DOT
    from .similarity import _vectors as _sim_vectors

    lex_pool = bm25_search(spark, sf_dir).select("doc_id", "score_micro")
    w_lex = Window.orderBy(F.desc("score_micro"), "doc_id")
    lex = lex_pool.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )
    vec = _sim_vectors(spark, sf_dir)
    q = vec.where(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    cand = vec.where(F.col("vec_id") != RRF_QUERY_VEC)
    scored = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(
            F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("norm")), 4
        ).alias("cosine"),
    )
    sem_pool = scored.orderBy(F.desc("cosine"), "vec_id").limit(RRF_POOL)
    w_sem = Window.orderBy(F.desc("cosine"), "vec_id")
    sem = sem_pool.select(
        "vec_id", F.row_number().over(w_sem).alias("sem_rank")
    )
    fused = lex.join(sem, lex.doc_id == sem.vec_id, "full_outer").select(
        F.coalesce("doc_id", "vec_id").alias("item_id"),
        "lex_rank",
        "sem_rank",
        F.expr(
            f"coalesce(1000000 DIV ({RRF_K} + lex_rank), 0)"
            f" + coalesce(1000000 DIV ({RRF_K} + sem_rank), 0)"
        ).alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), "item_id").limit(RRF_TOP_N)


QUERIES = {
    "bm25_search": bm25_search,
    "rrf_hybrid_search": rrf_hybrid_search,
    "shingle_containment_pairs": shingle_containment_pairs,
    "jl_projection": jl_projection,
    "semdedup_pairs": semdedup_pairs,
}


def _bm25_oracle() -> str:
    tf_cols = ",\n                   ".join(
        f"len(list_filter(ws, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    df_cols = ",\n                   ".join(
        f"sum(CASE WHEN list_contains(ws, '{t}') THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    idf_cols = ",\n                   ".join(
        f"CAST(round(ln((CAST(n_docs - df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0) * 1e6) AS BIGINT) AS idf{i}"
        for i in range(len(QUERY_TERMS))
    )
    contrib = " + ".join(_bm25_contrib(i) for i in range(len(QUERY_TERMS)))
    tf_out = ", ".join(f"tf{i}" for i in range(len(QUERY_TERMS)))
    return f"""
        WITH base AS (
            SELECT doc_id, {TOKENS_DUCK} AS ws FROM documents
        ),
        raw AS (
            SELECT count(*) AS n_docs, sum(len(ws)) AS total_tokens,
                   {df_cols}
            FROM base
        ),
        stats AS (
            SELECT *,
                   {idf_cols}
            FROM raw
        ),
        scored AS (
            SELECT doc_id, len(ws) AS dl,
                   {tf_cols},
                   n_docs, total_tokens,
                   {', '.join(f'idf{i}' for i in range(len(QUERY_TERMS)))}
            FROM base CROSS JOIN stats
        )
        SELECT doc_id, dl, {tf_out},
               CAST(round(({contrib})) AS BIGINT) AS score_micro
        FROM scored
        ORDER BY score_micro DESC, doc_id
        LIMIT {BM25_TOP_K}
    """


def _containment_oracle() -> str:
    return f"""
        WITH base AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        ),
        grams AS (
            SELECT doc_id, unnest({_CONT_SHINGLES_DUCK.format(ws='toks')}) AS ng
            FROM base
        ),
        sizes AS (SELECT doc_id, count(*) AS n_set FROM grams GROUP BY 1),
        rare AS (
            SELECT doc_id, ng FROM (
                SELECT doc_id, ng, count(*) OVER (PARTITION BY ng) AS df
                FROM grams
            ) WHERE df <= {CONT_FREQ_CAP}
        ),
        shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
            FROM rare a JOIN rare b ON a.ng = b.ng AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, shared, sa.n_set AS n_a, sb.n_set AS n_b,
               (shared * 10000) // sa.n_set AS cont_a_bp,
               (shared * 10000) // sb.n_set AS cont_b_bp
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE (shared * 10000) // sa.n_set >= {CONT_MIN_BP}
           OR (shared * 10000) // sb.n_set >= {CONT_MIN_BP}
    """


def _jl_oracle() -> str:
    cols = ", ".join(
        "(0 "
        + " ".join(
            ("+ " if s > 0 else "- ") + f"vint[{i + 1}]"
            for i, s in enumerate(jl_signs(j))
        )
        + ")"
        for j in range(JL_OUT_DIM)
    )
    return f"""
        WITH v AS ({_V_DUCK}),
        p AS (SELECT vec_id, [{cols}] AS proj_micro FROM v)
        SELECT vec_id, array_to_string(proj_micro, ',') AS proj_csv,
               CAST(list_sum(list_transform(proj_micro, x -> abs(x))) AS BIGINT)
                   AS l1_micro
        FROM p
    """


def _semdedup_oracle() -> str:
    # a3 (the final assignment) comes from the shared unrolled training
    # chain — the SAME CTE text the kmeans/ivf oracles splice.
    cos_num = "list_sum(list_transform(range(1, 65), i -> a.vdx[i] * b.vdx[i]))"
    nrm = "sqrt(list_sum(list_transform(range(1, 65), i -> {s}.vdx[i] * {s}.vdx[i])))"
    return f"""
        {_TRAIN_DUCK},
        withvd AS (
            SELECT vec_id, cid,
                   list_transform(vint, x -> x / CAST({SCALE} AS DOUBLE)) AS vdx
            FROM a3
            WHERE list_sum(list_transform(vint, x -> x * x)) > 0
        ),
        pairs AS (
            SELECT a.cid, a.vec_id AS vec_a, b.vec_id AS vec_b,
                   {cos_num} / ({nrm.format(s='a')} * {nrm.format(s='b')}) AS cos
            FROM withvd a JOIN withvd b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
        )
        SELECT cid, vec_a, vec_b, round(cos, 4) AS cos_sim,
               vec_a AS keep_vec_id
        FROM pairs WHERE cos >= {SEM_TAU}
    """


def _rrf_oracle() -> str:
    # the lexical arm IS the bm25 oracle, spliced as a nested-WITH CTE so
    # the two stay definitionally identical.
    return f"""
        WITH lexpool AS ({_bm25_oracle()}),
        lex AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_micro DESC, doc_id)
                       AS lex_rank
            FROM lexpool
        ),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE len(embedding) = 64),
        q AS (SELECT v FROM e WHERE vec_id = {RRF_QUERY_VEC}),
        scored AS (
            SELECT c.vec_id,
                   round(list_dot_product(q.v, c.v)
                         / (sqrt(list_dot_product(q.v, q.v))
                            * sqrt(list_dot_product(c.v, c.v))), 4) AS cosine
            FROM e c CROSS JOIN q
            WHERE c.vec_id <> {RRF_QUERY_VEC}
        ),
        sempool AS (
            SELECT vec_id, cosine FROM scored
            ORDER BY cosine DESC, vec_id LIMIT {RRF_POOL}
        ),
        sem AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY cosine DESC, vec_id) AS sem_rank
            FROM sempool
        )
        SELECT coalesce(l.doc_id, s.vec_id) AS item_id,
               l.lex_rank, s.sem_rank,
               coalesce(1000000 // ({RRF_K} + l.lex_rank), 0)
                   + coalesce(1000000 // ({RRF_K} + s.sem_rank), 0) AS rrf_micro
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
        ORDER BY rrf_micro DESC, item_id
        LIMIT {RRF_TOP_N}
    """


ORACLE = {
    "bm25_search": _bm25_oracle(),
    "rrf_hybrid_search": _rrf_oracle(),
    "shingle_containment_pairs": _containment_oracle(),
    "jl_projection": _jl_oracle(),
    "semdedup_pairs": _semdedup_oracle(),
}
