"""Retrieval and corpus-statistics operators: BM25 top-k search, the
document-frequency spectrum, per-document lexical diversity, per-source
distribution drift, quantized Zipf fits, and KMV distinct sketches.

These are the query-side complement of the curation family: where
``operators.corpus`` / ``operators.text`` decide what goes INTO a training
corpus, this module answers "what is in it / can I find it" — the
retrieval + profiling surface a 100-TB data pipeline needs for corpus
audits and RAG-style lookups.  (The reference, darefamuy/
cdc-stream-processor, has no text surface at all — its topology is the
banking CDC DAG in `src/main/java/com/abbank/streams/topology/
ABBankTopology.java`; this family is part of the §2.11 "absent operator
families" batch surface built Spark-first.)

Determinism contract (shared with the rest of the repo — the driver
hash-compares against DuckDB bit-for-bit):
  * no transcendentals: `log` / `exp` / `pow` are NOT correctly-rounded
    across libms, so BM25's idf is the RATIONAL form (N-df+.5)/(df+.5)
    without the log, Zipf fits run on floor(log2) = `length(bin(n))-1`
    (exact integer bit-length, engine-identical), and Hellinger uses
    sqrt (IEEE-754 correctly rounded everywhere);
  * per-row doubles go through single correctly-rounded op chains that
    both engines evaluate with the same expression tree, then are
    floored to integers BEFORE any aggregation so sums are
    order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_stream_processor_spark.functions import texthash as TH

# score scale for floored fixed-point contributions (see module docstring)
BM25_SCALE = 1_000_000  # 1e6: idf_r <= N, tf_sat <= k1+1 -> fits int64 at 100 TB
HELLINGER_SCALE = 1_000_000_000  # 1e9: per-term <= 1e9, vocab 1e7 -> sum <= 1e16
KMV_SPACE = 1 << 32  # KMV hashes live in [0, 2^32): first 8 md5 hex chars


def _floor_log2(n: Column) -> Column:
    """floor(log2(n)) for n >= 1 as an exact integer: bit-length - 1.

    `bin()` (base-2 string) exists in both Spark and DuckDB, so the
    oracle restates this as `length(bin(n)) - 1` — no libm involved.
    """
    return (F.length(F.bin(n)) - F.lit(1)).cast("long")


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, token) exploded relation; empty docs drop out."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(TH.tokens(F.col(text_col))).alias("token"),
    )


# --- BM25 retrieval -----------------------------------------------------------


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k document retrieval for a fixed query-term set, with the
    RATIONAL idf variant: idf_r(t) = (N - df_t + 0.5) / (df_t + 0.5)
    (the Robertson-Sparck-Jones odds WITHOUT the log — the log is a
    monotone transform, so per-term ranking is preserved while the score
    stays inside the repo's no-transcendentals determinism contract; the
    docstring of the module explains why).

    score(d) = sum_t floor( BM25_SCALE * idf_r(t) * tf_sat(t, d) )
      tf_sat  = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Contributions are floored to integers per (term, doc) before the
    per-doc sum, so the aggregate is order-independent; the final top-k
    breaks score ties on ascending doc_id.

    Plan shape (holds at 100 TB):
      1. dl per doc is map-only (`size(tokens)`): no shuffle;
      2. the exploded token relation is filtered to the query terms
         BEFORE the tf groupBy — the only corpus-scale shuffle carries
         |terms| x |matching docs| rows, not the whole token stream;
      3. df-per-term and the (N, avgdl) scalars aggregate off that tiny
         relation / the doc table and come back as broadcasts;
      4. per-doc sum + global top-k: Spark's TakeOrderedAndProject —
         per-partition heaps, no global sort.
    """
    terms = [t.lower() for t in query_terms]
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(TH.tokens(F.col(text_col))).alias("dl"),
    )
    # scalar (N, avgdl) in one pass over the doc-length relation
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    # persist: the tiny (terms x matching docs) tf relation feeds TWO
    # parallel consumers (the df-per-term aggregate and the score join)
    # and sits above the corpus-scale explode+filter+shuffle — one
    # tokenize pass instead of two (repo persist criterion: parallel
    # consumers AND a shuffle/UDF in the shared subtree)
    tf = (
        _doc_tokens(docs, text_col, id_col)
        .filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf_r = (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tf_d = F.col("tf").cast("double")
    tf_sat = (
        tf_d
        * (F.lit(float(k1)) + F.lit(1.0))
        / (
            tf_d
            + F.lit(float(k1))
            * (
                F.lit(1.0)
                - F.lit(float(b))
                + F.lit(float(b)) * (F.col("dl").cast("double") / avgdl)
            )
        )
    )
    contrib = F.floor(F.lit(float(BM25_SCALE)) * idf_r * tf_sat)
    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("score_scaled"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )
    return (
        scored.orderBy(F.col("score_scaled").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score_scaled", "n_terms_matched")
    )


# --- document-frequency spectrum ----------------------------------------------


def df_spectrum(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document-frequency spectrum: for each power-of-two bucket
    b = floor(log2(df)), how many distinct token TYPES have a document
    frequency in [2^b, 2^(b+1)), and their total df mass.

    The df spectrum is the standard corpus-health fingerprint (a healthy
    crawl shows a smooth Zipfian decay; a df spike at the corpus size
    means boilerplate on every page — the signal `boilerplate_removal`
    acts on).

    Plan: distinct (token, doc) -> df per token -> bucket agg.  Two
    vocabulary-scale shuffles with map-side partial aggregation; the
    bucket table is <= 64 rows regardless of corpus size.
    """
    df_t = (
        _doc_tokens(docs, text_col, id_col)
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        df_t.select(_floor_log2(F.col("df")).alias("df_bucket"), "df")
        .groupBy("df_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("df").alias("total_df"),
        )
    )


# --- per-document lexical diversity -------------------------------------------


def token_diversity(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical diversity: token count N, type count,
    hapax-legomena count (types occurring once), and the Gini-Simpson
    index 1 - sum_i c_i^2 / N^2.

    Gini-Simpson is the no-log stand-in for Shannon entropy (same
    monotone "repetitive text scores low" signal — a doc that is one
    token repeated has index 0, an all-distinct doc approaches 1) and is
    engine-exact: N and sum c_i^2 are integers, the index is ONE
    correctly-rounded double division (N^2 - sum c^2) / N^2.

    Plan: explode -> groupBy (doc, token) -> groupBy doc.  Both shuffles
    carry map-side partial aggs; nothing is corpus-global.
    """
    per_tok = (
        _doc_tokens(docs, text_col, id_col)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"),
            F.sum(F.col("c") * F.col("c")).alias("c2"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            "n_hapax",
            (
                (F.col("n_tokens") * F.col("n_tokens") - F.col("c2")).cast("double")
                / (F.col("n_tokens") * F.col("n_tokens")).cast("double")
            ).alias("simpson"),
        )
    )


# --- per-source distribution drift (Hellinger^2) ------------------------------


def hellinger_source_drift(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Squared Hellinger distance between each source's unigram
    distribution p and the whole-corpus distribution q:
    H^2(p, q) = 1/2 * sum_t (sqrt(p_t) - sqrt(q_t))^2, reported as the
    integer sum_t floor(HELLINGER_SCALE * (sqrt(p_t) - sqrt(q_t))^2)
    (so 2 * HELLINGER_SCALE == maximal drift).

    Hellinger is the no-log drift metric (KL/JS need transcendentals);
    sqrt IS correctly rounded by IEEE 754, and each term is floored to
    an integer before the per-source sum, so the aggregate is
    order-independent and engine-exact.  This is the "did source X's
    vocabulary shift vs the corpus" audit used to spot crawl rot or a
    mis-tagged dump before it trains.

    Plan shape (holds at 100 TB):
      1. global token counts and (source, token) counts both hang off
         one exploded relation with map-side partial aggs (vocab-scale);
      2. the evaluation grid is sources x vocab built by a right join of
         source counts onto (distinct sources x global vocab) — tokens a
         source never uses contribute (sqrt(0) - sqrt(q_t))^2 = q_t, so
         the grid must include them; n_sources is small (a source tag is
         a crawl/dump id), so the grid is O(n_sources * vocab), same
         class as the vocab shuffles;
      3. per-source integer sum: one final small shuffle.
    """
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(TH.tokens(F.col(text_col))).alias("token"),
    ).persist()  # two aggregate consumers branch in parallel below
    global_c = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_g"))
    source_c = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c_s"))
    n_g = toks.agg(F.count(F.lit(1)).alias("n_g"))
    n_s = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))

    grid = (
        n_s.crossJoin(global_c)  # sources x vocab, carries n_s
        .join(source_c, ["source", "token"], "left")
        .fillna({"c_s": 0})
        .crossJoin(F.broadcast(n_g))
    )
    sp = F.sqrt(F.col("c_s").cast("double") / F.col("n_s").cast("double"))
    sq = F.sqrt(F.col("c_g").cast("double") / F.col("n_g").cast("double"))
    term = F.floor(F.lit(float(HELLINGER_SCALE)) * ((sp - sq) * (sp - sq)))
    return (
        grid.select(
            "source",
            term.alias("h"),
            (F.col("c_s") > 0).cast("long").alias("is_used"),
        )
        .groupBy("source")
        .agg(
            F.sum("h").alias("hellinger2_scaled"),
            F.sum("is_used").alias("n_types_used"),
        )
    )


# --- quantized Zipf fit -------------------------------------------------------


def zipf_slope_by_source(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source Zipf slope: OLS fit of y = floor(log2(freq)) against
    x = floor(log2(rank)) over the source's token types (rank 1 = most
    frequent; ties broken by ascending token for determinism).  Natural
    language tracks slope ~ -1; a flat slope means synthetic/templated
    text, a cliff means a tiny vocabulary.

    floor(log2) via `length(bin(n)) - 1` is exact integer bit-length
    (no libm), so all four OLS sums are integers and the slope is one
    correctly-rounded double division:
      slope = (n * Sxy - Sx * Sy) / (n * Sxx - Sx * Sx)
    (null when the denominator is 0 — all types in one rank bucket).

    Plan: (source, token) counts (vocab-scale, map-side partials) ->
    per-source rank via row_number -> integer OLS sums (one small
    shuffle).  The rank window partitions by source; at 100 TB a single
    source's vocabulary is still only O(sqrt(corpus)) by Heaps' law, but
    a skewed source would make its window task the straggler — the
    documented switch is `range_rank` (operators.relational), which
    turns the rank into a distributed range-partitioned prefix sum, as
    `doc_rarity` already does.
    """
    freq = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(TH.tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.col("freq").desc(), F.col("token").asc())
    pts = freq.select(
        "source",
        _floor_log2(F.row_number().over(w)).alias("x"),
        _floor_log2(F.col("freq")).alias("y"),
    )
    agg = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return agg.select(
        "source",
        F.col("n").alias("n_types"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias("zipf_slope"),
    )


# --- reciprocal-rank fusion (hybrid retrieval) --------------------------------

RRF_K0 = 60  # the canonical RRF dampening constant (Cormack et al., SIGIR'09)
RRF_SCALE = 1_000_000  # contribution = RRF_SCALE div (RRF_K0 + rank): exact ints


def rrf_fuse(ranked_lists: list[DataFrame], id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists — the standard
    hybrid-search combiner (lexical BM25 + dense ANN in a RAG stack):
      rrf(d) = sum_lists floor(RRF_SCALE / (RRF_K0 + rank_list(d)))
    computed with INTEGER division, so the fused score is engine-exact
    (the classical 1/(60+r) scaled by 1e6 and floored).

    Each input must have (id_col, rank) with rank 1 = best.  Documents
    absent from a list contribute nothing for it (the RRF convention).

    Plan shape: each list is already top-k (tiny); the fusion is a union
    + one groupBy over <= N*k rows — driver-independent and broadcastable
    anywhere downstream.
    """
    contrib = F.expr(f"{RRF_SCALE} div ({RRF_K0} + rank)")
    tagged = [
        df.select(F.col(id_col).alias("id"), contrib.alias("c"))
        for df in ranked_lists
    ]
    un = tagged[0]
    for t in tagged[1:]:
        un = un.unionByName(t)
    return (
        un.groupBy("id")
        .agg(
            F.sum("c").alias("rrf_score_scaled"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .select(F.col("id").alias(id_col), "rrf_score_scaled", "n_lists")
    )


# --- KMV distinct sketch ------------------------------------------------------


def kmv_distinct_tokens(
    docs: DataFrame,
    k: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """K-minimum-values distinct-count sketch per source, next to the
    exact count so the sketch error is visible: hash every token type
    into [0, 2^32) via the first 8 hex chars of md5 (identical in Spark
    and DuckDB), keep the k smallest, and estimate
      distinct ~= floor((k - 1) * 2^32 / (h_k + 1))
    where h_k is the k-th smallest hash (Beyer et al., SIGMOD'07 — the
    unbiased KMV estimator with an integer division; +1 guards h_k = 0).
    When a source has fewer than k types the exact count is returned.

    This is the mergeable-sketch pattern for 100-TB distinct counts:
    per-partition k-smallest lists union to the global answer with no
    exact-distinct shuffle.  Here the k-smallest selection is a
    per-source rank over the deduplicated type table (vocab-scale);
    the documented scale path chunks hashes into B buckets, takes
    per-bucket minima, and merges B*k candidates — same two-phase
    shape `winnowing_overlap_pairs` uses for its hot keys.

    Output: source, n_types (exact), kmv_estimate.
    """
    types = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(TH.tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            "source",
            "token",
            F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("token").asc())
    ranked = types.select(
        "source", "h", F.row_number().over(w).alias("r")
    )
    exact = types.groupBy("source").agg(F.count(F.lit(1)).alias("n_types"))
    kth = (
        ranked.filter(F.col("r") <= k)
        .groupBy("source")
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("n_kept"))
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_types")
    ).otherwise(
        F.floor(
            F.lit(float((k - 1) * KMV_SPACE))
            / (F.col("h_k") + F.lit(1)).cast("double")
        ).cast("long")
    )
    return (
        exact.join(kth, "source")
        .select("source", "n_types", est.alias("kmv_estimate"))
    )
