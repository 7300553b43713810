"""Planted-case tests for the retrieval & corpus-statistics family
(``operators/retrieval.py``): BM25 top-k, df spectrum, lexical diversity,
Hellinger drift, quantized Zipf slope, KMV sketch.

Each test hand-computes the expected values from the documented formulas
on a corpus small enough to verify on paper."""

from __future__ import annotations

import hashlib
import math

from cdc_stream_processor_spark.operators import retrieval as R


# --- BM25 ---------------------------------------------------------------------


def _bm25_expected(corpus, terms, k1=1.2, b=0.75):
    """Straight-line reimplementation of the documented formula."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(corpus)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    scores: dict[int, int] = {}
    matched: dict[int, int] = {}
    for term in terms:
        docs_t = {d: t.count(term) for d, t in toks.items() if term in t}
        df = len(docs_t)
        if not df:
            continue
        idf = (n - df + 0.5) / (df + 0.5)
        for d, tf in docs_t.items():
            sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (dls[d] / avgdl)))
            scores[d] = scores.get(d, 0) + math.floor(R.BM25_SCALE * idf * sat)
            matched[d] = matched.get(d, 0) + 1
    return scores, matched


def test_bm25_hand_computed(spark):
    corpus = [
        (1, "cat dog cat"),
        (2, "dog dog dog dog"),
        (3, "cat fish"),
        (4, "bird bird bird bird bird bird"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["score_scaled"], r["n_terms_matched"])
        for r in R.bm25_topk(df, ["cat", "dog"], k=10).collect()
    }
    scores, matched = _bm25_expected(corpus, ["cat", "dog"])
    assert out == {d: (scores[d], matched[d]) for d in scores}
    # doc 4 matches nothing -> absent
    assert 4 not in out


def test_bm25_topk_limit_and_tiebreak(spark):
    # identical docs tie on score; tie-break is ascending doc_id
    corpus = [(i, "x y") for i in range(1, 6)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = R.bm25_topk(df, ["x"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [1, 2, 3]


def test_bm25_tf_saturation_beats_linear(spark):
    """tf=4 in a longer doc must score LESS than 4x the tf=1 score
    (saturation), but more than tf=1 at equal length."""
    corpus = [(1, "q a a a"), (2, "q q q q"), (3, "a a a a")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r["score_scaled"] for r in R.bm25_topk(df, ["q"], k=10).collect()}
    assert out[2] > out[1] and out[2] < 4 * out[1]


# --- RRF fusion ---------------------------------------------------------------


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    out = {
        r["doc_id"]: (r["rrf_score_scaled"], r["n_lists"])
        for r in R.rrf_fuse([a, b]).collect()
    }
    c1, c2 = R.RRF_SCALE // 61, R.RRF_SCALE // 62
    assert out == {1: (c1, 1), 2: (c2 + c1, 2), 3: (c2, 1)}


def test_rrf_fusion_registered_query(spark, sf_dir):
    from cdc_stream_processor_spark.queries_retrieval import q_rrf_fusion

    rows = q_rrf_fusion(spark, sf_dir).collect()
    assert rows, "fusion must produce at least the lexical top-k"
    # every doc in at most 2 lists; scores positive; some doc made both lists
    assert all(1 <= r["n_lists"] <= 2 for r in rows)
    assert all(r["rrf_score_scaled"] > 0 for r in rows)


# --- df spectrum --------------------------------------------------------------


def test_df_spectrum_hand_computed(spark):
    # dfs: a->4 (bucket 2), b->2, c->3 (bucket 1), d->1 (bucket 0)
    corpus = [
        (1, "a b c d"),
        (2, "a b c"),
        (3, "a c"),
        (4, "a"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {
        r["df_bucket"]: (r["n_types"], r["total_df"])
        for r in R.df_spectrum(df).collect()
    }
    assert out == {0: (1, 1), 1: (2, 5), 2: (1, 4)}


# --- lexical diversity --------------------------------------------------------


def test_token_diversity_hand_computed(spark):
    corpus = [
        (1, "a a a a"),  # one type: simpson 0
        (2, "a b c d"),  # all distinct: 1 - 4/16 = 0.75, hapax 4
        (3, "a a b"),    # 1 - (4+1)/9
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in R.token_diversity(df).collect()}
    assert out[1]["simpson"] == 0.0 and out[1]["n_hapax"] == 0
    assert out[2]["simpson"] == 0.75 and out[2]["n_hapax"] == 4
    assert out[3]["simpson"] == (9 - 5) / 9
    assert (out[3]["n_tokens"], out[3]["n_types"], out[3]["n_hapax"]) == (3, 2, 1)


def test_token_diversity_skips_empty_docs(spark):
    df = spark.createDataFrame([(1, "  "), (2, "a")], "doc_id long, text string")
    rows = R.token_diversity(df).collect()
    assert [r["doc_id"] for r in rows] == [2]


# --- Hellinger drift ----------------------------------------------------------


def test_hellinger_identical_sources_zero(spark):
    """Two sources with identical distributions -> every term floors to 0."""
    corpus = [(1, "a b", "s1"), (2, "a b", "s2")]
    df = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    out = {r["source"]: r["hellinger2_scaled"] for r in R.hellinger_source_drift(df).collect()}
    assert out == {"s1": 0, "s2": 0}


def test_hellinger_disjoint_sources_hand_computed(spark):
    """Disjoint vocabularies: for s1 (only 'a'), p=(1,0), q=(.5,.5):
    sum = (1-sqrt(.5))^2 + (0-sqrt(.5))^2 per term, floored."""
    corpus = [(1, "a", "s1"), (2, "b", "s2")]
    df = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    out = {r["source"]: r for r in R.hellinger_source_drift(df).collect()}
    s = R.HELLINGER_SCALE
    r05 = math.sqrt(0.5)
    expect = math.floor(s * ((1.0 - r05) * (1.0 - r05))) + math.floor(s * (r05 * r05))
    assert out["s1"]["hellinger2_scaled"] == expect
    assert out["s1"]["n_types_used"] == 1
    assert out["s2"]["hellinger2_scaled"] == expect  # symmetric corpus


# --- Zipf slope ---------------------------------------------------------------


def test_zipf_slope_hand_computed(spark):
    """Frequencies 4,2,1 -> (x,y) points (0,2),(1,1),(1,0); OLS slope by
    the integer-sum formula = (3*1 - 2*3)/(3*2 - 4) = -1.5."""
    corpus = [(1, "a a a a b b c", "s")]
    df = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    row = R.zipf_slope_by_source(df).collect()[0]
    assert row["n_types"] == 3
    assert row["zipf_slope"] == (3 * 1 - 2 * 3) / (3 * 2 - 2 * 2)


def test_zipf_slope_degenerate_null(spark):
    # single type -> one point -> denominator 0 -> null
    df = spark.createDataFrame([(1, "a a", "s")], "doc_id long, text string, source string")
    assert R.zipf_slope_by_source(df).collect()[0]["zipf_slope"] is None


# --- KMV sketch ---------------------------------------------------------------


def _h32(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


def test_kmv_exact_when_under_k(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "s")], "doc_id long, text string, source string"
    )
    row = R.kmv_distinct_tokens(df, k=64).collect()[0]
    assert row["n_types"] == 3 and row["kmv_estimate"] == 3


def test_kmv_estimator_at_k(spark):
    """With exactly k types the estimator fires: floor((k-1)*2^32/(h_k+1))."""
    toks = [f"t{i}" for i in range(8)]
    df = spark.createDataFrame(
        [(1, " ".join(toks), "s")], "doc_id long, text string, source string"
    )
    row = R.kmv_distinct_tokens(df, k=8).collect()[0]
    h_k = sorted(_h32(t) for t in toks)[7]
    assert row["n_types"] == 8
    assert row["kmv_estimate"] == math.floor(7 * (1 << 32) / (h_k + 1))


def test_kmv_estimate_in_ballpark(spark):
    """2000 types, k=64: the KMV estimate should land within ~35% of the
    truth (stddev ~ 1/sqrt(k-1) ~ 12.7%)."""
    toks = " ".join(f"w{i}" for i in range(2000))
    df = spark.createDataFrame([(1, toks, "s")], "doc_id long, text string, source string")
    row = R.kmv_distinct_tokens(df, k=64).collect()[0]
    assert abs(row["kmv_estimate"] - 2000) < 700
