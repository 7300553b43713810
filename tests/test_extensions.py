"""Tests for dedup / similarity / text-analysis extension operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_stream_processor_spark.operators import dedup as D
from cdc_stream_processor_spark.operators import similarity as S
from cdc_stream_processor_spark.operators import text as X
from cdc_stream_processor_spark.sources import batch as B


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalizes(spark):
    docs = _docs(
        spark,
        [
            (1, "Hello  World"),
            (2, "  hello world "),
            (3, "different text"),
        ],
    )
    out = {r.keep_id: r.n_copies for r in D.exact_dedup(docs).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base + " extra"),  # near-dup: high shingle overlap
            (3, "completely unrelated words about spark execution engines"),
        ],
    )
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard > 0.8


def test_minhash_fast_path_agrees_with_slow(spark, sf_dir):
    docs = B.load_table(spark, sf_dir, "documents")
    slow = {
        (r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(docs, fast=False).collect()
    }
    fast = {
        (r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(docs, fast=True).collect()
    }
    # exact Jaccard verification makes both hash families converge
    assert slow == fast


def test_simhash_identical_docs_equal_fp(spark):
    docs = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta gamma")])
    fps = [r.simhash for r in D.simhash(docs).collect()]
    assert fps[0] == fps[1]


def test_simhash_pairs_pigeonhole_equiv_bruteforce(spark, sf_dir):
    docs = B.load_table(spark, sf_dir, "documents").limit(200)
    fps = D.simhash(docs).collect()
    brute = {
        (a.doc_id, b.doc_id)
        for a in fps
        for b in fps
        if a.doc_id < b.doc_id and bin(a.simhash ^ b.simhash).count("1") <= 3
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert banded == brute


def test_ngram_jaccard_threshold(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h i"),  # 6 shared / 7 union of 3-grams
            (3, "z y x w v u t s"),
        ],
    )
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]


def test_brute_force_topk_self_excluded_and_ranked(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.brute_force_topk(emb.filter("vec_id = 1"), emb, k=2).collect()
    assert [r.neighbor_id for r in out] == [2, 3]
    assert out[0].rank == 1 and out[0].cosine_sim > 0.99


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = B.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    dim = len(emb.select("embedding").first()[0])
    exact = S.brute_force_topk(queries, emb, k=5).collect()
    approx = S.lsh_topk(queries, emb, dim=dim, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 16 tables x 4 planes on weakly-clustered synthetic data
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = B.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = S.brute_force_topk(queries, emb, k=5).collect()
    approx = S.ivf_topk(queries, emb, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4/16 cells probed on weakly-clustered synthetic data
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # every query must still return a full top-k
    per_query = {r.query_id for r in approx}
    assert per_query == {r.query_id for r in exact}


def test_embedding_near_dup_drops_planted_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = S.cosine_pairs(emb, threshold=0.95).collect()
    assert [(p.vec_a, p.vec_b) for p in pairs] == [(1, 2)]
    kept = sorted(r.vec_id for r in S.embedding_near_dup(emb, 0.95).collect())
    assert kept == [1, 3]


def test_lang_id_heuristic(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat sat on the mat and it is happy"),
            (2, "el gato que se sienta en la alfombra no es un perro"),
            (3, "xyzzy plugh qwerty"),
        ],
    )
    out = {r.doc_id: r.lang for r in docs.select(
        "doc_id", X.lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_quality_score_orders_sensibly(spark):
    good = "the quick brown fox jumps over the lazy dog and that is a fine thing " * 4
    noisy = "@@@ ### 12345 !!! ??? %% ^^ && ** (( ))"
    docs = _docs(spark, [(1, good), (2, noisy)])
    out = {r.doc_id: r.q for r in docs.select(
        "doc_id", X.quality_score(F.col("text")).alias("q")).collect()}
    assert out[1] > 0.7 and out[2] < 0.2


def test_fingerprint_order_sensitive(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "c b a"), (3, "a b c")])
    out = {r.doc_id: r.fp for r in docs.select(
        "doc_id", X.doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[1] == out[3] and out[1] != out[2]


def test_token_counts(spark):
    docs = _docs(spark, [(1, "Hello, world! 123 foo-bar")])
    row = docs.select(
        X.token_count_ws(F.col("text")).alias("ws"),
        X.token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert row.ws == 4
    # Hello , world ! 123 foo - bar = 8
    assert row.bpe == 8
