"""Driver-contract queries for the training-data-pipeline extensions:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), vector similarity
(brute-force cosine + LSH), and text analysis.

Oracle SQL is generated from the same constants as the Spark operators
(cdc_stream_processor_spark.functions.texthash), so both engines evaluate the
identical deterministic arithmetic — polynomial char hashes, affine minhash
permutations, left-fold dot products — verified bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_stream_processor_spark.functions import texthash as TH
from cdc_stream_processor_spark.operators import dedup as D
from cdc_stream_processor_spark.operators import multimodal as M
from cdc_stream_processor_spark.operators import similarity as S
from cdc_stream_processor_spark.operators import text as X
from cdc_stream_processor_spark.sources import batch as B

JACCARD_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 2  # word-soup test corpus clusters tightly; ≤2 keeps pairs meaningful
TOPK = 5
QUERY_STRIDE = 50  # vec_id % 50 == 0 are the similarity query vectors


def _polyhash_sql(var: str) -> str:
    return TH.CHAR_POLYHASH_SQL(var)


# Shared oracle CTEs over documents: tokens, shingle hashes, token hashes.
DOCS_CTE = f"""
WITH docs AS (
  SELECT doc_id, {TH.TOKENS_SQL.format(text="text")} AS toks FROM documents
), sh AS (
  SELECT doc_id, {TH.SHINGLES_SQL("toks", 3)} AS sset FROM docs
), shh AS (
  SELECT doc_id, list_transform(sset, s -> {_polyhash_sql("s")}) AS hs
  FROM sh WHERE len(sset) > 0
), tokh AS (
  SELECT doc_id, list_transform(toks, t -> {_polyhash_sql("t")}) AS hs
  FROM docs WHERE len(toks) > 0
)
"""


# --- exact dedup --------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(B.load_table(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents
GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
"""


# --- MinHash LSH ----------------------------------------------------------------


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        B.load_table(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD
    )


def _minhash_sql() -> str:
    rows = D.N_MINHASH // D.N_BANDS
    mins = ", ".join(
        f"list_min(list_transform(hs, x -> ({a} * x + {b}) % {TH.P_MOD}))"
        for a, b in (D._minhash_params(i) for i in range(D.N_MINHASH))
    )
    return (
        DOCS_CTE
        + f"""
, mh AS (
  SELECT doc_id, hs, [{mins}] AS m FROM shh
), bands AS (
  SELECT doc_id, hs, g.i AS band_idx,
    list_reduce(list_prepend(0::BIGINT, m[g.i*{rows}+1 : g.i*{rows}+{rows}]),
                (acc, x) -> (acc * 31 + x) % {TH.P_MOD}) AS band_hash
  FROM mh, generate_series(0, {D.N_BANDS - 1}) g(i)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
), scored AS (
  SELECT c.doc_a, c.doc_b,
    ROUND(len(list_intersect(x.hs, y.hs))::DOUBLE /
          (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)))::DOUBLE,
          6) AS jaccard
  FROM cand c JOIN shh x ON c.doc_a = x.doc_id JOIN shh y ON c.doc_b = y.doc_id
)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= {JACCARD_THRESHOLD}
"""
    )


# --- SimHash --------------------------------------------------------------------


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(B.load_table(spark, sf_dir, "documents"))


def _simhash_fp_sql_body() -> str:
    bits = " + ".join(
        f"(CASE WHEN list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(hs, x -> CASE WHEN (x >> {b}) & 1 = 1 "
        f"THEN 1::BIGINT ELSE (-1)::BIGINT END)), (a, v) -> a + v) > 0 "
        f"THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(D.SIMHASH_BITS)
    )
    return f"SELECT doc_id, {bits} AS simhash FROM tokh"


def _simhash_fp_sql() -> str:
    return DOCS_CTE + _simhash_fp_sql_body()


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(
        B.load_table(spark, sf_dir, "documents"), max_hamming=SIMHASH_MAX_HAMMING
    )


def _simhash_pairs_sql() -> str:
    # Oracle is the O(n²) brute force; the engine's band-blocked join is
    # guaranteed equivalent for max_hamming < N bands (pigeonhole).
    return (
        DOCS_CTE
        + f"""
, fp AS ({_simhash_fp_sql_body()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""
    )


# --- n-gram Jaccard ---------------------------------------------------------------


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        B.load_table(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD
    )


NGRAM_JACCARD_SQL = (
    DOCS_CTE
    + f"""
, inv AS (
  SELECT doc_id, unnest(hs) AS h FROM shh
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (
  SELECT doc_id, len(hs) AS n FROM shh
)
SELECT p.doc_a, p.doc_b,
       ROUND(p.shared::DOUBLE / (x.n + y.n - p.shared)::DOUBLE, 6) AS jaccard
FROM pairs p JOIN sizes x ON p.doc_a = x.doc_id JOIN sizes y ON p.doc_b = y.doc_id
WHERE p.shared::DOUBLE / (x.n + y.n - p.shared)::DOUBLE >= {JACCARD_THRESHOLD}
"""
)


# --- vector similarity -------------------------------------------------------------


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = B.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return S.brute_force_topk(queries, emb, k=TOPK)


_FOLD_SUM = "list_reduce(list_prepend(0.0::DOUBLE, {arr}), (acc, x) -> acc + x)"


def _cosine_topk_sql() -> str:
    dot = _FOLD_SUM.format(
        arr="list_transform(list_zip(q.e, c.e), p -> p[1] * p[2])"
    )
    nq = _FOLD_SUM.format(arr="list_transform(q.e, x -> x * x)")
    nc = _FOLD_SUM.format(arr="list_transform(c.e, x -> x * x)")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
), q AS (
  SELECT * FROM v WHERE vec_id % {QUERY_STRIDE} = 0
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({dot} / (sqrt({nq}) * sqrt({nc})), 6) AS cosine_sim
  FROM q, v c
  WHERE q.vec_id != c.vec_id
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOPK}
"""


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN (rows-only check; recall vs brute force is asserted
    in tests/test_extensions.py)."""
    emb = B.load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return S.lsh_topk(queries, emb, dim=dim, k=TOPK)


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN (rows-only check; recall vs brute force is asserted in
    tests/test_extensions.py)."""
    emb = B.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return S.ivf_topk(queries, emb, k=TOPK)


# --- embedding-cosine near-dup ------------------------------------------------

NEAR_DUP_COSINE = 0.4  # synthetic corpus has no true dups; 0.4 → "near" pairs


def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_pairs(
        B.load_table(spark, sf_dir, "embeddings"), threshold=NEAR_DUP_COSINE
    )


def _near_dup_pairs_sql() -> str:
    dot = _FOLD_SUM.format(
        arr="list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])"
    )
    na = _FOLD_SUM.format(arr="list_transform(a.e, x -> x * x)")
    nb = _FOLD_SUM.format(arr="list_transform(b.e, x -> x * x)")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
)
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND({dot} / (sqrt({na}) * sqrt({nb})), 6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id
) WHERE cosine_sim >= {NEAR_DUP_COSINE}
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_near_dup(
        B.load_table(spark, sf_dir, "embeddings"), threshold=NEAR_DUP_COSINE
    )


def _near_dup_keep_sql() -> str:
    return f"""
WITH pairs AS ({_near_dup_pairs_sql()})
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_b FROM pairs)
"""


# --- multimodal --------------------------------------------------------------

FRAME_EVERY_N = 16
FRAME_MAX = 4

_HEXB = (
    "((strpos('0123456789abcdef', substr(h, {p1}, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(h, {p2}, 1)) - 1)"
)


def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-decode features over the binary media column (mapInPandas
    plumbing); sha256-derived values reproduced exactly by the oracle."""
    media = M.media_from_documents(B.load_table(spark, sf_dir, "documents"))
    return M.image_features(media).select(
        "media_id", "n_bytes", "sha256", "width", "height", "mean_luma"
    )


def _image_features_sql() -> str:
    b0 = _HEXB.format(p1=1, p2=2)
    b1 = _HEXB.format(p1=3, p2=4)
    b2 = _HEXB.format(p1=5, p2=6)
    return f"""
WITH img AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
         sha256(text) AS h
  FROM documents WHERE doc_id % 4 NOT IN (0, 1)
)
SELECT media_id, n_bytes, h AS sha256,
       64 + {b0} % 192 AS width,
       64 + {b1} % 192 AS height,
       {b2} / 255.0 AS mean_luma
FROM img
"""


def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-decode audio features (rate/duration/loudness) over the binary
    media column; sha256-derived values reproduced exactly by the oracle."""
    media = M.media_from_documents(B.load_table(spark, sf_dir, "documents"))
    return M.audio_features(media)


def _audio_features_sql() -> str:
    b0 = _HEXB.format(p1=1, p2=2)
    b1 = _HEXB.format(p1=3, p2=4)
    b2 = _HEXB.format(p1=5, p2=6)
    return f"""
WITH clip AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
         sha256(text) AS h
  FROM documents WHERE doc_id % 4 = 1
)
SELECT media_id, n_bytes, h AS sha256,
       8000 + {b0} * 100 AS sample_rate,
       ROUND(1.0 + {b1} / 16.0, 6) AS duration_s,
       ROUND({b2} / 255.0, 6) AS rms
FROM clip
"""


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling fan-out (one row per sampled frame); frame
    payloads decoded back to text (ASCII corpus) for the oracle compare."""
    media = M.media_from_documents(B.load_table(spark, sf_dir, "documents"))
    frames = M.sample_frames(media, every_n=FRAME_EVERY_N, max_frames=FRAME_MAX)
    return frames.select(
        "media_id",
        "frame_idx",
        F.decode(F.col("frame_payload"), "UTF-8").alias("frame_text"),
    )


def _frame_sample_sql() -> str:
    return f"""
WITH vids AS (
  SELECT doc_id AS media_id, text, length(text) AS n FROM documents
  WHERE doc_id % 4 = 0
)
, idx AS (
  SELECT media_id, text,
         unnest(generate_series(0,
           least(greatest(n // {FRAME_EVERY_N}, 1), {FRAME_MAX}) - 1))
           AS frame_idx
  FROM vids
)
SELECT media_id, frame_idx,
       substr(text, frame_idx * {FRAME_EVERY_N} + 1, {FRAME_EVERY_N})
         AS frame_text
FROM idx
"""


# --- text analysis -----------------------------------------------------------------


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.text_profile(B.load_table(spark, sf_dir, "documents"))


def _lang_scores_sql() -> dict[str, str]:
    toks = "list_distinct(" + TH.TOKENS_SQL.format(text="text") + ")"
    return {
        lang: f"len(list_intersect({toks}, {list(words)}))"
        for lang, words in X.STOPWORDS.items()
    }


def _text_profile_sql() -> str:
    toks = TH.TOKENS_SQL.format(text="text")
    scores = _lang_scores_sql()
    best = "greatest(" + ", ".join(scores[lg] for lg in X.LANG_ORDER) + ")"
    lang_case = "CASE WHEN " + best + " <= 0 THEN 'und' "
    for lg in X.LANG_ORDER:
        lang_case += f"WHEN {scores[lg]} = {best} THEN '{lg}' "
    lang_case += "ELSE 'und' END"
    en_stop = list(X.STOPWORDS["en"])
    n_stop = f"len(list_intersect(list_distinct({toks}), {en_stop}))"
    alpha = "length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))"
    digit = "length(regexp_replace(text, '[^0-9]', '', 'g'))"
    punct = "length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))"
    safe = "greatest(length(text), 1)::DOUBLE"
    ntok = f"len({toks})"
    mean_tok = f"ROUND({alpha}::DOUBLE / greatest({ntok}, 1), 6)"
    punct_ratio = f"ROUND({punct}::DOUBLE / {safe}, 6)"
    digit_ratio = f"ROUND({digit}::DOUBLE / {safe}, 6)"
    length_term = f"least({ntok}::DOUBLE / 64.0, 1.0)"
    stop_term = f"least({n_stop}::DOUBLE / 4.0, 1.0)"
    noise = f"least(({punct_ratio} + {digit_ratio}) * 2.0, 1.0)"
    quality = f"ROUND(0.5 * {length_term} + 0.5 * {stop_term} - 0.3 * {noise}, 6)"
    fp_fold = (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({toks}, t -> {_polyhash_sql('t')})), "
        f"(acc, h) -> (acc * {TH.FP_FACTOR} + (h % {TH.FP_MOD})) % {TH.FP_MOD})"
    )
    bpe = f"len(regexp_extract_all(text, '{X.BPE_TOKEN_RE}'))"
    return f"""
SELECT doc_id,
  length(text) AS n_chars,
  {ntok} AS n_tokens_ws,
  {bpe} AS n_tokens_bpe,
  {mean_tok} AS mean_token_len,
  {punct_ratio} AS punct_ratio,
  {digit_ratio} AS digit_ratio,
  {n_stop} AS stopword_hits,
  {quality} AS quality_score,
  {lang_case} AS lang_pred,
  {fp_fold} AS fingerprint
FROM documents
"""


def q_doc_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.document_sentiment(B.load_table(spark, sf_dir, "documents"))


def _doc_sentiment_sql() -> str:
    toks = TH.TOKENS_SQL.format(text="text")
    pos = list(X.POSITIVE_WORDS)
    neg = list(X.NEGATIVE_WORDS)
    p = f"len(list_filter({toks}, t -> list_contains({pos}, t)))"
    n = f"len(list_filter({toks}, t -> list_contains({neg}, t)))"
    return f"""
SELECT doc_id, {p} AS pos_hits, {n} AS neg_hits,
  CASE WHEN {p} + {n} = 0 THEN 0.0
       ELSE ROUND(({p} - {n})::DOUBLE / ({p} + {n})::DOUBLE, 6)
  END AS sentiment
FROM documents
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "minhash_lsh_pairs": q_minhash_pairs,
    "simhash_fingerprints": q_simhash_fingerprints,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "cosine_topk": q_cosine_topk,
    "lsh_ann_topk": q_lsh_ann_topk,
    "ivf_ann_topk": q_ivf_ann_topk,
    "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
    "embedding_near_dup": q_embedding_near_dup,
    "multimodal_image_features": q_multimodal_image_features,
    "multimodal_audio_features": q_multimodal_audio_features,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "text_profile": q_text_profile,
    "doc_sentiment": q_doc_sentiment,
}

ORACLES = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "minhash_lsh_pairs": _minhash_sql(),
    "simhash_fingerprints": _simhash_fp_sql(),
    "simhash_pairs": _simhash_pairs_sql(),
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "cosine_topk": _cosine_topk_sql(),
    # lsh_ann_topk / ivf_ann_topk intentionally rows-only (approximate ops)
    "embedding_near_dup_pairs": _near_dup_pairs_sql(),
    "embedding_near_dup": _near_dup_keep_sql(),
    "multimodal_image_features": _image_features_sql(),
    "multimodal_audio_features": _audio_features_sql(),
    "multimodal_frame_sample": _frame_sample_sql(),
    "text_profile": _text_profile_sql(),
    "doc_sentiment": _doc_sentiment_sql(),
}
