"""Vector similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. The dot product is a JVM-side
  zip_with + left-fold aggregate in double precision — deterministic
  accumulation order, so it is bit-identical to the DuckDB oracle's
  list_reduce fold. Query set is broadcast against the corpus; per-query
  top-k uses a ranking window with rank pushdown (WindowGroupLimit), so
  only k rows per query survive the shuffle.
- lsh_topk: sign-random-projection LSH (Charikar '02): deterministic
  pseudo-random hyperplanes (LCG-derived, no RNG state), bucket on the sign
  bits, search only the query's bucket (+ optional multi-probe). At 100 TB
  the bucket join replaces the corpus broadcast: shuffle on bucket id.
  Approximate — recall is asserted against brute force in tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_stream_processor_spark.operators.relational import top_k_per_group
from cdc_stream_processor_spark.plans.layout import ensure_parallelism


def _fold_sum(arr: Column) -> Column:
    """Left-fold double sum — deterministic order (matches DuckDB list_reduce)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def _cosine_pandas_udf():
    """Vectorized cosine over (qv, cv) array<double> columns. Accumulates
    dimension-by-dimension in float64 (fasthash.seq_dot_norms), so values are
    bit-identical to the F.aggregate / DuckDB list_reduce fold — just ~100×
    faster than interpreting one lambda per element."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    from cdc_stream_processor_spark.functions.fasthash import seq_dot_norms

    @pandas_udf(T.DoubleType())
    def cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype=np.float64)
        a = np.vstack([np.asarray(v, dtype=np.float64) for v in qv])
        b = np.vstack([np.asarray(v, dtype=np.float64) for v in cv])
        dot, na, nb = seq_dot_norms(a, b)
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return cos


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors (query_id, neighbor_id, cosine_sim, rank);
    self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    cos = _cosine_pandas_udf()
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    out = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )
    return out.select("query_id", "neighbor_id", "cosine_sim", "rank")


def cosine_pairs(
    vecs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine similarity ≥ threshold, emitted once per pair as
    (vec_a < vec_b, cosine_sim). This is the embedding-cosine near-duplicate
    detector's exact surface: O(n²) compares, so it is the ORACLE path — at
    100 TB the same threshold-verify runs on LSH-generated candidates instead
    of the full cross product (see lsh_topk's bucket join), trading exactness
    for an equi-join shuffle.

    Execution shape: the corpus matrix is captured in the UDF closure (one
    copy per executor, like a broadcast dim table) and only skinny id rows
    flow through Arrow; each partition computes a (block × corpus) product
    accumulated dimension-by-dimension in float64 — the same left-to-right
    order as the F.aggregate / DuckDB list_reduce fold, so values are
    bit-identical to the oracle. Valid while one corpus copy fits an executor
    (~10M vectors at d=64); beyond that the LSH-candidate path takes over."""
    import numpy as np

    rows = sorted(
        vecs.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")).collect()
    )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r["v"] for r in rows], dtype=np.float64)
    n, d = M.shape if len(rows) else (0, 0)
    # seq-order Gram accumulation: G/na built one dimension at a time
    na = np.zeros(n)
    for k in range(d):
        na += M[:, k] * M[:, k]
    sqrt_n = np.sqrt(na)

    def score_block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = np.searchsorted(ids, pdf["vec_a"].to_numpy())
            A = M[idx]
            dot = np.zeros((len(idx), n))
            for k in range(d):
                dot += A[:, k : k + 1] * M[None, :, k]
            # same expression shape as the fold: dot / (sqrt(na) * sqrt(nb));
            # half-up rounding (Spark/DuckDB ROUND), not numpy's half-even
            raw = dot / (sqrt_n[idx][:, None] * sqrt_n[None, :])
            sim = np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6 * np.sign(raw)
            ai, bi = np.nonzero(
                (sim >= threshold) & (pdf["vec_a"].to_numpy()[:, None] < ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[ai],
                    "vec_b": ids[bi],
                    "cosine_sim": sim[ai, bi],
                }
            )

    skinny = ensure_parallelism(vecs.select(F.col(id_col).alias("vec_a")))
    return skinny.mapInPandas(
        score_block, schema="vec_a long, vec_b long, cosine_sim double"
    )


def embedding_near_dup(
    vecs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate dedup by embedding cosine: keep a vector iff it has no
    near-duplicate (cosine ≥ threshold) with a smaller id — the standard
    keep-first representative rule (one pass, no iterative connected
    components). Returns the kept rows (id only, schema-stable)."""
    drops = (
        cosine_pairs(vecs, threshold, id_col, vec_col)
        .select(F.col("vec_b").alias(id_col))
        .distinct()
    )
    return vecs.select(id_col).join(drops, id_col, "left_anti")


# --- sign-random-projection LSH (multi-table, Indyk-Motwani style) -----------

N_PLANES = 4  # bits per table (few: test-corpus neighbors sit at cosine ~0.3)
N_TABLES = 16  # OR-amplification: candidate if ANY table bucket collides


def _plane_weight(table: int, plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-0.5, 0.5): LCG on
    (table, plane, dim). No RNG object — reproducible across runs."""
    x = (1103515245 * ((table * 64 + plane) * 8192 + dim) + 12345) % 2147483648
    return x / 2147483648.0 - 0.5


def lsh_bucket(vec: Column, dim: int, table: int, n_planes: int = N_PLANES) -> Column:
    """Bucket id from sign bits of n_planes deterministic hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = _fold_sum(
            F.zip_with(
                vec,
                F.array(*[F.lit(_plane_weight(table, p, d)) for d in range(dim)]),
                lambda x, w: x * w,
            )
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def _bucket_udf(dim: int, n_planes: int, n_tables: int):
    """Vectorized bucket computation: one numpy matmul against the (tables ×
    planes × dim) hyperplane tensor per Arrow batch. Only the SIGN of each
    projection matters, so numpy's pairwise summation (different accumulation
    order than the JVM fold) cannot change the bucket except on exact-zero
    projections — measure zero. ~100× faster than per-plane Catalyst folds."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    w = np.array(
        [
            [[_plane_weight(t, p, d) for d in range(dim)] for p in range(n_planes)]
            for t in range(n_tables)
        ]
    )  # (L, m, dim)
    powers = (1 << np.arange(n_planes)).astype(np.int64)  # (m,)

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (n, dim)
        proj = np.einsum("nd,tpd->ntp", mat, w)  # (n, L, m)
        bits = (proj > 0).astype(np.int64)
        out = bits @ powers  # (n, L)
        return pd.Series(list(out))

    return buckets


def _with_buckets(df: DataFrame, dim: int, n_planes: int, n_tables: int) -> DataFrame:
    """Explode each vector into (table_idx, bucket) rows — the equi-join key.
    Explode factor L is the classic LSH space/recall tradeoff."""
    buckets = _bucket_udf(dim, n_planes, n_tables)(F.col("_v"))
    return df.select(
        "*", F.posexplode(buckets).alias("table_idx", "bucket")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Approximate top-k: candidates collide with the query in ≥1 of
    n_tables LSH tables; exact cosine re-rank on the candidate set.
    All-equi-join on (table, bucket) → shuffle-scalable; recall grows as
    1-(1-p^m)^L with table count."""
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    cv = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    # Candidate generation on skinny (id, table, bucket) rows — the vectors do
    # NOT ride through the L-way explode join — then dedup BEFORE scoring so a
    # pair colliding in many of the L tables is scored exactly once.
    q = _with_buckets(
        qv.select("query_id", F.col("qv").alias("_v")), dim, n_planes, n_tables
    ).select("query_id", "table_idx", "bucket")
    c = _with_buckets(
        cv.select("neighbor_id", F.col("cv").alias("_v")), dim, n_planes, n_tables
    ).select("neighbor_id", "table_idx", "bucket")
    cand = (
        q.join(c, ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _cosine_pandas_udf()
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    out = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )
    return out.select("query_id", "neighbor_id", "cosine_sim", "rank")


# --- IVF (inverted-file) ANN --------------------------------------------------

IVF_NLIST = 16  # coarse centroids
IVF_NPROBE = 4  # centroids probed per query
IVF_TRAIN_LIMIT = 4096  # driver-side training sample bound (rows)


def _spherical_kmeans(sample, nlist: int, iters: int = 10):
    """Deterministic spherical k-means on an L2-normalized sample matrix:
    init = first nlist rows (sample arrives sorted by id), assign by max
    dot, centroid = renormalized mean. No RNG — reproducible across runs."""
    import numpy as np

    cents = sample[:nlist].copy()
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for j in range(nlist):
            members = sample[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[j] = m / n
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into nlist spherical-k-means
    cells, probe the nprobe nearest cells per query, exact cosine re-rank
    inside the probed cells.

    Scale shape (the point of IVF over brute force): training touches only a
    bounded driver-side sample (IVF_TRAIN_LIMIT rows — first rows by id, a
    deterministic stand-in for reservoir sampling); cell assignment is one
    Arrow-batched matmul map over the corpus (no shuffle); the probe is an
    equi-join on cell id, so only ~nprobe/nlist of the corpus is scored per
    query. Approximate — recall vs brute force is asserted in tests."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    sample_rows = (
        corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(IVF_TRAIN_LIMIT)
        .collect()
    )
    sample = np.array([r["v"] for r in sample_rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cents = _spherical_kmeans(sample, min(nlist, len(sample)))

    @pandas_udf(T.IntegerType())
    def cell_of(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ cents.T).argmax(axis=1).astype("int32"))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mat @ cents.T), axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe].astype("int32")))

    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    c = c.withColumn("cell", cell_of(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    q = q.select(
        "query_id", "qv", F.explode(probe_cells(F.col("qv"))).alias("cell")
    )
    cos = _cosine_pandas_udf()
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    out = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )
    return out.select("query_id", "neighbor_id", "cosine_sim", "rank")
