"""Distributed frequency estimation + deterministic sampling operators.

A 100 TB corpus pipeline needs "what are the frequent items" without a
full-cardinality shuffle, and "give me a reproducible per-stratum sample"
without an order-dependent RNG. Both are absent from the reference engine
(its DAG is fixed; see SURVEY.md §2.11 gap list) and both are classic
scale-first patterns:

- ``heavy_hitter_tokens``: two-pass exact heavy hitters. Pass 1 runs a
  Misra-Gries summary per partition (Arrow-batched ``mapInPandas``,
  merge-with-trim per the mergeable-summaries construction of Agarwal et
  al., PODS '12), yielding ≤ k candidate tokens per partition and NO
  shuffle of the full token-frequency table. Pass 2 exact-recounts ONLY
  the candidate union (broadcast semi-join) and keeps tokens with
  count·k > n. Any token with true count > n/k is guaranteed to be a
  candidate, so the output is exactly the set a full groupBy would
  produce — at a fraction of the shuffle.
- ``stratified_sample``: deterministic fixed-size per-stratum sample —
  rank rows by an LCG hash of the row id within each stratum and keep the
  k smallest. One shuffle on the stratum key; Spark plans a
  WindowGroupLimit so partitions retain only k rows pre-sort. Unlike
  ``df.sampleBy`` the result is reproducible row-for-row across runs,
  cluster sizes, and engines (the oracle re-states it as ROW_NUMBER()).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from cdc_stream_processor_spark.functions import texthash as TH
from cdc_stream_processor_spark.operators.relational import top_k_per_group

HH_K = 30  # report tokens with count > n/HH_K; MG summaries use HH_K counters

_CAND_SCHEMA = StructType([StructField("tok", StringType())])

# stratified sample: LCG over doc_id (distinct constants from corpus.py's
# split/shuffle LCGs so the sample is independent of both)
STRAT_A = 1_664_525
STRAT_B = 1_013_904_223
STRAT_P = 2_147_483_647
STRAT_K = 25  # rows kept per stratum


def _mg_candidates(k: int):
    """Per-partition Misra-Gries summary as a mapInPandas kernel.

    Exact value_counts per Arrow batch, merged into a running summary;
    when the summary exceeds k entries, subtract the (k+1)-th largest
    count from all and drop non-positives (the mergeable-summaries trim).
    Total undercount ≤ n_partition/k, so any token with partition count
    > n_partition/k survives locally — and a token with GLOBAL count
    > n/k must exceed the local bound in at least one partition.
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = pd.Series(dtype="int64")
        for pdf in batches:
            counts = counts.add(pdf["tok"].value_counts(), fill_value=0)
            if len(counts) > k:
                counts = counts.sort_values(ascending=False)
                counts = counts.iloc[:k] - counts.iloc[k]
                counts = counts[counts > 0]
        yield pd.DataFrame({"tok": counts.index.astype(str)})

    return mg


def heavy_hitter_tokens(docs: DataFrame, k: int = HH_K) -> DataFrame:
    """Exact tokens with count·k > n over the corpus token stream.

    Plan shape: map-only tokenize/explode → per-partition MG (no shuffle)
    → candidates broadcast back over the stream → groupBy on ≤ k·P
    candidate tokens only → threshold against the total count (1-row
    broadcast cross join). The full token-frequency table — the thing
    that explodes at 100 TB — is never materialized or shuffled.
    """
    toks = docs.select(F.explode(TH.tokens(F.col("text"))).alias("tok"))
    candidates = (
        toks.mapInPandas(_mg_candidates(k), schema=_CAND_SCHEMA).distinct()
    )
    total = toks.agg(F.count("*").alias("n"))
    return (
        toks.join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("n"))
        .select("tok", "cnt")
    )


def stratified_sample(
    docs: DataFrame, stratum: str = "lang", k: int = STRAT_K
) -> DataFrame:
    """Deterministic k-per-stratum sample: smallest-k LCG keys per stratum."""
    keyed = docs.select(
        "doc_id",
        F.col(stratum).alias("stratum"),
        ((F.col("doc_id") * STRAT_A + STRAT_B) % STRAT_P).alias("sample_key"),
    )
    return top_k_per_group(
        keyed,
        partition_by=["stratum"],
        order_by=[F.col("sample_key").asc(), F.col("doc_id").asc()],
        k=k,
        rank_col="sample_rank",
    ).select("doc_id", "stratum", "sample_key", "sample_rank")


# --- sharded Misra-Gries summary (batch twin of streaming.sketch) -------------

MG_SUMMARY_K = 8  # counters per shard
MG_SUMMARY_SHARDS = 4


def md5_shard(key, n_shards: int):
    """Deterministic shard id in [0, n_shards) from the first 8 md5 hex
    chars — reproducible in DuckDB as ('0x'||substr(md5(k),1,8))::UBIGINT
    % n (same trick as retrieval.kmv_distinct_tokens), unlike xxhash64
    which DuckDB lacks."""
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % F.lit(n_shards)
    )


def misra_gries_summary(
    keys_df: DataFrame,
    key_col: str = "key",
    k: int = MG_SUMMARY_K,
    n_shards: int = MG_SUMMARY_SHARDS,
) -> DataFrame:
    """Sharded Misra-Gries frequency summary with the VALUE-deterministic
    trim rule: per shard, threshold t = the (k+1)-th largest count (with
    multiplicity; 0 when the shard has ≤ k distinct keys), keep keys with
    c > t at estimate c - t.  Output: (shard, key, est_count, n_shard,
    err_bound=t); the MG guarantee is  true_c - est_count ∈ [0, t]  for
    kept keys and  true_c ≤ t  for dropped ones.

    Membership is decided by VALUE comparison (c > t), never by a key
    tie-break, so the summary is engine-exact — boundary ties all drop,
    which may keep fewer than k keys (still a valid MG summary).

    This is the one-merge batch twin of ``streaming.sketch.
    misra_gries_stream`` (single-batch streaming output equals this
    exactly — tested); at 100 TB the summary's per-shard state is k
    counters regardless of key cardinality, and this batch form shuffles
    only the (shard, key) count table, with the (k+1)-th-largest lookup
    as a WindowGroupLimit over ≤ distinct-keys rows.
    """
    from pyspark.sql import Window

    counts = (
        keys_df.select(
            F.col(key_col).alias("key"),
            md5_shard(F.col(key_col), n_shards).alias("shard"),
        )
        .groupBy("shard", "key")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("shard").orderBy(F.col("c").desc(), F.col("key").asc())
    thr = (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == k + 1)
        .select("shard", F.col("c").alias("t"))
    )
    n_shard = counts.groupBy("shard").agg(F.sum("c").alias("n_shard"))
    return (
        counts.join(F.broadcast(thr), "shard", "left")
        .fillna({"t": 0})
        .filter(F.col("c") > F.col("t"))
        .join(F.broadcast(n_shard), "shard")
        .select(
            "shard",
            "key",
            (F.col("c") - F.col("t")).alias("est_count"),
            "n_shard",
            F.col("t").alias("err_bound"),
        )
    )


# --- count-min sketch (point-frequency estimates) -----------------------------

CMS_DEPTH = 3
CMS_WIDTH = 1024


def _cms_col(key, row: int, width: int):
    """Row-salted md5 hash to a CMS column in [0, width) — the row index
    prefixes the key so the CMS_DEPTH hash functions are independent;
    identical in DuckDB via ('0x'||substr(md5(i||k),1,8))::UBIGINT % w."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(str(row)), key)), 1, 8), 16, 10
        ).cast("long")
        % F.lit(width)
    )


def cms_build(
    keys_df: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) over a key stream:
    depth x width integer counters, cell (i, h_i(key)) += 1 per
    occurrence. Returns the non-zero cells (row, col, c) — the sketch is
    a FIXED-SIZE summary (depth*width counters) whatever the key
    cardinality, and cells merge by integer addition across partitions,
    shards, or days (the mergeable-summary property, same family as the
    KMV and Misra-Gries operators).

    Plan: one explode of depth projections per key occurrence -> one
    (row, col) groupBy with map-side partials; the shuffle carries at
    most depth*width distinct cells regardless of corpus size.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(key_col), i, width).alias("col"),
            )
            for i in range(depth)
        ]
    )
    return (
        keys_df.select(F.explode(rows).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_point_estimates(
    keys_df: DataFrame,
    probe_terms: list[str],
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """CMS point-frequency queries next to the exact counts, so the
    one-sided error is visible: est(t) = min_i cell(i, h_i(t)) >= true(t),
    with E[est - true] <= e/width * N per the CMS guarantee.

    Output: (term, est_count, true_count, overestimate). An absent term
    reports the pure collision mass (true_count 0).
    """
    sketch = cms_build(keys_df, key_col, depth, width)
    spark = keys_df.sparkSession
    probes = spark.createDataFrame(
        [(t,) for t in probe_terms], f"term string"
    ).select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_col(F.col("term"), i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("term", F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    est = (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .fillna({"c": 0})
        .groupBy("term")
        .agg(F.min("c").alias("est_count"))
    )
    true_c = (
        keys_df.filter(F.col(key_col).isin(probe_terms))
        .groupBy(F.col(key_col).alias("term"))
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    return (
        est.join(F.broadcast(true_c), "term", "left")
        .fillna({"tc": 0})
        .select(
            "term",
            "est_count",
            F.col("tc").alias("true_count"),
            (F.col("est_count") - F.col("tc")).alias("overestimate"),
        )
    )


# --- mergeable fixed-bin histogram quantile sketch ----------------------------

HIST_BINS = 64
HIST_QS = (50, 90, 99)  # integer percentiles


def histogram_quantiles(
    df: DataFrame,
    value_cents: Column | None = None,
    bins: int = HIST_BINS,
    qs: tuple[int, ...] = HIST_QS,
) -> DataFrame:
    """Single-pass mergeable quantile estimation via a fixed-bin integer
    histogram — the bounded-state member of the quantile family
    (``order_price_quantiles`` is the exact two-shuffle rank form;
    ``order_price_quantiles_approx`` is Spark's built-in KLL/GK).  This
    is the t-digest/druid-histogram shape: per-partition bin counts are
    the sketch, and MERGE = ADD — Spark's map-side partial aggregation
    literally performs the sketch merge, so the shuffle carries at most
    `bins` cells per task regardless of input volume.

    All arithmetic is integer (cents, `div` floor division) so the
    DuckDB oracle is bit-exact: bin width = (max-min) div bins + 1,
    bin = (v-min) div width, target rank t = ceil(q·n/100) =
    (q·n+99) div 100, and the within-bin position interpolates
    UNIFORMLY at integer resolution: est = lo + bin·width +
    ((t - cum_before - 1)·width) div cnt.  The estimate's one-sided
    error is bounded by the emitted `bin_width_cents` (the sketch
    resolution), made visible per row like the CMS overestimate column.

    100 TB: two passes (1-row min/max/count broadcast, then the
    binned count) — both map-side-combined; the quantile selection
    runs on ≤ `bins` rows (aggregate scale, single-partition window
    legitimate per SCALE.md).
    """
    cents = (
        value_cents
        if value_cents is not None
        else F.col("o_totalprice") * F.lit(100)
    ).cast("long")
    # NULL values carry no quantile information and are excluded from
    # the sketch AND from n (r12 --nulls audit: unfiltered, the NULL row
    # inflated the rank target while its NULL bin sorted differently in
    # each engine's cumulative window — the p90 target then landed on a
    # NULL bin in the oracle but a real bin here)
    vals = df.select(cents.alias("cents")).filter(
        F.col("cents").isNotNull()
    )
    stats = vals.agg(
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "mn",
        "mx",
        "n",
        F.expr(f"(mx - mn) div {bins} + 1").alias("width"),
    )
    hist = (
        vals.crossJoin(F.broadcast(stats))
        .select(F.expr("(cents - mn) div width").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hc = hist.select("bin", "cnt", F.sum("cnt").over(w).alias("cum"))
    q = df.sparkSession.createDataFrame(
        [(int(p),) for p in qs], "q_pct long"
    )
    tgt = q.crossJoin(F.broadcast(stats)).select(
        "q_pct",
        F.expr("(q_pct * n + 99) div 100").alias("tgt"),
        "n",
        "width",
        "mn",
    )
    return (
        tgt.join(
            hc,
            (F.col("cum") >= F.col("tgt"))
            & (F.col("cum") - F.col("cnt") < F.col("tgt")),
        )
        .select(
            "q_pct",
            F.col("n").alias("n_rows"),
            "bin",
            F.expr(
                "mn + bin * width + ((tgt - (cum - cnt) - 1) * width) div cnt"
            ).alias("est_cents"),
            F.col("width").alias("bin_width_cents"),
        )
        .orderBy("q_pct")
    )


def histogram_quantiles_from_bins(
    hist: DataFrame,
    lo: int,
    width: int,
    qs: tuple[int, ...] = HIST_QS,
) -> DataFrame:
    """Quantile estimates from a MATERIALIZED fixed-grid bin-count frame
    (bin, cnt) — the read path for ``streaming.sketch.histogram_stream``
    snapshots, using the identical integer interpolation as
    ``histogram_quantiles``: tgt = (q·n+99) div 100, est = lo + bin·width
    + ((tgt - cum_before - 1)·width) div cnt.  Runs on ≤ `bins` rows
    (aggregate scale)."""
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hc = hist.select(
        "bin", "cnt", F.sum("cnt").over(w).alias("cum")
    ).crossJoin(F.broadcast(hist.agg(F.sum("cnt").alias("n"))))
    q = hist.sparkSession.createDataFrame(
        [(int(p),) for p in qs], "q_pct long"
    )
    return (
        q.crossJoin(hc)
        .withColumn("tgt", F.expr("(q_pct * n + 99) div 100"))
        .filter(
            (F.col("cum") >= F.col("tgt"))
            & (F.col("cum") - F.col("cnt") < F.col("tgt"))
        )
        .select(
            "q_pct",
            F.col("n").alias("n_rows"),
            "bin",
            F.expr(
                f"{lo} + bin * {width}"
                f" + ((tgt - (cum - cnt) - 1) * {width}) div cnt"
            ).alias("est_cents"),
            F.lit(width).cast("long").alias("bin_width_cents"),
        )
        .orderBy("q_pct")
    )


# --- AMS tug-of-war F2 sketch (self-join size / second frequency moment) ------

AMS_ESTIMATORS = 8


def _ams_sign(key, estimator: int):
    """±1 sign from the parity of an estimator-salted md5 hash — identical
    in DuckDB via ('0x'||substr(md5(j||'|'||k),1,8))::UBIGINT % 2."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{estimator}|"), key)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % F.lit(2)
    )
    return h * 2 - 1


def ams_f2(
    keys_df: DataFrame,
    key_col: str = "key",
    estimators: int = AMS_ESTIMATORS,
) -> DataFrame:
    """AMS tug-of-war sketch (Alon–Matias–Szegedy, STOC'96) for the second
    frequency moment F2 = Σ f_k² — the self-join size, the statistic a
    query planner wants before committing to a key for a self-join or a
    skew-sensitive aggregation. Each estimator j keeps ONE signed counter
    Σ s_j(k)·f_k with s_j(k) ∈ {±1} from a salted hash; its square is an
    unbiased F2 estimate with variance ≤ 2·F2². The exact F2 rides along
    so the per-estimator error is visible (same honest-sketch contract as
    cms_point_estimates).

    Scale shape: one (key → count) partial-agg shuffle at vocabulary
    scale, then `estimators` signed sums over the vocabulary — the sketch
    state is `estimators` BIGINT cells, mergeable by addition across
    partitions/shards/days. The signed sum is bounded by total key
    occurrences N, so the BIGINT square is exact for N < 3·10⁹; past that
    widen to DECIMAL(38,0) (documented, not hit at any testdata SF).

    Output: one row per estimator (estimator, signed_sum, f2_estimate,
    f2_exact).
    """
    counts = keys_df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("f")
    )
    signed = counts.select(
        "k",
        "f",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("estimator"),
                        (_ams_sign(F.col("k"), j) * F.col("f"))
                        .cast("long")
                        .alias("sf"),
                    )
                    for j in range(estimators)
                ]
            )
        ).alias("e"),
    )
    per_est = signed.groupBy(F.col("e.estimator").alias("estimator")).agg(
        F.sum("e.sf").alias("signed_sum")
    )
    exact = counts.agg(
        F.sum(F.col("f") * F.col("f")).alias("f2_exact")
    )
    return (
        per_est.crossJoin(F.broadcast(exact))
        .select(
            "estimator",
            "signed_sum",
            (F.col("signed_sum") * F.col("signed_sum")).alias("f2_estimate"),
            "f2_exact",
        )
        .orderBy("estimator")
    )
