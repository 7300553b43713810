"""Streaming frequency sketches under bounded state.

``misra_gries_stream`` is the streaming twin of
``operators.frequency.misra_gries_summary``: a sharded Misra-Gries
heavy-hitter summary maintained with ``applyInPandasWithState``. The
reference engine has no sketch surface (its only stateful node is the
balance reconciliation processor, BalanceReconciliationProcessor.java:
42-152); this operator is part of the large-scale-pipeline extension
surface — the "what is frequent in the stream RIGHT NOW, with O(k)
state per shard regardless of key cardinality" question that an
unbounded groupBy count cannot answer on a 24/7 stream without
unbounded state.

Semantics — merge-based MG (Agarwal et al., PODS '12 mergeable
summaries), with the VALUE-deterministic trim shared with the batch
twin: per micro-batch the shard's exact batch counts merge into the
stored summary; if the summary then holds more than k keys, the
(k+1)-th largest count t is subtracted from every key and non-positive
keys drop (boundary ties all drop — membership is never decided by a
key tie-break). The stored ``trim_total`` accumulates every t, giving
the exact per-shard error bound:

    true_count(key) - est_count(key) ∈ [0, trim_total]   (kept keys)
    true_count(key) ≤ trim_total                          (absent keys)

Each micro-batch emits the shard's full current summary stamped with a
monotone ``emit_seq``, so any sink holds a recoverable history and the
latest snapshot per shard is ``max(emit_seq)`` (append-sink friendly:
arbitrary stateful ops cannot retract, so snapshots are versioned
rather than updated in place). Every emission additionally carries ONE
null-key sentinel row with the shard's (n_shard, err_bound, emit_seq):
a trim can legitimately empty the whole summary (boundary ties all
drop), and without the sentinel that newest — and emptiest — snapshot
would be invisible to the sink, leaving a stale bound as "latest".

Scale shape: state is k counters per shard partitioned across
executors; the input shuffles once on the shard id. Shard count trades
skew for state (each shard's summary bounds ITS substream, and the
union of shard summaries is a valid sketch of the whole stream by the
mergeable-summaries property).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cdc_stream_processor_spark.operators.frequency import (
    MG_SUMMARY_K,
    MG_SUMMARY_SHARDS,
    md5_shard,
)

MG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("n_shard", T.LongType()),
        T.StructField("err_bound", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
        T.StructField("trim_total", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)


def mg_merge(cur: dict[str, int], batch_counts: dict[str, int], k: int) -> tuple[dict[str, int], int]:
    """Merge exact batch counts into an MG summary; returns (summary,
    trim) where trim is the subtracted (k+1)-th largest count (0 when no
    trim fired). Order-free: depends only on the combined count multiset."""
    for key, c in batch_counts.items():
        cur[key] = cur.get(key, 0) + c
    if len(cur) <= k:
        return cur, 0
    vals = sorted(cur.values(), reverse=True)
    t = vals[k]
    return {key: c - t for key, c in cur.items() if c > t}, t


def _mg_group_fn(k: int):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            keys, counts, n, trim_total, emit_seq = state.get
            cur = dict(zip(keys, (int(c) for c in counts)))
        else:
            cur, n, trim_total, emit_seq = {}, 0, 0, 0
        vc: dict[str, int] = {}
        for pdf in batches:
            for key_val, c in pdf["key"].value_counts().items():
                vc[key_val] = vc.get(key_val, 0) + int(c)
        n += sum(vc.values())
        cur, t = mg_merge(cur, vc, k)
        trim_total += t
        emit_seq += 1
        state.update(
            (list(cur.keys()), [cur[x] for x in cur], n, trim_total, emit_seq)
        )
        yield _snapshot_pdf(shard, cur, n, trim_total, emit_seq)

    return fn


def _snapshot_pdf(
    shard, cur: dict[str, int], n: int, trim_total: int, emit_seq: int
) -> pd.DataFrame:
    """Summary rows sorted (-est, key), preceded by the null-key sentinel."""
    snap = sorted(cur.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = 1 + len(snap)
    return pd.DataFrame(
        {
            "shard": pd.array([shard] * rows, dtype="Int64"),
            "key": [None] + [x for x, _ in snap],
            "est_count": pd.array(
                [None] + [c for _, c in snap], dtype="Int64"
            ),
            "n_shard": pd.array([n] * rows, dtype="Int64"),
            "err_bound": pd.array([trim_total] * rows, dtype="Int64"),
            "emit_seq": pd.array([emit_seq] * rows, dtype="Int64"),
        },
        columns=[f.name for f in MG_OUTPUT_SCHEMA.fields],
    )


def misra_gries_stream(
    df: DataFrame,
    key_col: str = "key",
    k: int = MG_SUMMARY_K,
    n_shards: int = MG_SUMMARY_SHARDS,
) -> DataFrame:
    """Sharded streaming Misra-Gries summary (see module docstring).

    Works on a streaming OR batch DataFrame: ``applyInPandasWithState``
    is streaming-only in Spark 4, so a batch frame routes through a
    stateless ``applyInPandas`` running the SAME merge once per shard —
    exactly the batch twin's one-merge semantics, which the parity test
    pins (modulo the sentinel row, which only the sketch kernel emits)."""
    keyed = df.select(
        F.col(key_col).cast("string").alias("key"),
        md5_shard(F.col(key_col).cast("string"), n_shards).alias("shard"),
    )
    if not df.isStreaming:

        def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            vc = {
                str(key): int(c)
                for key, c in pdf["key"].value_counts().items()
            }
            cur, t = mg_merge({}, vc, k)
            return _snapshot_pdf(shard, cur, sum(vc.values()), t, 1)

        return keyed.groupBy("shard").applyInPandas(
            batch_fn, schema=MG_OUTPUT_SCHEMA
        )
    return keyed.groupBy("shard").applyInPandasWithState(
        _mg_group_fn(k),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_stream(
    df: DataFrame,
    key_col: str = "key",
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Streaming count-min sketch: the (row, col) cell counters of
    ``operators.frequency.cms_build`` maintained as a running streaming
    aggregation — Spark's agg state IS the sketch (depth·width bounded
    keys, so the state is fixed-size without watermark eviction; this is
    the rare unbounded-lifetime streaming agg that is legitimately
    state-bounded by construction). Update mode emits changed cells per
    micro-batch; the latest value per (row, col) is the live sketch, and
    point estimates are min-over-rows exactly as in the batch twin
    (single-batch parity + cross-run checkpoint recovery are tested).
    """
    from cdc_stream_processor_spark.operators.frequency import (
        CMS_DEPTH,
        CMS_WIDTH,
        _cms_col,
    )

    d = depth if depth is not None else CMS_DEPTH
    w = width if width is not None else CMS_WIDTH
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(key_col), i, w).alias("col"),
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_stream(
    df: DataFrame,
    value_col: str = "cents",
    lo: int = 0,
    width: int = 100,
    bins: int = 64,
) -> DataFrame:
    """Streaming fixed-grid histogram: the bin counters of
    ``operators.frequency.histogram_quantiles`` maintained as a running
    streaming aggregation — the same legitimately-state-bounded shape as
    ``cms_stream`` (at most `bins` agg keys, no watermark needed). Unlike
    the batch sketch, a stream cannot first observe min/max, so the grid
    (lo, width, bins) is FIXED a priori — the standard streaming-histogram
    contract — and out-of-range values clamp into the edge bins.  Update
    mode emits changed bins per micro-batch; the latest value per bin is
    the live sketch, and quantile estimates come from
    ``operators.frequency.histogram_quantiles_from_bins`` over any
    materialized snapshot (same integer interpolation as the batch twin).
    Works identically on a batch frame (plain groupBy)."""
    bin_ = F.least(
        F.greatest(
            F.expr(f"(cast({value_col} as bigint) - {lo}) div {width}"),
            F.lit(0),
        ),
        F.lit(bins - 1),
    ).alias("bin")
    return df.select(bin_).groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))


def ams_stream(
    df: DataFrame,
    key_col: str = "key",
    estimators: int | None = None,
) -> DataFrame:
    """Streaming AMS tug-of-war F2 sketch: the signed counters of
    ``operators.frequency.ams_f2`` maintained as a running streaming
    aggregation. Each arriving key occurrence contributes s_j(key) ∈
    {±1} to estimator j, so the agg state is exactly `estimators` BIGINT
    cells — like cms_stream, a legitimately state-bounded unbounded-
    lifetime aggregation (no watermark needed). The live F2 estimate is
    signed_sum² at read time; squaring inside the stream would break the
    merge property (squares don't add), which is why the emitted state
    is the SUM, mirroring how the batch twin defers the square to the
    final select.

    Update mode emits changed estimator cells per micro-batch;
    single-batch parity with ams_f2's signed sums and cross-run
    checkpointed accumulation are tested.
    """
    from cdc_stream_processor_spark.operators.frequency import (
        AMS_ESTIMATORS,
        _ams_sign,
    )

    d = estimators if estimators is not None else AMS_ESTIMATORS
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("estimator"),
                _ams_sign(F.col(key_col), j).cast("long").alias("s"),
            )
            for j in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.estimator").alias("estimator"))
        .agg(F.sum("c.s").alias("signed_sum"))
    )
