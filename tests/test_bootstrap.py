"""Planted test for the deterministic-LCG bootstrap CI
(operators.relational.bootstrap_ci_daily_revenue): replay every draw in
pure Python and compare the order-statistic CI exactly."""

from __future__ import annotations

import datetime

from cdc_stream_processor_spark.operators import relational as R


def _python_replay(day_revs: list[float], n_boot: int):
    n = len(day_revs)
    means = []
    for b in range(n_boot):
        s = 0.0
        for i in range(n):
            t = b * n + i
            sel = (t * R.BOOT_A + R.BOOT_C) % R.BOOT_P % n
            s += day_revs[sel]
        means.append((s / n, b))
    means.sort()
    lo = -(-5 * n_boot // 100)
    hi = -(-95 * n_boot // 100)
    return means[lo - 1][0], means[hi - 1][0]


def test_bootstrap_ci_hand_replayed(spark):
    # 6 days with distinct round revenues (exact in decimal AND double,
    # so the python replay's float sum equals the engine's decimal sum)
    revs = [100.0, 200.0, 400.0, 800.0, 1600.0, 3200.0]
    rows = []
    for d, r in enumerate(revs):
        date = datetime.datetime(2024, 1, 1 + d)
        rows.append((d * 2, date, r / 2))
        rows.append((d * 2 + 1, date, r / 2))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = R.bootstrap_ci_daily_revenue(df, n_boot=40).collect()[0]
    assert out.n_days == 6 and out.n_boot == 40
    assert out.mean_daily_revenue == sum(revs) / 6
    lo, hi = _python_replay(revs, 40)
    assert out.ci_lo == lo and out.ci_hi == hi
    assert out.ci_lo <= out.mean_daily_revenue <= out.ci_hi


def test_bootstrap_ci_single_day_degenerate(spark):
    # one day: every resample draws it n times -> CI collapses to the mean
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 500.0)],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    out = R.bootstrap_ci_daily_revenue(df, n_boot=40).collect()[0]
    assert out.ci_lo == out.ci_hi == out.mean_daily_revenue == 500.0
