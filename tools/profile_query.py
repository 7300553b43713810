"""Per-query profiling helper for the optimization rounds.

For each named query: builds the DataFrame, writes its
``.explain("formatted")`` plan to ``<plans-dir>/<name>_<tag>.txt`` when
--plans-tag is given (--plans-dir defaults to plans/r<current round>,
inferred from the committed BENCH_r*.json files the way bench.py infers
it — r12 ADVICE: the hardcoded plans/r12 would silently mix rounds), and
times the noop-sink execution best-of-N with cache cleared between
queries — the same methodology as bench.py, but isolated to the named
queries so a change can be measured without a full 244-query sweep.

Usage: python tools/profile_query.py [--sf SF_DIR] [--runs N]
                                     [--plans-tag before|after]
                                     [--plans-dir plans/rNN] query ...
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_stream_processor_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-tag", default=None)
    ap.add_argument(
        "--plans-dir",
        default=None,
        help="plan-dump directory; default plans/r<round> inferred from"
        " committed BENCH_r*.json (same rule as bench._current_round)",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.plans_dir is None:
        import bench

        args.plans_dir = os.path.join(
            base, "plans", f"r{bench._current_round(base)}"
        )

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up identical in spirit to bench.py
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    _wu = pandas_udf(lambda v: v * 1.0, "double")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{args.sf}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    warm = spark.range(100).select(
        F.col("id"), _wu(F.col("id").cast("double")).alias("x")
    )
    warm.mapInPandas(lambda it: it, schema="id long, x double").write.format(
        "noop"
    ).mode("overwrite").save()

    qmap = entrymod.queries()
    for name in args.queries:
        fn = qmap[name]
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        if args.plans_tag:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out_dir = args.plans_dir
            os.makedirs(out_dir, exist_ok=True)
            with open(
                os.path.join(out_dir, f"{name}_{args.plans_tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile: {name}")
        best = float("inf")
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: best={best:.3f}s  runs={times}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
