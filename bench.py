"""Benchmark harness: runs every driver-contract query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Materialization uses the noop sink (full execution, no driver collect cost).

Besides stdout (which the driver may truncate to a tail), every run also
writes the FULL per-query record to ``bench_r{N}_full.json`` (N inferred
from the committed BENCH_r*.json round files) and a round-over-round
regression table to ``BENCH_REGRESSIONS.md`` comparing against the
previous round's full file — queries >2x slower AND >+0.3s are flagged so
regressions in the a–o alphabet range can't hide in a truncated tail.

Flags self-adjudicate IN-RECORD: each flagged query is re-measured in
isolation at the end of the run (cache cleared, JVM GC'd, best-of-N with
nothing else in flight) and the retiming lands in the record under
``flag_remeasure`` + a verdict column in BENCH_REGRESSIONS.md, so an
ambient-load spike on the runner box can't contradict the committed
record (r8 — two judged rounds traced every flag to in-sweep noise).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_stream_processor_spark.session import get_spark  # noqa: E402


def _current_round(base: str) -> int:
    """Round number this bench run belongs to: one past the newest
    committed BENCH_r*.json (the driver writes that file AFTER the round's
    bench, so during round N only r1..N-1 exist)."""
    import glob
    import re

    rounds = [0]
    for p in glob.glob(os.path.join(base, "BENCH_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(p))
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def _load_prev(
    base: str, rnd: int
) -> tuple[dict[str, float], int, bool, set[str]]:
    """Previous round's per-query timings: newest bench_r*_full.json below
    this round, falling back to the truncated driver-tail salvage.

    For queries the previous round FLAGGED, the isolated ``flag_remeasure``
    value replaces the in-sweep timing as the baseline (r8 ADVICE):
    isolated runs are systematically faster than in-sweep runs, so a
    sweep-baseline would let a genuine plan regression adjudicate to
    "not reproduced" when this round's isolated remeasure is compared
    against it. Preferring the isolated number keeps flagged queries on
    an isolated-vs-isolated comparison from one round to the next; the
    returned set names the baselines that are isolated so the regression
    table can annotate them."""
    import glob
    import re

    prev: dict[str, float] = {}
    prev_rnd = 0
    partial_prev = False
    iso_baselines: set[str] = set()
    for p in glob.glob(os.path.join(base, "bench_r*_full.json")):
        m = re.search(r"r(\d+)", os.path.basename(p))
        if not m or int(m.group(1)) >= rnd:
            continue
        if int(m.group(1)) > prev_rnd:
            # Parse into locals FIRST and commit all three together only
            # once everything converts cleanly (r9 ADVICE): a bad
            # flag_remeasure value must not leave `prev` pointing at the
            # newer record while prev_rnd/iso_baselines keep older state.
            try:
                with open(p) as f:
                    rec = json.load(f)
                cand = dict(rec.get("queries", {}))
                # r10: records carry an explicit `baseline_overlay` — the
                # subset of flag_remeasure that should seed next round's
                # baseline (iso-baseline queries whose remeasure adjudicated
                # CLEAN are excluded so an inherent sweep-vs-isolated gap
                # stops re-flagging every round, r9 ADVICE). Older records
                # fall back to the full flag_remeasure.
                iso_src = rec.get("baseline_overlay")
                if iso_src is None:
                    iso_src = rec.get("flag_remeasure") or {}
                iso = {
                    q: float(v) for q, v in iso_src.items() if q in cand
                }
                cand.update(iso)
            except (OSError, ValueError, TypeError):
                continue
            prev, iso_baselines, prev_rnd = cand, set(iso), int(m.group(1))
    if not prev:
        # bootstrap: the driver's BENCH_r*.json keeps only a 2000-char
        # stdout tail — salvage the per-query timings visible in the
        # newest one so the first full-record round still gets a
        # (partial, alphabetical-tail-only) comparison
        for p in glob.glob(os.path.join(base, "BENCH_r*.json")):
            m = re.search(r"r(\d+)", os.path.basename(p))
            if not m or int(m.group(1)) >= rnd or int(m.group(1)) <= prev_rnd:
                continue
            try:
                with open(p) as f:
                    tail = json.load(f).get("tail", "")
            except (OSError, ValueError):
                continue
            # drop the first match: the tail may cut a name mid-string
            # ("lineitem_quantiles_approx" → "e_quantiles_approx")
            got = {
                q: float(v)
                for q, v in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', tail)[1:]
                if q not in ("value", "sf")
            }
            if got:
                prev, prev_rnd, partial_prev = got, int(m.group(1)), True
    return prev, prev_rnd, partial_prev, iso_baselines


def _is_flagged(prev_s: float, now_s: float) -> bool:
    """The ONE flag rule (>2x slower AND >+0.3 s) — shared by the sweep
    flagging and the isolated-remeasure verdict so they can't drift."""
    return now_s > 2 * prev_s and now_s - prev_s > 0.3


def _flags(
    timings: dict[str, float], prev: dict[str, float]
) -> list[tuple[str, float, float]]:
    """(name, prev_s, now_s) for every query the flag rule trips on."""
    return [
        (n, prev[n], t)
        for n, t in sorted(timings.items())
        if n in prev and _is_flagged(prev[n], t)
    ]


def _write_full_and_regressions(
    base: str,
    rnd: int,
    record: dict,
    timings: dict[str, float],
    prev: dict[str, float],
    prev_rnd: int,
    partial_prev: bool,
    iso_baselines: set[str] | None = None,
) -> None:
    """Persist the untruncated per-query record and diff it against the
    previous round's timings (>2x AND >+0.3s == flag); flagged queries
    carry their isolated re-measure so the record self-adjudicates."""
    with open(os.path.join(base, f"bench_r{rnd:02d}_full.json"), "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)

    remeasure: dict[str, float] = record.get("flag_remeasure", {})
    lines = [
        f"# Bench regression check — round {rnd} vs round {prev_rnd or '–'}",
        "",
        f"Scale: sf={record['sf']}, best-of-{record['config']['runs']} per"
        f" query, {len(timings)} queries, total {record['value']} s"
        f" (prev total {round(sum(prev.values()), 3) if prev else 'n/a'} s).",
        "",
        "Flag rule: current > 2x previous AND current - previous > 0.3 s"
        " (mirrors the judge's threshold). Every flagged query was"
        " RE-MEASURED IN ISOLATION at the end of the run (cache cleared,"
        " JVM GC'd, best-of-N again, no other query in flight) — the"
        " remeasure column is the adjudicated number: a flag whose"
        " remeasure is back near the previous timing was in-sweep noise"
        " (GC/codegen-cache neighborhood), not a plan regression.",
        "",
        "Baseline asymmetry (r8 ADVICE): isolated runs are systematically"
        " faster than in-sweep runs, so for queries the PREVIOUS round"
        " flagged, the previous round's isolated remeasure (marked `*` in"
        " the prev column) replaces its sweep timing as the baseline —"
        " flagged queries stay on an isolated-vs-isolated comparison."
        " Where the baseline is still a sweep timing, a 'not reproduced'"
        " verdict is evidence of noise, not proof: the isolated number"
        " carries no sweep-neighborhood overhead and can sit below a"
        " regressed-but-noisy baseline.",
        "",
    ]
    if not prev:
        lines.append("No previous full record — baseline round for this table.")
    else:
        if partial_prev:
            lines.append(
                f"(Previous round r{prev_rnd} timings recovered from the"
                " truncated driver tail — only its last ~74 alphabetical"
                " queries are comparable this once.)"
            )
            lines.append("")
        flagged = _flags(timings, prev)
        if flagged:
            # a flag on a query queued for driver re-verification is an
            # INTENTIONAL code change, not a discovered regression — say so
            force = getattr(entrymod, "_FORCE_RECHECK", set())
            lines += [
                "| query | prev s | sweep s | ratio | remeasure s | verdict |",
                "|---|---|---|---|---|---|",
            ]
            iso = iso_baselines or set()
            for n, p, t in flagged:
                rm = remeasure.get(n)
                prev_s = f"{p:.3f}*" if n in iso else f"{p:.3f}"
                if rm is None:
                    verdict = "no remeasure"
                    rm_s = "—"
                else:
                    rm_s = f"{rm:.3f}"
                    if _is_flagged(p, rm):
                        verdict = "REGRESSION"
                    elif n in iso:
                        # like-with-like: both numbers are isolated timings
                        # and the remeasure sits at the baseline — the sweep
                        # trip is the query's inherent sweep-vs-isolated
                        # gap, not a regression, so it is NOT a flag (r9
                        # ADVICE: iso-baseline queries flag on the
                        # remeasure comparison only)
                        verdict = (
                            "not flagged — expected sweep-vs-isolated gap"
                            " (isolated remeasure at baseline)"
                        )
                    else:
                        verdict = (
                            "not reproduced (vs SWEEP baseline — isolated"
                            " runs are systematically faster; noise is the"
                            " likely but not proven explanation)"
                        )
                    if verdict == "REGRESSION" and n in force:
                        # the force-recheck set also holds oracle-only
                        # changes, so keep the REGRESSION signal and note
                        # the queued re-verification rather than hiding it
                        verdict = (
                            "REGRESSION — code/oracle changed this round"
                            " (force-recheck queued; see SURVEY for"
                            " whether the plan change is intentional)"
                        )
                lines.append(
                    f"| {n} | {prev_s} | {t:.3f} | {t / p:.2f}x |"
                    f" {rm_s} | {verdict} |"
                )
        else:
            lines.append(
                f"**No regressions** across the {sum(1 for n in timings if n in prev)}"
                " queries present in both rounds."
            )
        if partial_prev:
            lines += [
                "",
                f"{len(set(timings) - set(prev))} queries fell outside the"
                " recovered tail and have no previous timing; the full"
                " record written this round makes every query comparable"
                " from the next round on.",
            ]
        else:
            new_q = sorted(set(timings) - set(prev))
            if new_q:
                lines += ["", f"New queries this round: {', '.join(new_q)}"]
    with open(os.path.join(base, "BENCH_REGRESSIONS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _compact_summary(
    record: dict,
    flagged: list[tuple[str, float, float]],
    remeasure: dict[str, float],
    ambient: list[str],
    rnd: int,
) -> dict:
    """The LAST-stdout-line summary: compact standalone JSON (<2000 chars
    serialized) sized to survive the driver's 2000-char stdout-tail capture
    (r9 verdict — the full record line always truncates to parsed: null).
    Regressions = adjudicated verdicts (isolated remeasure still above the
    flag rule), not raw sweep trips; top-3 by remeasure-vs-baseline ratio."""
    regressions = sorted(
        (
            (n, p, remeasure[n])
            for n, p, _t in flagged
            if n in remeasure and _is_flagged(p, remeasure[n])
        ),
        key=lambda x: x[2] / x[1],
        reverse=True,
    )
    return {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "sf": record["sf"],
        "n_queries": len(record.get("queries", {})),
        "runs": record["config"]["runs"],
        "flag_candidates": len(flagged),
        "regressions": len(regressions),
        "top_regressions": [
            {"query": n, "prev_s": p, "isolated_s": rm}
            for n, p, rm in regressions[:3]
        ],
        "ambient": len(ambient),
        "ambient_foreign": sum(1 for a in ambient if "foreign" in a),
        "full_record": f"bench_r{rnd:02d}_full.json",
    }


def _quiesce_check() -> list[str]:
    """Scan /proc for OTHER live JVM / Spark-Python processes at bench
    start. Ambient load is the #1 source of spurious per-query flags
    (two rounds of judge adjudication confirmed it), so the committed
    record carries the evidence: an empty list means the box was quiet;
    a non-empty one means the numbers may be inflated.

    Only the pid and the load class that matched are recorded — never
    the command line or executable name: cmdlines of unrelated
    processes (a CI wrapper, an editor helper) can embed arbitrary
    environment/tooling detail that has no place in a committed
    artifact, and the load evidence needs only count + kind.

    Each entry also carries an ``own-tree``/``foreign`` marker derived
    from the ppid chain (r9 verdict): a matched process whose ancestor
    chain (including itself) passes through this process's own ancestor
    chain is the harness's wrapper/supervisor stack — expected, idle,
    and not competing load — while ``foreign`` means a process tree this
    run did not inherit (a genuinely concurrent job). This keeps the
    "quiet box" claim verifiable without recording cmdlines."""

    def _ppid_chain(pid: int) -> list[int]:
        """pid plus its ancestors up to (excluding) pid 1 / a read error."""
        chain, cur, hops = [pid], pid, 0
        while cur > 1 and hops < 64:
            try:
                with open(f"/proc/{cur}/stat") as f:
                    stat = f.read()
                # field 4 (ppid) sits after the parenthesised comm, which
                # may itself contain spaces — split after the LAST ')'
                cur = int(stat.rsplit(")", 1)[1].split()[1])
            except (OSError, ValueError, IndexError):
                break
            hops += 1
            if cur > 1:
                chain.append(cur)
        return chain

    me = os.getpid()
    # everything above me except init: intersecting this = same tree
    my_ancestry = set(_ppid_chain(me))
    others: list[str] = []
    try:
        pids = [p for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        return []
    for pid in pids:
        if int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        low = cmd.lower()
        if "java" in low:
            kind = "jvm"
        elif "pyspark" in low or (
            "python" in low and ("spark" in low or "bench" in low)
        ):
            kind = "spark-python"
        else:
            continue
        own = bool(set(_ppid_chain(int(pid))) & my_ancestry)
        others.append(
            f"pid {pid}: ({kind}, {'own-tree' if own else 'foreign'})"
        )
    return others


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    ambient = _quiesce_check()
    if ambient:
        print(
            f"WARNING: {len(ambient)} other JVM/Spark processes alive at "
            "bench start — timings may carry ambient load:\n  "
            + "\n  ".join(ambient),
            file=sys.stderr,
        )
    # 99 back-to-back queries on an 8g heap spend measurable time in GC by the
    # back half of the run (balance_recon: 2.5s in-sequence vs 0.75s alone);
    # the bench box has 128 GiB, so give the single local JVM a real heap.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up: absorb one-time JVM/codegen/Arrow/parquet-footer/Python-runner
    # init so per-query timings measure the plans, not session startup.
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    _wu = pandas_udf(lambda v: v * 1.0, "double")

    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    warm = spark.range(100).select(
        F.col("id"), _wu(F.col("id").cast("double")).alias("x")
    )
    warm.mapInPandas(lambda it: it, schema="id long, x double").write.format(
        "noop"
    ).mode("overwrite").save()
    # best-of-N (default 2): report the plan's cost, not ambient host noise.
    # best-of-N CONSECUTIVE runs per query: run 2 executes with run 1's
    # JIT/codegen state hot, so min() reports the plan's warm cost.
    # (An interleaved-rounds variant was measured WORSE — by round 2 the
    # JIT caches of early queries have been churned through 100+ other
    # plans, so neither round is warm.)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    run1s: dict[str, float] = {}
    total = 0.0
    # NAME order, not registry order: the registry rotates per round (the
    # correctness-window ordering), and a changing run order changes each
    # query's GC/codegen-cache neighborhood — measured ±2× swings on
    # latency-bound queries. Sorted order keeps round-over-round timings
    # comparable.
    for name, fn in sorted(entrymod.queries().items()):
        best = float("inf")
        first = 0.0
        for i in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt_i = time.perf_counter() - t0
            if i == 0:
                first = dt_i
            best = min(best, dt_i)
        dt = round(best, 3)
        timings[name] = dt
        # run-1 (cold) recorded alongside best-of-N (r12 verdict): for
        # queries whose first run builds a session-memoized kernel (kNN
        # graph, IVF, LSH, LPA), best-of-N reports the memo-warm cost —
        # run1 keeps the cold build visible in the committed record.
        # `value`/`queries` stay best-of-N so round-over-round totals
        # remain comparable.
        run1s[name] = round(first, 3)
        total += dt
        # operators persist() intermediates (LSH blocks, shingle indexes);
        # drop them between queries so accumulated caches don't build
        # executor-memory pressure that taxes later queries
        spark.catalog.clearCache()
        if os.environ.get("SPARK_GRAFT_BENCH_GC", "") == "1":
            # ask the JVM for a collection between queries so one query's
            # garbage isn't paid as GC pause inside the next timed region
            spark.sparkContext._jvm.System.gc()
    # In-record adjudication: re-measure every flagged query IN ISOLATION
    # (cache cleared, JVM GC'd and settled, best-of-N again with nothing
    # else in flight). Two judged rounds showed the >2x flags were in-sweep
    # ambient noise that vanished on isolated retiming — putting the
    # retiming inside the same run makes the committed record carry both
    # numbers instead of needing post-hoc prose.
    base = os.path.dirname(os.path.abspath(__file__))
    rnd = _current_round(base)
    prev, prev_rnd, partial_prev, iso_baselines = _load_prev(base, rnd)
    remeasure: dict[str, float] = {}
    flagged = _flags(timings, prev)
    qmap = entrymod.queries() if flagged else {}
    for name, _, _ in flagged:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)  # let the GC + finalizers settle before timing
        fn = qmap[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        remeasure[name] = round(best, 3)
    # Baseline overlay for NEXT round (r9 ADVICE): a first-time flag
    # (sweep baseline) carries its isolated remeasure forward so a true
    # regression can't hide behind a sweep-inflated baseline (r8 ADVICE);
    # an iso-baseline query whose remeasure adjudicated CLEAN reverts to
    # its sweep timing — otherwise a query with an inherent >2x
    # sweep-vs-isolated gap would re-flag and re-measure every round
    # forever. REGRESSION verdicts stay on isolated-vs-isolated.
    overlay: dict[str, float] = {}
    for name, p, _t in flagged:
        rm = remeasure.get(name)
        if rm is None:
            continue
        if name not in iso_baselines or _is_flagged(p, rm):
            overlay[name] = rm
    record = {
        "metric": "engine_total_query_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        # per-query run-1 (cold) timings: makes memo cold-builds visible
        # (best-of-N alone hides the first consumer's kernel build cost)
        "queries_run1": run1s,
        # isolated retimings of the >2x-flagged queries (see loop above):
        # the self-adjudicated number the regression table's verdict uses
        "flag_remeasure": remeasure,
        # subset of flag_remeasure that seeds next round's baseline
        "baseline_overlay": overlay,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "config": {
            "runs": runs,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", ""),
            "sf_dir": sf_dir,
            "n_queries": len(timings),
            # [] == quiet box at start; non-empty == ambient load evidence
            "ambient_processes_at_start": ambient,
        },
    }
    try:
        _write_full_and_regressions(
            base, rnd, record, timings, prev, prev_rnd, partial_prev,
            iso_baselines,
        )
    except OSError:
        pass  # read-only checkout: stdout record still carries the result
    print(
        json.dumps(
            {k: record[k] for k in ("metric", "value", "unit", "queries", "sf")}
        )
    )
    # LAST stdout line: compact standalone JSON — see _compact_summary.
    print(json.dumps(_compact_summary(record, flagged, remeasure, ambient, rnd)))


if __name__ == "__main__":
    main()
