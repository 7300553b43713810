"""Bench-record self-adjudication (no Spark): the flag rule, the
isolated-remeasure verdict column, and the full-record round trip.

Why this exists: two judged rounds showed the committed bench record and
the driver's re-run disagreeing because ambient load on whichever box ran
last inflated a handful of queries >2x. The fix (r8) is in-record
adjudication — bench.py re-measures each flagged query in isolation and
writes both numbers — and these tests pin that machinery so a refactor
can't silently drop the remeasure column the adjudication relies on.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402


def test_flag_rule_needs_both_ratio_and_absolute():
    prev = {"a": 0.10, "b": 1.00, "c": 0.05, "d": 2.00}
    now = {
        "a": 0.25,  # 2.5x but +0.15 s only -> NOT flagged
        "b": 2.50,  # 2.5x and +1.5 s -> flagged
        "c": 0.50,  # 10x  and +0.45 s -> flagged
        "d": 2.90,  # +0.9 s but 1.45x only -> NOT flagged
        "e": 9.99,  # no previous timing -> NOT flagged
    }
    assert bench._flags(now, prev) == [
        ("b", 1.00, 2.50),
        ("c", 0.05, 0.50),
    ]


def test_regression_table_carries_remeasure_verdicts(tmp_path):
    base = str(tmp_path)
    prev_record = {
        "queries": {"q_noise": 0.5, "q_real": 0.5, "q_fine": 1.0},
        "sf": 0.1,
        "value": 2.0,
        "config": {"runs": 2},
    }
    with open(os.path.join(base, "bench_r07_full.json"), "w") as f:
        json.dump(prev_record, f)

    timings = {"q_noise": 2.0, "q_real": 2.0, "q_fine": 1.0}
    record = {
        "metric": "engine_total_query_time",
        "value": 5.0,
        "unit": "sec",
        "queries": timings,
        # q_noise retimes back to baseline (in-sweep noise); q_real stays
        # slow in isolation (a true plan regression)
        "flag_remeasure": {"q_noise": 0.55, "q_real": 1.9},
        "sf": 0.1,
        "config": {"runs": 2},
    }
    prev, prev_rnd, partial, iso = bench._load_prev(base, 8)
    assert (prev_rnd, partial, iso) == (7, False, set())
    bench._write_full_and_regressions(
        base, 8, record, timings, prev, prev_rnd, partial, iso
    )

    with open(os.path.join(base, "bench_r08_full.json")) as f:
        assert json.load(f)["flag_remeasure"]["q_noise"] == 0.55
    with open(os.path.join(base, "BENCH_REGRESSIONS.md")) as f:
        md = f.read()
    assert "| q_noise | 0.500 | 2.000 | 4.00x | 0.550 | not reproduced (vs SWEEP baseline" in md
    assert "| q_real | 0.500 | 2.000 | 4.00x | 1.900 | REGRESSION |" in md
    assert "q_fine" not in md  # unflagged queries stay out of the table


def test_force_recheck_flag_keeps_regression_signal_with_context(
    tmp_path, monkeypatch
):
    """A reproducing flag on a query already queued for driver
    re-verification keeps the REGRESSION signal (the queue also holds
    oracle-only changes, so suppressing it could hide a true perf
    regression) but carries the changed-this-round context."""
    import __spark_entry__ as entrymod

    base = str(tmp_path)
    with open(os.path.join(base, "bench_r07_full.json"), "w") as f:
        json.dump({"queries": {"q_changed": 0.5}}, f)
    timings = {"q_changed": 2.0}
    record = {
        "value": 2.0,
        "queries": timings,
        "flag_remeasure": {"q_changed": 1.9},
        "sf": 0.1,
        "config": {"runs": 2},
    }
    monkeypatch.setattr(
        entrymod, "_FORCE_RECHECK", {"q_changed": 8}, raising=True
    )
    prev, prev_rnd, partial, iso = bench._load_prev(base, 8)
    bench._write_full_and_regressions(
        base, 8, record, timings, prev, prev_rnd, partial, iso
    )
    with open(os.path.join(base, "BENCH_REGRESSIONS.md")) as f:
        md = f.read()
    assert "REGRESSION — code/oracle changed this round" in md
    assert "force-recheck queued" in md
    assert "| REGRESSION |" not in md  # bare verdict replaced by contextual one


def test_flagged_prev_query_uses_isolated_baseline(tmp_path):
    """r8 ADVICE: a query the PREVIOUS round flagged carries its isolated
    remeasure as this round's baseline (isolated runs are systematically
    faster than in-sweep runs), so a genuine plan regression can't hide
    behind a sweep-inflated baseline — and the table marks the isolated
    baseline with `*` and adjudicates isolated-vs-isolated."""
    base = str(tmp_path)
    prev_record = {
        # r7 sweep said 5.0 s but the adjudicated isolated number was 0.5:
        # the 0.5 must become the baseline, else a regression to 1.9 s
        # isolated would compare 1.9 < 2*5.0 and mask as 'not reproduced'
        "queries": {"q_hot": 5.0, "q_cool": 1.0},
        "flag_remeasure": {"q_hot": 0.5},
        "sf": 0.1,
        "value": 6.0,
        "config": {"runs": 2},
    }
    with open(os.path.join(base, "bench_r07_full.json"), "w") as f:
        json.dump(prev_record, f)

    prev, prev_rnd, partial, iso = bench._load_prev(base, 8)
    assert prev["q_hot"] == 0.5  # isolated overlay, not the 5.0 sweep
    assert prev["q_cool"] == 1.0
    assert iso == {"q_hot"}

    timings = {"q_hot": 2.0, "q_cool": 1.0}
    record = {
        "value": 3.0,
        "queries": timings,
        "flag_remeasure": {"q_hot": 1.9},  # still slow in isolation
        "sf": 0.1,
        "config": {"runs": 2},
    }
    bench._write_full_and_regressions(
        base, 8, record, timings, prev, prev_rnd, partial, iso
    )
    with open(os.path.join(base, "BENCH_REGRESSIONS.md")) as f:
        md = f.read()
    # vs the old sweep baseline this would have been masked; vs the
    # isolated baseline it correctly reads REGRESSION
    assert "| q_hot | 0.500* | 2.000 | 4.00x | 1.900 | REGRESSION |" in md


def test_quiesce_check_records_load_class_and_tree_only():
    """The ambient-load evidence is pid + load class + own-tree marker
    ONLY — never the command line or executable name: an unrelated
    wrapper process's cmdline can embed arbitrary environment detail
    that doesn't belong in a committed artifact (r9). The own-tree /
    foreign marker (r10, from the ppid chain) distinguishes the
    harness's own wrapper stack from a genuinely competing job so the
    "quiet box" claim stays verifiable without recording cmdlines.

    Foreign processes MAY legitimately exist while pytest runs — the
    driver's box hosts unrelated Spark work (r12 verdict: 34 foreign
    JVMs failed the old ``all own-tree`` assertion). The unit test
    therefore asserts only what is machine-independent: the entry
    format, and that any matched process in THIS test's own ancestor
    chain classifies own-tree. The quiet-box claim itself lives in the
    bench record's ``ambient_processes_at_start``, adjudicated per
    round — not here."""
    import re

    out = bench._quiesce_check()
    for entry in out:
        assert re.fullmatch(
            r"pid \d+: \((jvm|spark-python), (own-tree|foreign)\)", entry
        ), entry
    # walk this test's own ppid chain (same walk _quiesce_check uses)
    my_ancestry, cur, hops = {os.getpid()}, os.getpid(), 0
    while cur > 1 and hops < 64:
        try:
            with open(f"/proc/{cur}/stat") as f:
                cur = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, ValueError, IndexError):
            break
        hops += 1
        if cur > 1:
            my_ancestry.add(cur)
    # any matched jvm/spark process that IS one of our own ancestors
    # (a pytest wrapper, a supervising harness) must classify own-tree;
    # processes outside the chain are allowed either class — asserting
    # a globally quiet box made the test fail on any busy machine (r12)
    for entry in out:
        pid = int(re.match(r"pid (\d+):", entry).group(1))
        if pid in my_ancestry:
            assert "own-tree" in entry, entry


def test_compact_summary_is_driver_tail_sized():
    """bench.py's LAST stdout line must be standalone JSON under 2000
    chars (the driver keeps only a 2000-char stdout tail — every prior
    round's BENCH_r*.json ended up parsed: null, r9 verdict). Regressions
    reported = adjudicated (remeasure still trips the flag rule), capped
    at top-3 by ratio, so the size bound holds at any flag count."""
    record = {
        "metric": "engine_total_query_time",
        "value": 170.5,
        "unit": "sec",
        "queries": {f"q{i:03d}": 0.7 for i in range(243)},
        "sf": 0.1,
        "config": {"runs": 2},
    }
    # 40 candidates: worst ratios must win the top-3 cut; q_clean's
    # remeasure adjudicates clean so it is a candidate but not a regression
    flagged = [(f"f{i:02d}", 0.5, 2.0) for i in range(40)]
    remeasure = {f"f{i:02d}": 1.2 + 0.01 * i for i in range(40)}
    flagged.append(("q_clean", 0.5, 2.0))
    remeasure["q_clean"] = 0.52
    ambient = ["pid 1: (jvm, own-tree)", "pid 2: (jvm, foreign)"]
    out = bench._compact_summary(record, flagged, remeasure, ambient, 10)
    line = json.dumps(out)
    assert len(line) < 2000
    parsed = json.loads(line)
    assert parsed["n_queries"] == 243
    assert parsed["flag_candidates"] == 41
    assert parsed["regressions"] == 40  # q_clean adjudicated clean
    assert len(parsed["top_regressions"]) == 3
    assert parsed["top_regressions"][0]["query"] == "f39"  # worst ratio first
    assert parsed["ambient"] == 2 and parsed["ambient_foreign"] == 1
    assert parsed["full_record"] == "bench_r10_full.json"


def test_iso_baseline_clean_remeasure_is_not_a_flag(tmp_path):
    """r9 ADVICE: a query whose PREVIOUS-round baseline is already an
    isolated remeasure flags on the remeasure comparison only — a sweep
    trip whose isolated retiming sits at the isolated baseline is the
    query's inherent sweep-vs-isolated gap, not a regression, and must
    not read as one round after round."""
    base = str(tmp_path)
    with open(os.path.join(base, "bench_r09_full.json"), "w") as f:
        json.dump(
            {"queries": {"q_gap": 2.0}, "flag_remeasure": {"q_gap": 0.5}},
            f,
        )
    prev, prev_rnd, partial, iso = bench._load_prev(base, 10)
    assert prev["q_gap"] == 0.5 and iso == {"q_gap"}
    timings = {"q_gap": 1.4}  # steady sweep cost: 2.8x the isolated number
    record = {
        "value": 1.4,
        "queries": timings,
        "flag_remeasure": {"q_gap": 0.52},  # isolated: right at baseline
        "sf": 0.1,
        "config": {"runs": 2},
    }
    bench._write_full_and_regressions(
        base, 10, record, timings, prev, prev_rnd, partial, iso
    )
    with open(os.path.join(base, "BENCH_REGRESSIONS.md")) as f:
        md = f.read()
    assert "not flagged — expected sweep-vs-isolated gap" in md
    assert "| REGRESSION |" not in md and "REGRESSION —" not in md


def test_baseline_overlay_preferred_and_ends_reflag_cycle(tmp_path):
    """r10: _load_prev seeds the baseline from `baseline_overlay` when the
    record carries one (adjudicated-clean iso entries excluded, so the
    inherent gap stops re-flagging), falling back to the full
    flag_remeasure for pre-r10 records."""
    base = str(tmp_path)
    with open(os.path.join(base, "bench_r09_full.json"), "w") as f:
        json.dump(
            {
                "queries": {"q_gap": 1.4, "q_bad": 1.0},
                # both were remeasured, but only q_bad's remeasure still
                # tripped the rule — q_gap reverts to its sweep timing
                "flag_remeasure": {"q_gap": 0.5, "q_bad": 0.9},
                "baseline_overlay": {"q_bad": 0.9},
            },
            f,
        )
    prev, prev_rnd, partial, iso = bench._load_prev(base, 10)
    assert prev == {"q_gap": 1.4, "q_bad": 0.9}
    assert iso == {"q_bad"}
    # q_gap at its steady sweep cost no longer trips vs the sweep baseline
    assert bench._flags({"q_gap": 1.4}, prev) == []


def test_load_prev_skips_corrupt_newer_record_atomically(tmp_path):
    """r9 ADVICE: a newer full record whose flag_remeasure fails float()
    must not leave `prev` reassigned while prev_rnd/iso keep older state —
    the corrupt record is skipped whole and the older round stays the
    consistent baseline."""
    base = str(tmp_path)
    with open(os.path.join(base, "bench_r08_full.json"), "w") as f:
        json.dump({"queries": {"q": 1.0}, "flag_remeasure": {"q": 0.4}}, f)
    with open(os.path.join(base, "bench_r09_full.json"), "w") as f:
        json.dump(
            {"queries": {"q": 9.9}, "flag_remeasure": {"q": "not-a-number"}},
            f,
        )
    prev, prev_rnd, partial, iso = bench._load_prev(base, 10)
    assert prev_rnd == 8  # corrupt r9 skipped whole
    assert prev == {"q": 0.4} and iso == {"q"}


def test_no_flags_writes_no_regressions_line(tmp_path):
    base = str(tmp_path)
    with open(os.path.join(base, "bench_r07_full.json"), "w") as f:
        json.dump({"queries": {"q": 1.0}}, f)
    timings = {"q": 1.1}
    record = {
        "value": 1.1,
        "queries": timings,
        "flag_remeasure": {},
        "sf": 0.1,
        "config": {"runs": 2},
    }
    prev, prev_rnd, partial, iso = bench._load_prev(base, 8)
    bench._write_full_and_regressions(
        base, 8, record, timings, prev, prev_rnd, partial, iso
    )
    with open(os.path.join(base, "BENCH_REGRESSIONS.md")) as f:
        assert "No regressions" in f.read()
