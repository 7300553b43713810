"""Tests for the sharded Misra-Gries summary: the pure merge kernel, the
batch twin == single-batch streaming parity, and the checkpointed
streaming guarantee across runs."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from cdc_stream_processor_spark.operators import frequency as FR
from cdc_stream_processor_spark.streaming import sketch as SK
from cdc_stream_processor_spark.streaming import pipelines as SP


@pytest.fixture()
def tmpdirs(tmp_path):
    return str(tmp_path)


def _shard(key: str, n: int = FR.MG_SUMMARY_SHARDS) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n


# --- merge kernel -------------------------------------------------------------


def test_mg_merge_hand_computed():
    # combined: a5 b3 c2 d1, k=2 -> t = vals[2] = 2 -> keep a3 b1
    cur, t = SK.mg_merge({"a": 3, "b": 3}, {"a": 2, "c": 2, "d": 1}, k=2)
    assert t == 2 and cur == {"a": 3, "b": 1}
    # no trim when <= k keys
    cur, t = SK.mg_merge({}, {"x": 4, "y": 1}, k=2)
    assert t == 0 and cur == {"x": 4, "y": 1}
    # boundary ties all drop (value-deterministic membership)
    cur, t = SK.mg_merge({}, {"a": 2, "b": 2, "c": 2}, k=2)
    assert t == 2 and cur == {}


def test_mg_merge_error_bound_invariant():
    """Folding random batches: est undercounts by at most the summed
    trims, and absent keys have true count <= summed trims."""
    import random

    rnd = random.Random(7)
    true: dict[str, int] = {}
    cur: dict[str, int] = {}
    trims = 0
    for _ in range(30):
        batch: dict[str, int] = {}
        for _ in range(rnd.randint(1, 40)):
            key = f"k{rnd.randint(0, 15)}"
            batch[key] = batch.get(key, 0) + 1
            true[key] = true.get(key, 0) + 1
        cur, t = SK.mg_merge(cur, batch, k=4)
        trims += t
    for key, c in true.items():
        est = cur.get(key, 0)
        assert 0 <= c - est <= trims, (key, c, est, trims)


# --- batch twin parity --------------------------------------------------------


def test_stream_kernel_equals_batch_twin_on_one_batch(spark):
    rows = [("hot",)] * 30 + [(f"u{i}",) for i in range(40)] * 2
    df = spark.createDataFrame(rows, "key string")
    batch = {
        (r.shard, r.key): (r.est_count, r.n_shard, r.err_bound)
        for r in FR.misra_gries_summary(df, key_col="key").collect()
    }
    sk_rows = SK.misra_gries_stream(df, key_col="key").collect()
    streamed = {
        (r.shard, r.key): (r.est_count, r.n_shard, r.err_bound)
        for r in sk_rows
        if r.key is not None
    }
    assert batch and streamed == batch
    # one null-key sentinel per shard carries (n_shard, err_bound)
    sentinels = [r for r in sk_rows if r.key is None]
    assert len(sentinels) == len({r.shard for r in sk_rows})


# --- checkpointed streaming guarantee -----------------------------------------


def test_mg_stream_guarantee_across_checkpointed_runs(spark, tmpdirs):
    """Two availableNow runs with maxFilesPerTrigger=1 (so trims fire on
    real multi-batch merges): the final per-shard snapshot (max emit_seq)
    must satisfy the MG bound against the exact counts of ALL rows from
    both runs — proving both the sketch math and checkpoint recovery."""
    src = f"{tmpdirs}/mg_src"
    ckpt = f"{tmpdirs}/mg_ckpt"
    out_dir = f"{tmpdirs}/mg_out"

    def run():
        stream = spark.readStream.schema("key string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = SP.start_pipeline(
            SK.misra_gries_stream(stream, key_col="key", k=3),
            "mg_sink", ckpt, output_mode="append",
            sink_format="parquet", sink_options={"path": out_dir},
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    all_rows: list[str] = []

    def write_file(keys: list[str]):
        all_rows.extend(keys)
        spark.createDataFrame(
            [(k,) for k in keys], "key string"
        ).coalesce(1).write.mode("append").parquet(src)

    # run 1: two files -> two micro-batches per shard
    write_file(["hot"] * 20 + [f"a{i}" for i in range(12)])
    write_file(["hot"] * 15 + ["warm"] * 8 + [f"b{i}" for i in range(12)])
    run()

    # run 2 (fresh query, same checkpoint): state must carry over
    write_file(["hot"] * 10 + ["warm"] * 9 + [f"c{i}" for i in range(12)])
    sink = run().collect()

    # final snapshot per shard = rows at that shard's max emit_seq; the
    # null-key sentinel guarantees every shard's newest (n_shard, bound)
    # is in the sink even when a trim emptied the summary
    latest_seq: dict[int, int] = {}
    for r in sink:
        latest_seq[r.shard] = max(latest_seq.get(r.shard, 0), r.emit_seq)
    latest = [r for r in sink if r.emit_seq == latest_seq[r.shard]]
    snap = {(r.shard, r.key): r for r in latest if r.key is not None}
    meta = {r.shard: r for r in latest if r.key is None}
    assert set(meta) == {0, 1, 2, 3}  # every shard has a final sentinel

    truth = pd.Series(all_rows).value_counts()
    true_by_shard: dict[int, int] = {}
    for key, c in truth.items():
        true_by_shard[_shard(key)] = true_by_shard.get(_shard(key), 0) + int(c)

    bounds = {s: r.err_bound for s, r in meta.items()}
    for key, c in truth.items():
        s = _shard(key)
        est = snap[(s, key)].est_count if (s, key) in snap else 0
        assert 0 <= c - est <= bounds.get(s, 0), (key, c, est, bounds)
    # n_shard reflects BOTH runs' rows (checkpoint recovery, no recount)
    for s, r in meta.items():
        assert r.n_shard == true_by_shard[s]
    # the heavy key must be present in its shard's summary
    assert (_shard("hot"), "hot") in snap


# --- count-min sketch ---------------------------------------------------------


def test_cms_exact_when_no_collisions(spark):
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "key string")
    out = {
        r.term: r
        for r in FR.cms_point_estimates(df, ["a", "b", "c", "nope"]).collect()
    }
    # width 1024, 3 keys: collisions effectively impossible per row salt
    assert (out["a"].est_count, out["a"].true_count) == (5, 5)
    assert (out["b"].est_count, out["b"].true_count) == (3, 3)
    assert (out["c"].est_count, out["c"].true_count) == (1, 1)
    assert out["nope"].true_count == 0 and out["nope"].est_count >= 0
    assert all(r.overestimate == r.est_count - r.true_count for r in out.values())


def test_cms_one_sided_error_under_forced_collisions(spark):
    """width=2 forces heavy collisions: the CMS estimate must NEVER
    undercount (one-sided error), for present and absent probes alike."""
    import collections

    keys = [f"k{i % 7}" for i in range(200)]
    true = collections.Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    probes = [f"k{i}" for i in range(9)]  # k7, k8 absent
    out = FR.cms_point_estimates(df, probes, width=2).collect()
    assert len(out) == 9
    for r in out:
        assert r.est_count >= true.get(r.term, 0), r
        assert r.true_count == true.get(r.term, 0)


def test_cms_cells_merge_by_addition(spark):
    """Sketch of A+B equals cell-wise sum of sketch(A) and sketch(B) —
    the mergeable-summary property that makes CMS shard/day-combinable."""
    a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, "key string")
    b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 3, "key string")
    both = a.union(b)
    cells = lambda df: {
        (r.row, r.col): r.c for r in FR.cms_build(df).collect()
    }
    ca, cb, cab = cells(a), cells(b), cells(both)
    merged = dict(ca)
    for k, v in cb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cab


def test_cms_stream_parity_and_checkpoint_recovery(spark, tmpdirs):
    """Streaming CMS (running agg in update mode): after draining all
    files the latest cell values equal the batch sketch of every row
    seen so far — including across a checkpointed restart."""
    src = f"{tmpdirs}/cms_src"
    ckpt = f"{tmpdirs}/cms_ckpt"

    def run(name):
        stream = spark.readStream.schema("key string").parquet(src)
        q = SP.start_pipeline(
            SK.cms_stream(stream, key_col="key"),
            name, ckpt.replace("cms_ckpt", "cms_ckpt_fixed"),
            output_mode="update", sink_format="memory",
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        # memory sink in update mode appends changed rows per batch;
        # latest value per cell = the running counter
        rows = spark.sql(f"select * from {name}").collect()
        return rows

    all_keys = []

    def write_file(keys):
        all_keys.extend(keys)
        spark.createDataFrame(
            [(k,) for k in keys], "key string"
        ).coalesce(1).write.mode("append").parquet(src)

    write_file(["x"] * 4 + ["y"] * 2 + ["z"])
    rows1 = {(r.row, r.col): r.c for r in run("cms_m1")}
    batch1 = {
        (r.row, r.col): r.c
        for r in FR.cms_build(
            spark.createDataFrame([(k,) for k in all_keys], "key string")
        ).collect()
    }
    assert rows1 == batch1

    # second run, same checkpoint: counters must ACCUMULATE, not reset
    write_file(["x"] * 3 + ["w"] * 5)
    rows2_all = run("cms_m2")
    # take the latest emission: memory sink truncates per query name, but
    # update mode can emit a cell twice across batches - keep max (counts
    # are monotone)
    rows2: dict = {}
    for r in rows2_all:
        k = (r.row, r.col)
        rows2[k] = max(rows2.get(k, 0), r.c)
    batch2 = {
        (r.row, r.col): r.c
        for r in FR.cms_build(
            spark.createDataFrame([(k,) for k in all_keys], "key string")
        ).collect()
    }
    # run 2's sink only holds cells CHANGED in run 2; every one of those
    # must match the full batch sketch (proving state carried over)
    assert rows2 and all(batch2[k] == v for k, v in rows2.items())
    # the 'w' cells are new in run 2 and must be present
    import hashlib
    w_cells = {
        (i, int(hashlib.md5(f"{i}w".encode()).hexdigest()[:8], 16) % FR.CMS_WIDTH)
        for i in range(FR.CMS_DEPTH)
    }
    assert w_cells <= set(rows2)


# --- histogram quantile sketch -------------------------------------------------


def test_histogram_quantiles_hand_computed(spark):
    """n=10 values 100..1000 cents, bins=4 → width=(900 div 4)+1=226;
    bins carry counts [3,2,2,3] (cum 3,5,7,10). Targets: q50→rank 5 in
    bin1 → 100+226+((5-3-1)*226 div 2)=439; q90→rank 9 in bin3 →
    100+678+((9-7-1)*226 div 3)=853; q99→rank 10 in bin3 → 928."""
    from cdc_stream_processor_spark.operators import frequency as FR

    df = spark.createDataFrame(
        [(float(d),) for d in range(1, 11)], "o_totalprice double"
    )
    out = FR.histogram_quantiles(df, bins=4, qs=(50, 90, 99)).collect()
    got = [(r.q_pct, r.n_rows, r.bin, r.est_cents, r.bin_width_cents) for r in out]
    assert got == [
        (50, 10, 1, 439, 226),
        (90, 10, 3, 853, 226),
        (99, 10, 3, 928, 226),
    ]


def test_histogram_quantiles_error_bounded_by_width(spark):
    """The sketch estimate is within one bin width of the exact quantile
    (the advertised one-sided resolution bound)."""
    import random

    from cdc_stream_processor_spark.operators import frequency as FR

    rnd = random.Random(7)
    vals = [round(rnd.uniform(1, 500), 2) for _ in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "o_totalprice double")
    out = {r.q_pct: r for r in FR.histogram_quantiles(df).collect()}
    cents = sorted(int(v * 100) for v in vals)
    for q, r in out.items():
        exact = cents[max(0, -(-q * len(cents) // 100) - 1)]
        assert abs(r.est_cents - exact) <= r.bin_width_cents, (q, r, exact)


def test_histogram_stream_parity_and_checkpoint_accumulation(spark, tmpdirs):
    """Streaming fixed-grid histogram: latest bin counters equal the
    batch grouping of all rows seen so far, including across a
    checkpointed restart; quantiles from the snapshot reproduce the
    batch sketch's hand-computed estimates on the same grid."""
    src = f"{tmpdirs}/hist_src"
    ckpt = f"{tmpdirs}/hist_ckpt"

    def run(name):
        stream = spark.readStream.schema("cents long").parquet(src)
        q = SP.start_pipeline(
            SK.histogram_stream(stream, lo=100, width=226, bins=4),
            name, ckpt, output_mode="update", sink_format="memory",
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        latest: dict = {}
        for r in spark.sql(f"select * from {name}").collect():
            latest[r.bin] = max(latest.get(r.bin, 0), r.cnt)
        return latest

    spark.createDataFrame(
        [(c,) for c in range(100, 701, 100)], "cents long"
    ).coalesce(1).write.mode("append").parquet(src)
    assert run("hist_m1") == {0: 3, 1: 2, 2: 2}

    # restart on the same checkpoint: counters accumulate, out-of-range
    # values clamp into the edge bins
    spark.createDataFrame(
        [(800,), (900,), (1000,), (5,), (99999,)], "cents long"
    ).coalesce(1).write.mode("append").parquet(src)
    got = run("hist_m2")
    # run-2 sink holds only changed bins; all must match the full totals
    full = {0: 4, 1: 2, 2: 2, 3: 4}
    assert got and all(full[b] == c for b, c in got.items())
    assert 3 in got and 0 in got  # the new-value bins emitted

    # snapshot -> quantiles: values 100..1000 on grid (lo=100, w=226)
    # reproduce the batch sketch's hand-computed 439/853/928 estimates
    hist = spark.createDataFrame(
        [(0, 3), (1, 2), (2, 2), (3, 3)], "bin long, cnt long"
    )
    est = {
        r.q_pct: r.est_cents
        for r in FR.histogram_quantiles_from_bins(
            hist, lo=100, width=226, qs=(50, 90, 99)
        ).collect()
    }
    assert est == {50: 439, 90: 853, 99: 928}
