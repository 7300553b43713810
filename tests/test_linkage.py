"""Planted-case tests for the entity-resolution family
(``operators/linkage.py``)."""

from __future__ import annotations

from cdc_stream_processor_spark.operators import linkage as L

SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)


def test_er_match_pairs_hand_computed(spark):
    rows = [
        # block (1, AUTO): 1-2 near-identical names + close balances -> match
        (1, "Customer#000000001", 1, 100.0, "AUTO"),
        (2, "Customer#000000002", 1, 300.0, "AUTO"),
        # 3: same block, name 4 edits from both, far balance -> possible/non
        (3, "Customer#000099992", 1, 5000.0, "AUTO"),
        # different block: never paired with 1-3
        (4, "Customer#000000001", 2, 100.0, "AUTO"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {(r.custkey_a, r.custkey_b): r for r in L.er_match_pairs(df, min_score=-99).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    p = out[(1, 2)]
    # lev=1 -> strong(+8); |100-300|<=500 -> +2; score 10 -> match
    assert (p.name_dist, p.bal_close, p.score, p.tier) == (1, True, 10, "match")
    q = out[(1, 3)]
    # lev('...000001','...099993')=5 -> miss(-2); |100-5000|>500 -> -1
    assert (q.name_dist, q.score, q.tier) == (5, -3, "non_match")
    r = out[(2, 3)]
    assert r.name_dist == 4 and r.score == L.W_NAME_WEAK + L.W_BAL_MISS
    assert r.tier == "non_match"  # 3-1=2 < TIER_POSSIBLE


def test_er_default_threshold_filters(spark):
    rows = [
        (1, "Customer#000000001", 1, 100.0, "AUTO"),
        (2, "Customer#000000002", 1, 300.0, "AUTO"),
        (3, "Customer#000099992", 1, 5000.0, "AUTO"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = L.er_match_pairs(df).collect()  # default min_score=TIER_POSSIBLE
    assert {(r.custkey_a, r.custkey_b) for r in out} == {(1, 2)}


def test_er_banded_levenshtein_boundary(spark):
    """r12 optimization: the filter computes a BANDED levenshtein
    (threshold = the largest admissible distance). Pin the band edges:
    distance exactly at the bound survives, one past the bound is
    dropped, and the projected name_dist on survivors is the exact
    (unbanded) distance."""
    rows = [
        # lev(base, d4) = 4 == NAME_WEAK_D: survives with bal_close
        (1, "aaaaaaaa", 1, 0.0, "AUTO"),
        (2, "aaaabbbb", 1, 0.0, "AUTO"),   # dist 4 from 1
        (3, "abbbbbaa", 1, 0.0, "AUTO"),   # dist 5 from 1 -> dropped
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r.custkey_a, r.custkey_b): r
        for r in L.er_match_pairs(df, min_score=L.TIER_POSSIBLE).collect()
    }
    assert (1, 2) in out and out[(1, 2)].name_dist == 4
    assert (1, 3) not in out
    # (2,3): lev('aaaabbbb','abbbbbaa') -- computed by the same engine
    # pre-change as 4 -> survives; sanity-check projection consistency
    for pair, r in out.items():
        assert 0 <= r.name_dist <= 4


def test_er_block_stats_pair_counts(spark):
    rows = [
        (i, f"Customer#{i:09d}", 1, 0.0, "AUTO") for i in range(5)
    ] + [(10, "Customer#000000010", 2, 0.0, "AUTO")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {(r.c_nationkey, r.c_mktsegment): r for r in L.er_block_stats(df).collect()}
    assert out[(1, "AUTO")].n_records == 5 and out[(1, "AUTO")].n_pairs == 10
    assert out[(2, "AUTO")].n_records == 1 and out[(2, "AUTO")].n_pairs == 0


def test_levenshtein_engine_parity(spark):
    """Spark's levenshtein must equal DuckDB's on the same inputs (the
    oracle depends on it)."""
    import duckdb
    from pyspark.sql import functions as F

    cases = [
        ("kitten", "sitting"),
        ("", "abc"),
        ("Customer#000000001", "Customer#000099992"),
        ("same", "same"),
    ]
    df = spark.createDataFrame(cases, "a string, b string")
    got = {
        (r.a, r.b): r.d
        for r in df.select("a", "b", F.levenshtein("a", "b").alias("d")).collect()
    }
    for a, b in cases:
        (exp,) = duckdb.sql(f"select levenshtein('{a}', '{b}')").fetchone()
        assert got[(a, b)] == exp, (a, b)
