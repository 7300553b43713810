"""Planning tools (no Spark): the rotation-window report that each round's
window-composition math is read from before any query surface changes."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

import rotation_report  # noqa: E402


def test_last_green_matches_rotation_rule():
    """The report's green rule must be the SAME rule the registry rotation
    uses (err-free + rows/schema match + hash true-or-null), else the
    window it prints is not the window the driver will check."""
    greens, newest = rotation_report.last_green_by_query()
    assert newest >= 9
    assert greens  # committed records exist
    import __spark_entry__ as entry

    names = list(entry.queries())
    # rotation order == ascending last-green (force-recheck demotions aside;
    # an entry demotes until a green from its change round or later lands)
    force = dict(entry._FORCE_RECHECK)
    ranks = [
        -1
        if greens.get(n, -1) < force.get(n, -(10**9))
        else greens.get(n, -1)
        for n in names
    ]
    assert ranks == sorted(ranks)


def test_report_prints_window_and_slack(capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["rotation_report.py", "--window", "50"])
    assert rotation_report.main() == 0
    out = capsys.readouterr().out
    assert "next driver window (50 slots):" in out
    assert "slack:" in out
    assert "backlog beyond the window" in out


def test_degenerate_stress_fixture_builds_and_loads(spark, tmp_path):
    """The stress tool's fixture must carry every driver table with the
    production schemas (load_table normalizes them) and the degenerate
    rows it advertises — empty/NULL texts and a ragged embedding."""
    import tools.degenerate_stress as DS
    from cdc_stream_processor_spark.sources.batch import TABLES, load_table

    DS.build_fixture(str(tmp_path), ragged_embeddings=True)
    for t in TABLES:
        assert load_table(spark, str(tmp_path), t).count() >= 2, t
    docs = load_table(spark, str(tmp_path), "documents")
    texts = [r.text for r in docs.collect()]
    assert "" in texts and None in texts
    emb = load_table(spark, str(tmp_path), "embeddings")
    sizes = {len(r.embedding) for r in emb.collect()}
    assert 0 in sizes and 4 in sizes  # ragged: the kernel-contract probe
    # the contract allowlist only names registered queries
    import __spark_entry__ as entrymod

    assert DS.RAGGED_CONTRACT <= set(entrymod.queries())


def test_unicode_stress_fixture_builds_and_loads(spark, tmp_path):
    """The --unicode stress fixture must carry every driver table (well-
    formed shapes), adversarial text rows (astral ZWJ emoji, zero-width
    chars, control chars incl. NUL, and the base64 mega-token), and
    fixed-dim embeddings (only the TEXT paths are under stress)."""
    import tools.degenerate_stress as DS
    from cdc_stream_processor_spark.sources.batch import TABLES, load_table

    DS.build_unicode_fixture(str(tmp_path))
    for t in TABLES:
        assert load_table(spark, str(tmp_path), t).count() >= 2, t
    texts = [
        r.text
        for r in load_table(spark, str(tmp_path), "documents").collect()
    ]
    assert any("‍" in t for t in texts)  # ZWJ
    assert any("\x00" in t for t in texts)  # NUL survives parquet+Spark
    assert any(
        max((len(w) for w in t.split()), default=0) >= 1000 for t in texts
    )  # the mega-token
    sizes = {
        len(r.embedding)
        for r in load_table(spark, str(tmp_path), "embeddings").collect()
    }
    assert sizes == {4}  # fixed-dim: text paths only


def test_typo_pairs_mega_token_bounded(spark, tmp_path):
    """Regression for the --unicode stress find: ONE pathological
    mega-token (base64 blob) must not explode the FastSS deletion
    neighborhood — the TYPO_MAX_TOKEN_LEN candidacy cap excludes it on
    both engine sides, the query completes, and typo pairs among normal
    words are still found."""
    import duckdb

    import __spark_entry__ as E
    import pyarrow as pa
    import pyarrow.parquet as pq

    blob = "QUJDREVGR0hJSktMTU5PUFFSU1RVVldYWVo0NTY3ODkrLw==" * 40
    rows = {
        "doc_id": [1, 2, 3],
        "text": [f"walked {blob} walker", "walked walked", "walker talked"],
        "lang": ["en"] * 3,
        "source": ["s1"] * 3,
        "n_chars": [len(blob) + 14, 13, 13],
    }
    pq.write_table(
        pa.table(
            rows,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string()),
                 ("n_chars", pa.int64())]
            ),
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = sorted(
        (r.tok_a, r.tok_b, r.dist, r.n_a, r.n_b)
        for r in E.queries()["typo_pairs"](spark, str(tmp_path)).collect()
    )
    assert all(len(a) <= 24 and len(b) <= 24 for a, b, *_ in got)
    assert ("talked", "walked", 1, 1, 3) in got or (
        "talked", "walked", 1, 3, 1) in got
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(con.sql(E.oracle_sql()["typo_pairs"]).fetchall())
    assert got == [tuple(w) for w in want]
