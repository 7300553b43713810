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
