"""Semi-structured JSON processing over the events.props payload column."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_stream_processor_spark.queries_relational import q_json_props_rollup


def test_json_props_rollup_covers_all_events(spark, sf_dir):
    from cdc_stream_processor_spark.sources import batch as B

    out = q_json_props_rollup(spark, sf_dir).collect()
    total = sum(r.n_events for r in out)
    assert total == B.load_table(spark, sf_dir, "events").count()
    assert all(0 <= r.k_decile <= 9 for r in out)


def test_from_json_corrupt_input_yields_null_not_error(spark):
    """PERMISSIVE parse: malformed JSON and wrong-typed payloads become
    null, never an exception — a 100 TB scan can't die on one bad row."""
    rows = [
        (1, '{"k": 7}'),
        (2, "not json at all"),
        (3, '{"k": "NaN-ish"}'),
        (4, None),
        (5, '{"other": 1}'),
    ]
    df = spark.createDataFrame(rows, "id long, props string").select(
        "id", F.from_json("props", "k INT").getField("k").alias("k")
    )
    got = {r.id: r.k for r in df.collect()}
    assert got[1] == 7
    assert got[2] is None and got[3] is None and got[4] is None and got[5] is None


def test_jsonl_and_csv_sources_quarantine_corrupt_rows(spark, tmp_path):
    from cdc_stream_processor_spark.sources import files as FS

    jl = tmp_path / "docs.jsonl"
    jl.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "beta"}\n'
    )
    df = FS.read_jsonl(spark, str(jl), "doc_id long, text string")
    clean, bad = FS.split_corrupt(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    assert bad.count() == 1 and "NOT JSON" in bad.collect()[0][0]

    cv = tmp_path / "docs.csv"
    cv.write_text("doc_id,n\n1,10\n2,notanint\n3,30\n")
    cdf = FS.read_csv(spark, str(cv), "doc_id long, n long")
    cclean, cbad = FS.split_corrupt(cdf)
    assert {(r["doc_id"], r["n"]) for r in cclean.collect()} == {(1, 10), (3, 30)}
    assert cbad.count() == 1


def test_orc_source_roundtrip_with_pushdown(spark, tmp_path):
    """ORC source parity: roundtrip preserves values, and a filtered read
    pushes the predicate into the ORC scan."""
    from cdc_stream_processor_spark.sources import batch as B
    from cdc_stream_processor_spark.sources import files as FS

    ev = B.load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_orc")
    FS.write_orc(ev, path)
    back = FS.read_orc(spark, path)
    assert back.count() == ev.count()
    a = sorted(r.event_id for r in ev.select("event_id").collect())
    b = sorted(r.event_id for r in back.select("event_id").collect())
    assert a == b
    plan = (
        back.filter("event_id < 100")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "LessThan(event_id,100)" in plan


def test_jsonl_stream_ingest_routes_dlq_across_batches(spark, tmp_path):
    """Streaming file-source twin of read_jsonl: two landing drops, each
    with a corrupt line; foreachBatch splits clean/DLQ per micro-batch
    and a second availableNow run after the second drop picks up ONLY
    the new file (checkpointed file tracking — no reprocessing)."""
    from cdc_stream_processor_spark.sources import files as FS

    indir = tmp_path / "landing"
    indir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    clean_rows: list[tuple] = []
    dlq_rows: list[str] = []

    def sink(batch_df, _bid):
        clean, bad = FS.split_corrupt(batch_df)
        clean_rows.extend(
            (r["doc_id"], r["text"]) for r in clean.collect()
        )
        dlq_rows.extend(r[0] for r in bad.collect())

    def run_once():
        q = (
            FS.read_jsonl_stream(
                spark, str(indir), "doc_id long, text string"
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (indir / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha"}\nBROKEN-A\n'
    )
    run_once()
    assert clean_rows == [(1, "alpha")]
    assert dlq_rows == ["BROKEN-A"]

    (indir / "b.jsonl").write_text(
        '{"doc_id": 2, "text": "beta"}\nBROKEN-B\n'
    )
    run_once()
    assert sorted(clean_rows) == [(1, "alpha"), (2, "beta")]
    assert sorted(dlq_rows) == ["BROKEN-A", "BROKEN-B"]
