"""Composed-application integration tests: `python -m cdc_stream_processor_spark`
boots all five notification pipelines under the supervisor with a live
/healthz endpoint — the ABBankStreamsApp.java:37-89 analog, exercised
availableNow over file fixtures (TopologyTestDriver style, no broker).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import urllib.request

import pytest

from cdc_stream_processor_spark import cdc
from cdc_stream_processor_spark.streaming import pipelines as SP
from tests import fixtures as fx

US = 1_000_000
PIPELINES = {"fraud", "high_value", "balance", "dormancy", "daily_spend"}


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="sgs-app-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


DAY = 86_400
ALIGNED = 1_700_000_000 - (1_700_000_000 % DAY)


def _plant_fixture_envelopes(spark, src, tmp):
    """Three mtime-ordered single-file drops (FileStreamSource batches by
    (mtime, path); with maxFilesPerTrigger=1 each file is one micro-batch,
    so watermarks advance between them the way a live feed's would):

      a: 5x 600k debits for account 101 inside one minute (trips fraud
         velocity, high-value, daily-spend, balance recon) + one isolated
         txn for account 202 two hours in (a session of exactly 1);
      b: account 303 txn 31 days later — advances the watermark past the
         end of 202's 30-day dormancy session;
      c: account 404 txn 32 days later — the follow-up batch whose
         eviction pass emits 202's now-closed session (append-mode
         session aggregation emits one batch after the watermark moves).
    """
    import glob as globmod
    import os
    import shutil

    batches = [
        [
            fx.envelope(
                fx.txn_image(
                    txn_id=float(i),
                    amount=600_000.0,
                    initiated_at_us=(ALIGNED + i) * US,
                    balance_before=5_000_000.0 - 600_000.0 * i,
                    balance_after=5_000_000.0 - 600_000.0 * (i + 1),
                )
            )
            for i in range(5)
        ]
        + [
            fx.envelope(
                fx.txn_image(
                    txn_id=99.0,
                    account_id=202.0,
                    amount=1_000.0,
                    initiated_at_us=(ALIGNED + 7_200) * US,
                )
            )
        ],
        [
            fx.envelope(
                fx.txn_image(
                    txn_id=100.0,
                    account_id=303.0,
                    amount=1_000.0,
                    initiated_at_us=(ALIGNED + 31 * DAY) * US,
                )
            )
        ],
        [
            fx.envelope(
                fx.txn_image(
                    txn_id=101.0,
                    account_id=404.0,
                    amount=1_000.0,
                    initiated_at_us=(ALIGNED + 32 * DAY) * US,
                )
            )
        ],
    ]
    os.makedirs(src, exist_ok=True)
    for i, envs in enumerate(batches):
        stage = f"{tmp}/stage{i}"
        fx.make_txn_df(spark, envs).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        dst = f"{src}/{chr(ord('a') + i)}.parquet"
        shutil.copy(globmod.glob(f"{stage}/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)


def test_app_boots_five_pipelines_with_live_healthz(spark, tmpdirs):
    from cdc_stream_processor_spark.__main__ import AppConfig, build_app
    from cdc_stream_processor_spark.streaming.lifecycle import serve_health

    src, ckpt = f"{tmpdirs}/src", f"{tmpdirs}/ckpt"
    _plant_fixture_envelopes(spark, src, tmpdirs)
    envelopes = SP.read_file_envelopes(
        spark, src, source_options={"maxFilesPerTrigger": "1"}
    )
    accounts = cdc.parse_accounts(
        fx.make_account_df(spark, [fx.account_image(101.0, "ACC-101")])
    )
    cfg = AppConfig()  # application.conf defaults
    supervisor = build_app(
        spark, cfg, envelopes, accounts, ckpt,
        sink_format="memory", available_now=True,
    )
    supervisor.start_all()
    server, port, _ = serve_health(supervisor, port=0)
    try:
        supervisor.await_all(timeout_s=300.0)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as resp:
            assert resp.status == 200
            body = json.load(resp)
        assert body["status"] == "UP"
        assert set(body["queries"]) == PIPELINES
        # r8 verdict task 5: the health payload carries per-pipeline
        # lastProgress (rows/sec, batch duration, state rows) so an
        # operator can spot a stuck-but-alive pipeline from /healthz
        progress_fields = {
            "batch_id", "timestamp", "num_input_rows",
            "input_rows_per_second", "processed_rows_per_second",
            "batch_duration_ms", "state_rows_total",
        }
        for name in PIPELINES:
            prog = body["queries"][name]["progress"]
            assert prog is not None, f"{name}: no progress after drain"
            assert set(prog) == progress_fields
            assert prog["batch_id"] >= 0
            assert prog["num_input_rows"] >= 0
            assert prog["batch_duration_ms"] >= 0
        # the windowed/session aggregations hold state rows after the drain
        assert any(
            body["queries"][n]["progress"]["state_rows_total"] > 0
            for n in PIPELINES
        )
        counts = {n: spark.sql(f"select * from {n}").count() for n in PIPELINES}
        assert counts["high_value"] == 5   # every 600k debit alerts
        assert counts["fraud"] >= 1        # 5 debits in one 60s window
        assert counts["daily_spend"] >= 1  # 3M total >= 1M threshold
        assert counts["balance"] == 5      # one reconciliation per ledger txn
        assert counts["dormancy"] >= 1     # account 202's singleton session
    finally:
        server.shutdown()
        supervisor.stop_all()


def test_app_main_cli_runs_available_now(spark, tmpdirs):
    """The CLI path end-to-end: --envelopes + --accounts + --available-now
    drains the fixture feed through all five pipelines and exits 0."""
    from cdc_stream_processor_spark.__main__ import main

    src, acc, wd = f"{tmpdirs}/src2", f"{tmpdirs}/acc", f"{tmpdirs}/wd"
    _plant_fixture_envelopes(spark, src, tmpdirs)
    fx.make_account_df(
        spark, [fx.account_image(101.0, "ACC-101")]
    ).write.parquet(acc)
    rc = main(
        [
            "--envelopes", src,
            "--accounts", acc,
            "--workdir", wd,
            "--available-now",
            "--health-port", "0",
            "--max-files-per-trigger", "1",
        ],
        spark=spark,
    )
    assert rc == 0


def test_app_simulate_from_testdata(spark, tmpdirs, sf_dir):
    """The zero-infrastructure demo path: --simulate-from synthesizes the
    envelope feed from the testdata tables, drains it, and exits healthy."""
    from cdc_stream_processor_spark.__main__ import main

    rc = main(
        [
            "--simulate-from", sf_dir,
            "--workdir", f"{tmpdirs}/wd",
            "--available-now",
            "--health-port", "0",
        ],
        spark=spark,
    )
    assert rc == 0


def test_app_sigterm_triggers_graceful_shutdown(spark, tmpdirs):
    """A cluster manager stops the app with SIGTERM, not Ctrl-C (r10):
    the handler must route it through the same graceful stop path the
    reference's JVM shutdown hook provides (ABBankStreamsApp.java:71-75)
    — continuous mode exits 0 with queries stopped, and the process's
    original SIGTERM disposition is restored afterwards."""
    import signal
    import threading

    from cdc_stream_processor_spark.__main__ import main

    src, acc, wd = f"{tmpdirs}/src3", f"{tmpdirs}/acc3", f"{tmpdirs}/wd3"
    _plant_fixture_envelopes(spark, src, tmpdirs)
    fx.make_account_df(
        spark, [fx.account_image(101.0, "ACC-101")]
    ).write.parquet(acc)
    before = signal.getsignal(signal.SIGTERM)
    # fire after the pipelines have had time to boot; the handler installs
    # before start_all, so an early signal still takes the graceful path
    timer = threading.Timer(
        15.0, lambda: os.kill(os.getpid(), signal.SIGTERM)
    )
    timer.start()
    try:
        rc = main(
            [
                "--envelopes", src,
                "--accounts", acc,
                "--workdir", wd,
                "--health-port", "0",
                "--poll-seconds", "1",
                "--max-files-per-trigger", "1",
            ],
            spark=spark,
        )
    finally:
        timer.cancel()
    assert rc == 0  # graceful path, not a SIGTERM process kill (143)
    assert signal.getsignal(signal.SIGTERM) is before


def test_app_config_invalid_env_exits_with_message(monkeypatch, capsys):
    """r8 ADVICE: a non-numeric threshold env var must exit with a clear
    'invalid value for <VAR>' message, not a raw ValueError traceback."""
    from cdc_stream_processor_spark.__main__ import main

    monkeypatch.setenv("ABBANK_VELOCITY_MAX_TXN", "five")
    rc = main(["--available-now"])  # config parses before Spark/source setup
    assert rc == 2
    err = capsys.readouterr().err
    assert "invalid value for ABBANK_VELOCITY_MAX_TXN" in err
    assert "'five'" in err


def test_app_sink_defaults_bound_driver_memory():
    """r8 ADVICE: memory sink (unbounded driver growth) must only be the
    default for the bounded --available-now drain; continuous supervision
    defaults to console unless a sink is explicitly chosen."""
    from cdc_stream_processor_spark.__main__ import _resolve_sink

    assert _resolve_sink(None, available_now=True) == "memory"
    assert _resolve_sink(None, available_now=False) == "console"
    assert _resolve_sink("memory", available_now=False) == "memory"  # explicit
    assert _resolve_sink("kafka", available_now=True) == "kafka"


def test_app_config_env_overrides(monkeypatch):
    from cdc_stream_processor_spark.__main__ import AppConfig

    monkeypatch.setenv("ABBANK_HIGH_VALUE_THRESHOLD_NGN", "750000")
    monkeypatch.setenv("ABBANK_VELOCITY_MAX_TXN", "3")
    monkeypatch.setenv("ABBANK_DORMANCY_DAYS", "7")
    monkeypatch.setenv("HEALTH_PORT", "0")
    cfg = AppConfig.from_env()
    assert cfg.high_value_ngn == 750_000.0
    assert cfg.velocity_max_txns == 3
    assert cfg.dormancy_days == 7
    assert cfg.health_port == 0
    # unset vars keep application.conf defaults
    assert cfg.daily_spend_ngn == 1_000_000.0
    assert cfg.velocity_window_seconds == 60
