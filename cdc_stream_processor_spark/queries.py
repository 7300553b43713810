"""Driver-facing batch query registry.

Each entry pairs a Spark DataFrame query (spark, sf_dir) -> DataFrame with an
equivalent DuckDB oracle SQL string over the same parquet tables. The CDC
pipeline queries exercise the real envelope path (events → Debezium-style
envelopes → cdc.parse_transactions → pipeline); the oracle replays the same
deterministic arithmetic straight off the raw tables.

Column names are aliased identically on both sides (driver hash-matches by
sorted column name). Money aggregation runs over DECIMAL(18,4) on both sides
so sums are order-independent and exact, then casts back to double.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_stream_processor_spark import cdc
from cdc_stream_processor_spark.operators import pipelines as P
from cdc_stream_processor_spark.sources import batch as B
from cdc_stream_processor_spark.sources import cdc_sim

QueryFn = Callable[[SparkSession, str], DataFrame]

# Batch-twin parameters sized to the testdata distributions (events values
# are ~0.03-330; reference production defaults stay in operators.pipelines).
HV_THRESHOLD = 250.0
VELOCITY_WINDOW = "1 hour"
VELOCITY_MIN = 2
DAILY_THRESHOLD = 150.0
DORMANCY_GAP = "1 day"

_DEBITS_SQL = "('DEBIT','TRANSFER_OUT','FEE','LOAN_REPAYMENT')"

# Shared oracle CTE: the DuckDB mirror of transaction_envelopes_from_events
# followed by cdc.parse_transactions (drop op='d', account_id==0 sentinel).
TXNS_CTE = f"""
WITH txns AS (
  SELECT
    event_id                       AS transaction_id,
    user_id                        AS account_id,
    'REF-' || event_id             AS transaction_ref,
    {cdc_sim.TYPE_MAP_SQL}         AS transaction_type,
    ROUND(value, 4)                AS amount,
    'NGN'                          AS currency,
    UPPER(event_type)              AS channel,
    {cdc_sim.STATUS_SQL}           AS transaction_status,
    ts                             AS initiated_at,
    {cdc_sim.OP_SQL}               AS op
  FROM events
  WHERE event_id % 10 != 0 AND user_id != 0
)
"""


def _txns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = B.load_table(spark, sf_dir, "events")
    return cdc.parse_transactions(cdc_sim.transaction_envelopes_from_events(events))


def _accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = B.load_table(spark, sf_dir, "customer")
    return cdc.parse_accounts(cdc_sim.accounts_envelopes_from_customers(customer))


# --- CDC pipeline queries ----------------------------------------------------


def q_cdc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _txns(spark, sf_dir).select(
        "transaction_id",
        "account_id",
        "transaction_ref",
        "transaction_type",
        "amount",
        "currency",
        "channel",
        "transaction_status",
        "initiated_at",
        "op",
    )


SQL_CDC_PARSE = (
    TXNS_CTE
    + """
SELECT transaction_id, account_id, transaction_ref, transaction_type, amount,
       currency, channel, transaction_status, initiated_at, op
FROM txns
"""
)


def q_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.high_value_alerts(
        _txns(spark, sf_dir), _accounts(spark, sf_dir), threshold=HV_THRESHOLD
    )


SQL_HIGH_VALUE = (
    TXNS_CTE
    + f"""
SELECT t.account_id, t.transaction_id, t.transaction_ref, t.transaction_type,
       t.amount,
       CASE WHEN t.transaction_type IN {_DEBITS_SQL} THEN 'HIGH'
            ELSE 'MEDIUM' END AS severity,
       COALESCE(c.c_name, 'N/A') AS account_number,
       c.c_custkey AS customer_id,
       t.initiated_at AS event_time
FROM txns t LEFT JOIN customer c ON t.account_id = c.c_custkey
WHERE t.amount IS NOT NULL AND t.amount >= {HV_THRESHOLD}
"""
)


def q_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.transaction_velocity(
        _txns(spark, sf_dir), window=VELOCITY_WINDOW, max_txns=VELOCITY_MIN
    )


SQL_VELOCITY = (
    TXNS_CTE
    + f"""
SELECT account_id,
       time_bucket(INTERVAL '1 hour', initiated_at) AS window_start,
       time_bucket(INTERVAL '1 hour', initiated_at) + INTERVAL '1 hour'
         AS window_end,
       COUNT(*) AS txn_count
FROM txns
WHERE transaction_type IN {_DEBITS_SQL} AND transaction_status = 'COMPLETED'
GROUP BY 1, 2, 3
HAVING COUNT(*) >= {VELOCITY_MIN}
"""
)


def q_daily_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.daily_spend(_txns(spark, sf_dir), threshold=DAILY_THRESHOLD)


SQL_DAILY_SPEND = (
    TXNS_CTE
    + f"""
SELECT account_id,
       time_bucket(INTERVAL '1 day', initiated_at) AS window_start,
       CAST(SUM(CAST(COALESCE(amount, 0) AS DECIMAL(18,4))) AS DOUBLE)
         AS total_debit
FROM txns
WHERE transaction_type IN {_DEBITS_SQL} AND transaction_status = 'COMPLETED'
GROUP BY 1, 2
HAVING SUM(CAST(COALESCE(amount, 0) AS DECIMAL(18,4))) >= {DAILY_THRESHOLD}
"""
)


def q_dormancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.dormancy_candidates(_txns(spark, sf_dir), gap=DORMANCY_GAP)


# Session windows as gap-islands: break when the gap to the previous event is
# >= the inactivity gap (Spark session_window is [start, last+gap) —
# an event landing exactly at the boundary opens a new session).
SQL_DORMANCY = (
    TXNS_CTE
    + f"""
, d AS (
  SELECT account_id, initiated_at FROM txns
  WHERE transaction_type IN {_DEBITS_SQL} AND transaction_status = 'COMPLETED'
), m AS (
  SELECT account_id, initiated_at,
         CASE WHEN lag(initiated_at) OVER
                     (PARTITION BY account_id ORDER BY initiated_at) IS NULL
               OR initiated_at - lag(initiated_at) OVER
                     (PARTITION BY account_id ORDER BY initiated_at)
                  >= INTERVAL '{DORMANCY_GAP}'
              THEN 1 ELSE 0 END AS brk
  FROM d
), s AS (
  SELECT account_id, initiated_at,
         SUM(brk) OVER (PARTITION BY account_id ORDER BY initiated_at
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT account_id, MIN(initiated_at) AS session_start, COUNT(*) AS txn_count
FROM s GROUP BY account_id, sid HAVING COUNT(*) = 1
"""
)


def q_balance_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ledger = cdc_sim.with_synthetic_ledger(_txns(spark, sf_dir))
    return P.balance_reconciliation_batch(ledger)


SQL_BALANCE_RECON = (
    TXNS_CTE
    + """
, led AS (
  SELECT *,
    CAST(SUM(CAST(amount AS DECIMAL(18,4))) OVER w AS DOUBLE) AS balance_after,
    CAST(SUM(CAST(amount AS DECIMAL(18,4))) OVER w
         - CAST(amount AS DECIMAL(18,4)) AS DOUBLE)
      + CASE WHEN transaction_id % 13 = 5 THEN 7.5 ELSE 0.0 END
      AS balance_before
  FROM txns
  WINDOW w AS (PARTITION BY account_id ORDER BY initiated_at, transaction_id
               ROWS UNBOUNDED PRECEDING)
), eligible AS (
  SELECT * FROM led
  WHERE transaction_status = 'COMPLETED'
    AND balance_after IS NOT NULL AND balance_after >= 0
), recon AS (
  SELECT account_id, transaction_id, balance_before, balance_after,
    ROUND(ABS(balance_before - COALESCE(
      lag(balance_after) OVER (PARTITION BY account_id
                               ORDER BY initiated_at, transaction_id),
      balance_before)), 4) AS discrepancy
  FROM eligible
)
SELECT account_id, transaction_id, balance_before, balance_after, discrepancy,
       CASE WHEN discrepancy > 0.01 THEN 'HIGH' ELSE 'LOW' END AS severity
FROM recon
"""
)


# --- Notification rendering (M6 + F3 + C1/C2/C14) ----------------------------


def q_notifications_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full high-value notification text: severity routing, ₦-grouped
    amounts (C1), Africa/Lagos timestamp labels (C2), format_string body
    (C14) — the render layer of buildHighValueNotification
    (ABBankTopology.java:247-294), minus the uuid()/now() fields which are
    nondeterministic by design (covered by unit tests instead)."""
    from cdc_stream_processor_spark.functions import scalar as SC

    alerts = P.high_value_alerts(
        _txns(spark, sf_dir), _accounts(spark, sf_dir), threshold=HV_THRESHOLD
    )
    amount_label = SC.format_amount(F.col("amount"), F.lit("NGN"))
    time_label = SC.format_timestamp_lagos(F.col("event_time"))
    return alerts.select(
        "transaction_id",
        "account_id",
        "severity",
        F.lit("BOTH").alias("channel"),
        amount_label.alias("amount_label"),
        time_label.alias("event_time_label"),
        F.format_string(
            "High-value %s alert: %s", F.col("transaction_type"), amount_label
        ).alias("subject"),
        F.format_string(
            "A %s of %s was recorded on account %s at %s.",
            F.col("transaction_type"),
            amount_label,
            F.col("account_number"),
            time_label,
        ).alias("body"),
    )


# DuckDB lacks float thousands-grouping and (offline) ICU timezones; the
# oracle rebuilds both: integer-part grouping + 2dp cents, and Lagos as a
# fixed UTC+1 shift (no DST) labeled WAT.
_AMOUNT_LABEL_SQL = (
    "'₦' || format('{:,}', floor(round(t.amount, 2))::BIGINT) || '.' || "
    "lpad(((round(t.amount, 2) * 100)::BIGINT % 100)::VARCHAR, 2, '0')"
)
_TIME_LABEL_SQL = (
    "strftime(t.initiated_at + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') || ' WAT'"
)

SQL_NOTIFICATIONS_RENDER = (
    TXNS_CTE
    + f"""
SELECT t.transaction_id, t.account_id,
       CASE WHEN t.transaction_type IN {_DEBITS_SQL} THEN 'HIGH'
            ELSE 'MEDIUM' END AS severity,
       'BOTH' AS channel,
       {_AMOUNT_LABEL_SQL} AS amount_label,
       {_TIME_LABEL_SQL} AS event_time_label,
       'High-value ' || t.transaction_type || ' alert: ' || {_AMOUNT_LABEL_SQL}
         AS subject,
       'A ' || t.transaction_type || ' of ' || {_AMOUNT_LABEL_SQL} ||
       ' was recorded on account ' || COALESCE(c.c_name, 'N/A') ||
       ' at ' || {_TIME_LABEL_SQL} || '.' AS body
FROM txns t LEFT JOIN customer c ON t.account_id = c.c_custkey
WHERE t.amount IS NOT NULL AND t.amount >= {HV_THRESHOLD}
"""
)


# --- Changelog materialization (J2: latest-value-per-key) ---------------------


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable materialization over the events changelog: latest row per
    user via max_by partial aggregation (one shuffle, map-side combine;
    see cdc.latest_by_key). Tie-break on (ts, event_id) struct order."""
    ev = B.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev = ev.withColumn("_seq", F.struct(F.col("ts"), F.col("event_id")))
    return cdc.latest_by_key(ev, "user_id")


SQL_LATEST_EVENT_PER_USER = """
SELECT event_id, ts, user_id, event_type, value FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


CDC_QUERIES: dict[str, QueryFn] = {
    "cdc_parse": q_cdc_parse,
    "notifications_render": q_notifications_render,
    "high_value_alerts": q_high_value,
    "txn_velocity": q_velocity,
    "daily_spend": q_daily_spend,
    "dormancy": q_dormancy,
    "balance_recon": q_balance_recon,
    "latest_event_per_user": q_latest_event_per_user,
}

CDC_ORACLES: dict[str, str] = {
    "cdc_parse": SQL_CDC_PARSE,
    "notifications_render": SQL_NOTIFICATIONS_RENDER,
    "high_value_alerts": SQL_HIGH_VALUE,
    "txn_velocity": SQL_VELOCITY,
    "daily_spend": SQL_DAILY_SPEND,
    "dormancy": SQL_DORMANCY,
    "balance_recon": SQL_BALANCE_RECON,
    "latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
}
