"""Deterministic CDC envelope simulator over the driver testdata.

The driver testdata has no CDC tables, so the oracle-checked queries exercise
the REAL envelope path by deterministically wrapping `events` rows into
Debezium-style transaction envelopes (and `customer` rows into account
envelopes), then running the engine's parse + pipelines on them. Because the
wrapping is pure arithmetic on the source rows, the DuckDB oracle can express
the equivalent computation directly over the raw tables.

Mapping (events → transactions):
  TRANSACTION_ID   = event_id (double, reference IDs are Avro double)
  ACCOUNT_ID       = user_id
  TRANSACTION_TYPE = purchase→DEBIT  click→TRANSFER_OUT  error→FEE
                     signup→CREDIT   view→TRANSFER_IN      (else INTEREST)
  AMOUNT           = value
  INITIATED_AT     = epoch micros of ts
  TRANSACTION_STATUS = 'PENDING' if event_id % 7 == 3 else 'COMPLETED'
  op               = 'd' if event_id%10==0, 'r' if %10==1, 'u' if %10==2 else 'c'
                     (op='d' rows carry only `before`, per Debezium)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_stream_processor_spark import schemas

# Keep in sync with TYPE_MAP_SQL below and oracle SQL in __spark_entry__.py.
_TYPE_MAP = {
    "purchase": "DEBIT",
    "click": "TRANSFER_OUT",
    "error": "FEE",
    "signup": "CREDIT",
    "view": "TRANSFER_IN",
}

TYPE_MAP_SQL = (
    "CASE event_type WHEN 'purchase' THEN 'DEBIT' WHEN 'click' THEN 'TRANSFER_OUT' "
    "WHEN 'error' THEN 'FEE' WHEN 'signup' THEN 'CREDIT' WHEN 'view' THEN "
    "'TRANSFER_IN' ELSE 'INTEREST' END"
)
STATUS_SQL = "CASE WHEN event_id % 7 = 3 THEN 'PENDING' ELSE 'COMPLETED' END"
OP_SQL = (
    "CASE WHEN event_id % 10 = 0 THEN 'd' WHEN event_id % 10 = 1 THEN 'r' "
    "WHEN event_id % 10 = 2 THEN 'u' ELSE 'c' END"
)


def _txn_type() -> F.Column:
    expr = F.lit("INTEREST")
    for k, v in reversed(list(_TYPE_MAP.items())):
        expr = F.when(F.col("event_type") == k, F.lit(v)).otherwise(expr)
    return expr


def transaction_envelopes_from_events(events: DataFrame) -> DataFrame:
    """events → DataFrame[TRANSACTION_ENVELOPE] (deterministic)."""
    image = F.struct(
        F.col("event_id").cast("double").alias("TRANSACTION_ID"),
        F.col("user_id").cast("double").alias("ACCOUNT_ID"),
        F.concat(F.lit("REF-"), F.col("event_id")).alias("TRANSACTION_REF"),
        _txn_type().alias("TRANSACTION_TYPE"),
        F.col("value").alias("AMOUNT"),
        F.lit("NGN").alias("CURRENCY"),
        F.lit(None).cast("double").alias("BALANCE_BEFORE"),
        F.lit(None).cast("double").alias("BALANCE_AFTER"),
        F.lit(None).cast("string").alias("DESCRIPTION"),
        F.lit(None).cast("string").alias("COUNTERPARTY_NAME"),
        F.lit(None).cast("string").alias("COUNTERPARTY_ACCT"),
        F.upper(F.col("event_type")).alias("CHANNEL"),
        F.when(F.col("event_id") % 7 == 3, F.lit("PENDING"))
        .otherwise(F.lit("COMPLETED"))
        .alias("TRANSACTION_STATUS"),
        (F.unix_micros(F.col("ts"))).alias("INITIATED_AT"),
        F.lit(None).cast("long").alias("COMPLETED_AT"),
        F.lit(None).cast("long").alias("CREATED_AT"),
        F.lit(None).cast("long").alias("UPDATED_AT"),
    )
    op = (
        F.when(F.col("event_id") % 10 == 0, "d")
        .when(F.col("event_id") % 10 == 1, "r")
        .when(F.col("event_id") % 10 == 2, "u")
        .otherwise("c")
    )
    is_delete = F.col("event_id") % 10 == 0
    source = F.struct(
        F.lit("2.4").alias("version"),
        F.lit("oracle").alias("connector"),
        F.lit("xepdb1").alias("name"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.lit("false").alias("snapshot"),
        F.lit("XEPDB1").alias("db"),
        F.lit("BANKDB").alias("schema"),
        F.lit("TRANSACTIONS").alias("table"),
        F.col("event_id").cast("string").alias("txId"),
        F.col("event_id").cast("string").alias("scn"),
        F.lit(None).cast("string").alias("lcr_position"),
    )
    return events.select(
        F.when(is_delete, image).otherwise(F.lit(None)).alias("before"),
        F.when(~is_delete, image).otherwise(F.lit(None)).alias("after"),
        op.alias("op"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        source.alias("source"),
        F.lit(None).cast(schemas.TRANSACTION_BLOCK).alias("transaction"),
    )


def with_synthetic_ledger(txns: DataFrame) -> DataFrame:
    """Attach deterministic balance columns to parsed transactions.

    The events-derived envelopes carry no balances, so the balance
    reconciliation twin gets a synthetic ledger: balance_after = per-account
    cumulative amount (DECIMAL(18,4) so Spark and the DuckDB oracle agree
    exactly), balance_before = balance_after - amount, with a ledger error of
    +7.5 injected when transaction_id % 13 == 5 so HIGH discrepancies exist.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("account_id")
        .orderBy("initiated_at", "transaction_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    amt = F.col("amount").cast("decimal(18,4)")
    after = F.sum(amt).over(w)
    err = F.when(F.col("transaction_id") % 13 == 5, F.lit(7.5)).otherwise(F.lit(0.0))
    return txns.withColumn(
        "balance_after", after.cast("double")
    ).withColumn(
        "balance_before",
        ((after - amt).cast("double") + err),
    )


def accounts_envelopes_from_customers(customer: DataFrame) -> DataFrame:
    """customer → DataFrame[ACCOUNT_ENVELOPE]: account_id = customer_id =
    c_custkey, account_number = c_name, balance = c_acctbal."""
    image = F.struct(
        F.col("c_custkey").cast("double").alias("ACCOUNT_ID"),
        F.col("c_custkey").cast("double").alias("CUSTOMER_ID"),
        F.col("c_name").alias("ACCOUNT_NUMBER"),
        F.coalesce(F.col("c_mktsegment"), F.lit("SAVINGS")).alias("ACCOUNT_TYPE"),
        F.lit("NGN").alias("CURRENCY"),
        F.col("c_acctbal").alias("BALANCE"),
        F.col("c_acctbal").alias("AVAILABLE_BALANCE"),
        F.lit(0.0).alias("OVERDRAFT_LIMIT"),
        F.lit(0.0).alias("INTEREST_RATE"),
        F.lit("ACTIVE").alias("ACCOUNT_STATUS"),
        F.lit(1704067200000).alias("OPENED_DATE"),
        F.lit(None).cast("long").alias("CLOSED_DATE"),
        F.lit(None).cast("long").alias("CREATED_AT"),
        F.lit(None).cast("long").alias("UPDATED_AT"),
    )
    source = F.struct(
        F.lit("2.4").alias("version"),
        F.lit("oracle").alias("connector"),
        F.lit("xepdb1").alias("name"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.lit("true").alias("snapshot"),
        F.lit("XEPDB1").alias("db"),
        F.lit("BANKDB").alias("schema"),
        F.lit("ACCOUNTS").alias("table"),
        F.col("c_custkey").cast("string").alias("txId"),
        F.col("c_custkey").cast("string").alias("scn"),
        F.lit(None).cast("string").alias("lcr_position"),
    )
    return customer.select(
        F.lit(None).cast(schemas.ACCOUNT_VALUE).alias("before"),
        image.alias("after"),
        F.lit("r").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        source.alias("source"),
        F.lit(None).cast(schemas.TRANSACTION_BLOCK).alias("transaction"),
    )


def customers_envelopes_from_customers(customer: DataFrame) -> DataFrame:
    """customer → DataFrame[CUSTOMER_ENVELOPE]: names split from c_name
    ('Customer#000000042' → first 'Customer', last '000000042') so the
    two-hop enrichment (J3 completion) has deterministic person fields."""
    first = F.split(F.col("c_name"), "#").getItem(0)
    # a name without '#' splits to ONE element: getItem(1) raised
    # INVALID_ARRAY_INDEX under ANSI mode (TPC-H names always carry '#',
    # real CDC names need not). F.get returns NULL out of bounds;
    # coalesce to '' = DuckDB's split_part missing-part value, so the
    # full_name/email builders stay engine-identical.
    last = F.coalesce(
        F.get(F.split(F.col("c_name"), "#"), F.lit(1)), F.lit("")
    )
    image = F.struct(
        F.col("c_custkey").cast("double").alias("CUSTOMER_ID"),
        first.alias("FIRST_NAME"),
        last.alias("LAST_NAME"),
        F.concat(F.lower(first), F.lit("."), last, F.lit("@abbank.example"))
        .alias("EMAIL"),
        F.lit(None).cast("string").alias("PHONE"),
        F.lit(None).cast("long").alias("DATE_OF_BIRTH"),
        F.lit(None).cast("string").alias("NATIONAL_ID"),
        F.lit(None).cast("string").alias("ADDRESS_LINE1"),
        F.lit(None).cast("string").alias("ADDRESS_LINE2"),
        F.lit(None).cast("string").alias("CITY"),
        F.lit("NG").alias("COUNTRY"),
        F.lit("ACTIVE").alias("CUSTOMER_STATUS"),
        F.lit(None).cast("long").alias("CREATED_AT"),
        F.lit(None).cast("long").alias("UPDATED_AT"),
    )
    source = F.struct(
        F.lit("2.4").alias("version"),
        F.lit("oracle").alias("connector"),
        F.lit("xepdb1").alias("name"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.lit("true").alias("snapshot"),
        F.lit("XEPDB1").alias("db"),
        F.lit("BANKDB").alias("schema"),
        F.lit("CUSTOMERS").alias("table"),
        F.col("c_custkey").cast("string").alias("txId"),
        F.col("c_custkey").cast("string").alias("scn"),
        F.lit(None).cast("string").alias("lcr_position"),
    )
    return customer.select(
        F.lit(None).cast(schemas.CUSTOMER_VALUE).alias("before"),
        image.alias("after"),
        F.lit("r").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        source.alias("source"),
        F.lit(None).cast(schemas.TRANSACTION_BLOCK).alias("transaction"),
    )
