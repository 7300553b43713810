"""Fixed StructType schemas for the CDC envelopes and outputs.

Mirrors the reference's Avro schemas (reference: src/main/avro/
transactions_value.avsc, accounts_value.avsc, customers_value.avsc;
envelope layout documented in CdcEnvelope.java:8-24). Money and IDs arrive as
Avro double (Oracle NUMBER through Debezium, ABBankTopology.java:36-43);
event timestamps are io.debezium.time.MicroTimestamp (epoch micros) and
date-ish fields io.debezium.time.Timestamp (epoch millis) — see SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- CDC row images ---------------------------------------------------------

TRANSACTION_VALUE = T.StructType(
    [
        T.StructField("TRANSACTION_ID", T.DoubleType(), False),
        T.StructField("ACCOUNT_ID", T.DoubleType(), False),
        T.StructField("TRANSACTION_REF", T.StringType(), False),
        T.StructField("TRANSACTION_TYPE", T.StringType(), False),
        T.StructField("AMOUNT", T.DoubleType(), False),
        T.StructField("CURRENCY", T.StringType(), True),
        T.StructField("BALANCE_BEFORE", T.DoubleType(), True),
        T.StructField("BALANCE_AFTER", T.DoubleType(), True),
        T.StructField("DESCRIPTION", T.StringType(), True),
        T.StructField("COUNTERPARTY_NAME", T.StringType(), True),
        T.StructField("COUNTERPARTY_ACCT", T.StringType(), True),
        T.StructField("CHANNEL", T.StringType(), True),
        T.StructField("TRANSACTION_STATUS", T.StringType(), True),
        T.StructField("INITIATED_AT", T.LongType(), True),  # epoch micros
        T.StructField("COMPLETED_AT", T.LongType(), True),  # epoch micros
        T.StructField("CREATED_AT", T.LongType(), True),  # epoch micros
        T.StructField("UPDATED_AT", T.LongType(), True),  # epoch micros
    ]
)

ACCOUNT_VALUE = T.StructType(
    [
        T.StructField("ACCOUNT_ID", T.DoubleType(), False),
        T.StructField("CUSTOMER_ID", T.DoubleType(), False),
        T.StructField("ACCOUNT_NUMBER", T.StringType(), False),
        T.StructField("ACCOUNT_TYPE", T.StringType(), False),
        T.StructField("CURRENCY", T.StringType(), True),
        T.StructField("BALANCE", T.DoubleType(), True),
        T.StructField("AVAILABLE_BALANCE", T.DoubleType(), True),
        T.StructField("OVERDRAFT_LIMIT", T.DoubleType(), True),
        T.StructField("INTEREST_RATE", T.DoubleType(), True),
        T.StructField("ACCOUNT_STATUS", T.StringType(), True),
        T.StructField("OPENED_DATE", T.LongType(), True),  # epoch millis
        T.StructField("CLOSED_DATE", T.LongType(), True),  # epoch millis
        T.StructField("CREATED_AT", T.LongType(), True),  # epoch micros
        T.StructField("UPDATED_AT", T.LongType(), True),  # epoch micros
    ]
)

CUSTOMER_VALUE = T.StructType(
    [
        T.StructField("CUSTOMER_ID", T.DoubleType(), False),
        T.StructField("FIRST_NAME", T.StringType(), False),
        T.StructField("LAST_NAME", T.StringType(), False),
        T.StructField("EMAIL", T.StringType(), False),
        T.StructField("PHONE", T.StringType(), True),
        T.StructField("DATE_OF_BIRTH", T.LongType(), True),  # epoch millis
        T.StructField("NATIONAL_ID", T.StringType(), True),
        T.StructField("ADDRESS_LINE1", T.StringType(), True),
        T.StructField("ADDRESS_LINE2", T.StringType(), True),
        T.StructField("CITY", T.StringType(), True),
        T.StructField("COUNTRY", T.StringType(), True),
        T.StructField("CUSTOMER_STATUS", T.StringType(), True),
        T.StructField("CREATED_AT", T.LongType(), True),  # epoch micros
        T.StructField("UPDATED_AT", T.LongType(), True),  # epoch micros
    ]
)

SOURCE_BLOCK = T.StructType(
    [
        T.StructField("version", T.StringType(), True),
        T.StructField("connector", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("snapshot", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("txId", T.StringType(), True),
        T.StructField("scn", T.StringType(), True),
        T.StructField("lcr_position", T.StringType(), True),
    ]
)

TRANSACTION_BLOCK = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("total_order", T.LongType(), True),
        T.StructField("data_collection_order", T.LongType(), True),
    ]
)


def envelope_schema(value_schema: T.StructType) -> T.StructType:
    """Debezium-style CDC envelope wrapping a row-image schema.

    Layout per reference CdcEnvelope.java:8-24 / transactions_value.avsc:
    before/after row images, op in {c,u,d,r}, ts_ms, source provenance.
    """
    return T.StructType(
        [
            T.StructField("before", value_schema, True),
            T.StructField("after", value_schema, True),
            T.StructField("op", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("source", SOURCE_BLOCK, True),
            T.StructField("transaction", TRANSACTION_BLOCK, True),
        ]
    )


TRANSACTION_ENVELOPE = envelope_schema(TRANSACTION_VALUE)
ACCOUNT_ENVELOPE = envelope_schema(ACCOUNT_VALUE)
CUSTOMER_ENVELOPE = envelope_schema(CUSTOMER_VALUE)

# --- Output: notification events (reference NotificationEvent.java:18-95) ---

NOTIFICATION_TYPES = (
    "FRAUD_ALERT",
    "HIGH_VALUE_ALERT",
    "BALANCE_UPDATE",
    "DORMANCY_ALERT",
    "DAILY_SPEND_SUMMARY",
)
SEVERITIES = ("LOW", "MEDIUM", "HIGH", "CRITICAL")
CHANNELS = ("EMAIL", "SMS", "BOTH")

NOTIFICATION_SCHEMA = T.StructType(
    [
        T.StructField("notificationId", T.StringType(), False),
        T.StructField("notificationType", T.StringType(), False),
        T.StructField("severity", T.StringType(), False),
        T.StructField("channel", T.StringType(), False),
        T.StructField("accountId", T.LongType(), True),
        T.StructField("customerId", T.LongType(), True),
        T.StructField("accountNumber", T.StringType(), True),
        T.StructField("subject", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("eventTime", T.TimestampType(), True),
        T.StructField("generatedAt", T.TimestampType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
