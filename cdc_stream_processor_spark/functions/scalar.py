"""Scalar column functions — SURVEY.md §2.9 C1–C15.

Every helper is a pure Column expression (JVM-side, whole-stage-codegen
friendly); no Python UDFs. Semantics match the reference's CdcParser /
TransactionEvent helpers (citations inline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LAGOS_TZ = "Africa/Lagos"  # reference ABBankTopology.java:58

# reference TransactionEvent.java:66-77
DEBIT_TYPES = ("DEBIT", "TRANSFER_OUT", "FEE", "LOAN_REPAYMENT")
CREDIT_TYPES = ("CREDIT", "TRANSFER_IN", "INTEREST")


def is_debit(txn_type: Column) -> Column:
    """C6 — type ∈ debit set (TransactionEvent.java:66-71)."""
    return txn_type.isin(*DEBIT_TYPES)


def is_credit(txn_type: Column) -> Column:
    """C7 — type ∈ credit set (TransactionEvent.java:73-77)."""
    return txn_type.isin(*CREDIT_TYPES)


def is_completed(status: Column) -> Column:
    """C8 — status == COMPLETED (TransactionEvent.java:79-81)."""
    return status == F.lit("COMPLETED")


def micros_to_ts(col: Column) -> Column:
    """C3 — Debezium MicroTimestamp (epoch µs) → TimestampType
    (CdcParser.java:58-61; truncating µs→ms division preserved by the
    micro-resolution timestamp)."""
    return F.timestamp_micros(col)


def millis_to_ts(col: Column) -> Column:
    """Debezium Timestamp (epoch ms) → TimestampType (CdcParser.java:23-25)."""
    return F.timestamp_millis(col)


def safe_long(col: Column) -> Column:
    """C4/C15 — null→0 truncate-toward-zero id cast (CdcParser.java:67-70)."""
    return F.coalesce(col, F.lit(0.0)).cast("long")


def money4(col: Column) -> Column:
    """C5 — money double → scale-4 HALF_UP (CdcParser.java:76-80).
    Spark round() is HALF_UP for positive scale, matching BigDecimal."""
    return F.round(col, 4)


def format_amount(amount: Column, currency: Column) -> Column:
    """C1 — '₦' prefix iff NGN (case-insensitive) else '<CUR> ', thousands
    grouping at 2dp; null amount → ₦0.00 (CdcParser.java:40-44)."""
    cur = F.coalesce(currency, F.lit("NGN"))
    prefix = F.when(F.upper(cur) == "NGN", F.lit("₦")).otherwise(
        F.concat(cur, F.lit(" "))
    )
    # pre-round HALF_UP: Java's %,.2f (CdcParser) is HALF_UP, but Spark's
    # format_number is HALF_EVEN — rounding first makes grouping rounding-free
    return F.concat(
        prefix, F.format_number(F.round(F.coalesce(amount, F.lit(0.0)), 2), 2)
    )


def format_timestamp_lagos(ts: Column) -> Column:
    """C2 — 'yyyy-MM-dd HH:mm:ss z' rendered in Africa/Lagos; null → 'N/A'
    (CdcParser.java:30-32,49-52). Window *boundaries* stay UTC-aligned;
    only labels shift (SURVEY.md §1.4)."""
    return F.coalesce(
        F.concat(
            F.date_format(F.from_utc_timestamp(ts, LAGOS_TZ), "yyyy-MM-dd HH:mm:ss"),
            F.lit(" WAT"),
        ),
        F.lit("N/A"),
    )


def lagos_date(ts: Column) -> Column:
    """C13 — local date label in Africa/Lagos (ABBankTopology.java:403-404)."""
    return F.to_date(F.from_utc_timestamp(ts, LAGOS_TZ))


def full_name(first: Column, last: Column) -> Column:
    """C10 — 'first last' with null→'' (CustomerEvent.java:46-48)."""
    return F.concat_ws(" ", F.coalesce(first, F.lit("")), F.coalesce(last, F.lit("")))
