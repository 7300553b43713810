"""Envelope fixture builders mirroring the reference test suite's
buildTxnEnvelope (ABBankTopologyTest.java:359-417)."""

from __future__ import annotations

from typing import Any

from cdc_stream_processor_spark import schemas

_VALUE_FIELDS = [f.name for f in schemas.TRANSACTION_VALUE.fields]


def txn_image(
    txn_id: float = 1.0,
    account_id: float = 101.0,
    txn_type: str = "DEBIT",
    amount: float = 1000.0,
    status: str = "COMPLETED",
    initiated_at_us: int = 1_700_000_000_000_000,
    balance_before: float | None = None,
    balance_after: float | None = None,
    currency: str | None = "NGN",
) -> dict[str, Any]:
    img = dict.fromkeys(_VALUE_FIELDS)
    img.update(
        TRANSACTION_ID=txn_id,
        ACCOUNT_ID=account_id,
        TRANSACTION_REF=f"REF-{int(txn_id)}",
        TRANSACTION_TYPE=txn_type,
        AMOUNT=amount,
        CURRENCY=currency,
        BALANCE_BEFORE=balance_before,
        BALANCE_AFTER=balance_after,
        CHANNEL="MOBILE",
        TRANSACTION_STATUS=status,
        INITIATED_AT=initiated_at_us,
    )
    return img


def envelope(image: dict[str, Any] | None, op: str = "c") -> dict[str, Any]:
    return {
        "before": image if op == "d" else None,
        "after": None if op == "d" else image,
        "op": op,
        "ts_ms": 1_700_000_000_000,
        "source": None,
        "transaction": None,
    }


def make_txn_df(spark, envelopes):
    return spark.createDataFrame(envelopes, schema=schemas.TRANSACTION_ENVELOPE)


def account_image(account_id: float, number: str = "ACC-1", customer_id: float = 9.0):
    fields = [f.name for f in schemas.ACCOUNT_VALUE.fields]
    img = dict.fromkeys(fields)
    img.update(
        ACCOUNT_ID=account_id,
        CUSTOMER_ID=customer_id,
        ACCOUNT_NUMBER=number,
        ACCOUNT_TYPE="SAVINGS",
        CURRENCY="NGN",
        BALANCE=1_000_000.0,
    )
    return img


def make_account_df(spark, images):
    envs = [
        {
            "before": None,
            "after": img,
            "op": "r",
            "ts_ms": 0,
            "source": None,
            "transaction": None,
        }
        for img in images
    ]
    return spark.createDataFrame(envs, schema=schemas.ACCOUNT_ENVELOPE)
