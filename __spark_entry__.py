"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: high-value alert pipeline over the CDC envelope path
    at sf0.001 (events → envelopes → parse → filter ⋈ accounts → alerts)."""
    from cdc_stream_processor_spark import queries as Q

    return Q.q_high_value(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cdc_stream_processor_spark import queries as Q

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(Q.CDC_QUERIES)
    try:
        from cdc_stream_processor_spark import queries_relational as QR

        out.update(QR.QUERIES)
    except ImportError:
        pass
    try:
        from cdc_stream_processor_spark import queries_extensions as QE

        out.update(QE.QUERIES)
    except ImportError:
        pass
    try:
        from cdc_stream_processor_spark import queries_corpus as QC

        out.update(QC.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from cdc_stream_processor_spark import queries as Q

    out: dict[str, str] = {}
    out.update(Q.CDC_ORACLES)
    try:
        from cdc_stream_processor_spark import queries_relational as QR

        out.update(QR.ORACLES)
    except ImportError:
        pass
    try:
        from cdc_stream_processor_spark import queries_extensions as QE

        out.update(QE.ORACLES)
    except ImportError:
        pass
    try:
        from cdc_stream_processor_spark import queries_corpus as QC

        out.update(QC.ORACLES)
    except ImportError:
        pass
    return out
