"""Batch parquet sources for the driver testdata tables.

Batch twin of the reference's Kafka sources (SURVEY.md §2.1 S1-S4). Reads are
plain `spark.read.parquet` so Catalyst gets predicate pushdown + column
pruning into the scan for free; at cluster scale the same loaders work on
date-partitioned directories unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Parquet columns stored as INT64 TIMESTAMP(NANOS): Spark reads them as long
# (spark.sql.legacy.parquet.nanosAsLong); we truncate to µs timestamps, which
# is exactly what DuckDB does when reading the same files.
NANO_TS_COLUMNS = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # events/lineitem/orders carry INT64 TIMESTAMP(NANOS) columns; without this
    # conf a plain session (e.g. one not built by session.py) fails the read
    # with PARQUET_TYPE_ILLEGAL. session.get_spark also sets it at build time;
    # the guarded runtime set covers externally-constructed sessions, and a
    # future Spark that drops the legacy conf degrades with a clear message
    # instead of an opaque setter error.
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        if spark.conf.get(conf_key, None) != "true":
            spark.conf.set(conf_key, "true")
    except Exception as e:  # pragma: no cover - future-Spark guard
        raise RuntimeError(
            f"cannot enable {conf_key} (needed to read the INT64 "
            "TIMESTAMP(NANOS) testdata parquet on this session); set it at "
            "session build time or re-generate the data with µs timestamps"
        ) from e
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in NANO_TS_COLUMNS.get(name, ()):
        dt = df.schema[col].dataType
        if isinstance(dt, T.LongType):
            # integer division: ns are ~1.7e18, beyond double's 2^53 exactness
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # µs-precision parquet with isAdjustedToUTC=false reads as
            # TIMESTAMP_NTZ; the session runs in UTC, so the cast to the
            # session-zoned TIMESTAMP is value-preserving and restores the
            # type the downstream unix_micros/window arithmetic expects
            # (DuckDB reads the same files as its NTZ-like TIMESTAMP —
            # identical wall-clock values either way).
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def embedding_dim(
    sf_dir: str, table: str = "embeddings", col: str = "embedding"
) -> int:
    """Vector width of an array column, read from ONE parquet record batch
    via pyarrow (~ms, no Spark job). Replaces the previous
    ``df.select(col).first()`` probe, which launched an eager driver job on
    every registered-query construction and raised an opaque TypeError on an
    empty table."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/{table}.parquet")
    # scan for the first NON-empty value (bounded): bailing on the first
    # row made ONE empty/NULL leading vector (failed upstream embed) kill
    # every dim-inferring query even though the table was full of good
    # vectors — including embedding_health_audit, the operator whose job
    # is to REPORT such rows
    seen = 0
    for batch in pf.iter_batches(batch_size=256, columns=[col]):
        for val in batch.column(0).to_pylist():
            if val:
                return len(val)
            seen += 1
            if seen >= 65536:
                break
        if seen >= 65536:
            break
    raise ValueError(
        f"cannot infer vector dim: {sf_dir}/{table}.parquet has no non-empty "
        f"'{col}' value in the first {max(seen, 1)} rows"
    )
