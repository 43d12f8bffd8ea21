"""Source readers (SURVEY.md §2.1 S8-S11).

Spark's Hadoop-FS connectors give file/s3a/http for free; what lives here
is schema-normalizing ingestion: nanosecond-parquet handling, CSV import
with declared schemas, export helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(
    spark: SparkSession,
    path: str,
    ns_range: dict[str, tuple] | None = None,
) -> DataFrame:
    """Parquet reader tolerant of TIMESTAMP(NANOS) columns.

    Spark rejects INT64(TIMESTAMP_NANOS) parquet columns outright; with
    ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as raw nanosecond
    longs. We truncate ns -> µs (integer `div`, not double division — a
    1.7e18 ns epoch overflows a double's 52-bit mantissa) into proper
    TimestampType, matching DuckDB's silent ns->µs truncation and the
    reference's second-precision cast-down (`lakota/schema.py:12-20`).

    ``ns_range``: optional {col: (lo, hi, lo_closed, hi_closed)} datetime
    bounds applied to the RAW nanosecond longs BEFORE conversion — a
    filter on the converted expression can never reach the parquet scan,
    whereas the raw-long predicate pushes down to row-group skipping.
    Bounds are exclusive/inclusive per the closed flags; None skips a side.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros() below is session-tz-sensitive; every other
        # timestamp column in the testdata is NTZ (tz-free). Pin UTC so the
        # converted values match a tz-naive oracle regardless of the host
        # session's timezone.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover - immutable conf on some builds
        pass
    df = spark.read.parquet(path)
    schema = df.schema
    # Parquet logical-type info is gone by now; detect "nanos read as long"
    # via the raw parquet footer instead.
    import pyarrow.parquet as pq

    try:
        arrow_schema = pq.read_schema(_one_file(path))
    except Exception:  # pragma: no cover - directory datasets
        return df
    handled = set()
    for field, spark_field in zip(arrow_schema, schema):
        if (
            str(field.type).startswith("timestamp[ns")
            and spark_field.dataType.simpleString() == "bigint"
        ):
            handled.add(field.name)
            if ns_range and field.name in ns_range:
                lo, hi, lo_closed, hi_closed = ns_range[field.name]
                c = F.col(field.name)
                # Truncation-consistent bounds: a row's visible (µs) value
                # is floor(ns/1000), so inclusive-hi/exclusive-lo must
                # shift to the next whole microsecond in raw-ns space.
                if lo is not None:
                    ns = _epoch_ns(lo)
                    df = df.where(c >= (ns if lo_closed else ns + 1000))
                if hi is not None:
                    ns = _epoch_ns(hi)
                    df = df.where(c < (ns + 1000 if hi_closed else ns))
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
    # Native µs/ms timestamp columns (timestamp / timestamp_ntz): apply the
    # same bounds directly. A string literal cast to the column's own type
    # is constant-folded by Catalyst, so the predicate still reaches the
    # parquet scan (PushedFilters → row-group skipping).
    if ns_range:
        for spark_field in schema:
            name = spark_field.name
            if name in handled or name not in ns_range:
                continue
            if not spark_field.dataType.simpleString().startswith("timestamp"):
                continue
            lo, hi, lo_closed, hi_closed = ns_range[name]
            c = F.col(name)
            tname = spark_field.dataType.simpleString()
            if lo is not None:
                lit = F.lit(_iso(lo)).cast(tname)
                df = df.where(c >= lit if lo_closed else c > lit)
            if hi is not None:
                lit = F.lit(_iso(hi)).cast(tname)
                df = df.where(c <= lit if hi_closed else c < lit)
    return df


def _iso(value) -> str:
    import datetime as dt

    if isinstance(value, str):
        value = dt.datetime.fromisoformat(value)
    return value.isoformat(sep=" ")


def _epoch_ns(value) -> int:
    import datetime as dt

    if isinstance(value, str):
        value = dt.datetime.fromisoformat(value)
    epoch = dt.datetime(1970, 1, 1)
    return int((value - epoch).total_seconds() * 1_000_000) * 1000


def _one_file(path: str) -> str:
    import glob
    import os

    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "*.parquet")))
    return hits[0] if hits else path


def import_csv(
    spark: SparkSession, path: str, schema=None, **options
) -> DataFrame:
    """CSV import with declared (not inferred) schema — the reference
    schema-checks headers on import (`lakota/repo.py:415-461`)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def export_csv(df: DataFrame, path: str, **options) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path, **options)


def export_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)
