"""Source readers (SURVEY.md §2.1 S8-S11).

Spark's Hadoop-FS connectors give file/s3a/http for free; what lives here
is schema-normalizing ingestion: nanosecond-parquet handling, CSV import
with declared schemas, export helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet reader tolerant of TIMESTAMP(NANOS) columns.

    Spark rejects INT64(TIMESTAMP_NANOS) parquet columns outright; with
    ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as raw nanosecond
    longs. We truncate ns -> µs (integer `div`, not double division — a
    1.7e18 ns epoch overflows a double's 52-bit mantissa) into proper
    TimestampType, matching DuckDB's silent ns->µs truncation and the
    reference's second-precision cast-down (`lakota/schema.py:12-20`).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - immutable conf on some builds
        pass
    df = spark.read.parquet(path)
    schema = spark.read.parquet(path).schema
    # Parquet logical-type info is gone by now; detect "nanos read as long"
    # via the raw parquet footer instead.
    import pyarrow.parquet as pq

    try:
        arrow_schema = pq.read_schema(_one_file(path))
    except Exception:  # pragma: no cover - directory datasets
        return df
    for field, spark_field in zip(arrow_schema, schema):
        if (
            str(field.type).startswith("timestamp[ns")
            and spark_field.dataType.simpleString() == "bigint"
        ):
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
    return df


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
