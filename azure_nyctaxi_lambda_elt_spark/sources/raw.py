"""Raw landing-zone readers: CSV and JSONL with explicit schemas,
PERMISSIVE corrupt-record capture, and the reference's audit columns.

Reference parity: the batch lane lands gzipped CSV/parquet drops
(Ingest/upload_raw.sh, sql/batchELT/staging/stg_trip.sql adds
ingest_date / source_file_name / loaded_at); the streaming raw sink is
JSONL (asa-wire.sh raw output). TRY_CAST-style tolerance is expressed
as PERMISSIVE mode + a _corrupt_record column instead of failing the
load — bad rows flow to the err/DLQ capture operators.

Scale notes: explicit schemas avoid the full-data inference pass (an
extra scan of 100 TB); CSV/JSON scans parallelize per file-split, and
``source_file_name`` uses input_file_name() so lineage survives
repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def with_audit_cols(df: DataFrame) -> DataFrame:
    """ingest_date / source_file_name / loaded_at (stg_trip.sql:24-26)."""
    return (
        df.withColumn("source_file_name",
                      F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withColumn("loaded_at", F.current_timestamp())
        .withColumn("ingest_date", F.to_date(F.col("loaded_at")))
    )


def read_csv_raw(spark: SparkSession, path: str, schema: StructType,
                 header: bool = True, delimiter: str = ",",
                 audit: bool = True) -> DataFrame:
    """Schema-pinned tolerant CSV read; malformed lines land whole in
    _corrupt_record instead of aborting the job."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    return with_audit_cols(df) if audit else df


def read_jsonl_raw(spark: SparkSession, path: str, schema: StructType,
                   audit: bool = True) -> DataFrame:
    """Schema-pinned tolerant JSON-lines read (the streaming raw sink
    format); tolerant of camel/snake drift via case-insensitive match."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return with_audit_cols(df) if audit else df


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(parsed, corrupt) — corrupt rows keep only the raw line + audit.

    Spark disallows referencing ONLY _corrupt_record over a raw file
    scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    documented workaround is caching the parsed frame. At warehouse
    scale the equivalent is landing the parsed frame to the staging
    table first and splitting from there — which is exactly the
    reference's stg → err flow."""
    df = df.cache()
    parsed = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    audit = [c for c in ("source_file_name", "loaded_at", "ingest_date")
             if c in df.columns]
    corrupt = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL, *audit)
    return parsed, corrupt
