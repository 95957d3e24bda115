"""Format-dispatched batch sources/sinks beyond the parquet testdata:
csv, json(l), orc, text — the interchange formats a crawl/curation
pipeline actually receives and emits around its parquet core.

Scale posture, enforced here rather than left to callers:

* **Explicit schema required for csv/json.** Schema inference runs a
  full extra pass over the data before the real job — at 100 TB that
  silently doubles the scan. Callers must pass the DDL/StructType they
  expect; malformed rows are quarantined, not inferred around.
* **Malformed rows dead-letter instead of failing the job.** PERMISSIVE
  mode with a ``_corrupt_record`` column, so one bad line in a
  terabyte of JSONL becomes a filterable row (the ingest dead-letter
  pattern, plans/ingest.py) rather than a task failure.
* **Writers default to snappy parquet** and support partitionBy so
  sinks land partition-pruned for downstream readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

READ_FORMATS = {"parquet", "csv", "json", "orc", "text"}
WRITE_FORMATS = {"parquet", "csv", "json", "orc"}

CORRUPT_COL = "_corrupt_record"


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. csv/json REQUIRE an explicit schema
    (DDL string or StructType); a ``_corrupt_record`` string column is
    appended to it so malformed input rows surface as data. Extra
    ``options`` pass through to the underlying reader (e.g.
    ``sep=';'``, ``multiLine='true'``)."""
    fmt = fmt.lower()
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported read format {fmt!r}; one of {sorted(READ_FORMATS)}")
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{fmt} requires an explicit schema: inference would scan "
                "the full dataset once before the real job"
            )
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        if CORRUPT_COL not in schema.fieldNames():
            # StructType.add mutates in place — copy so the caller's
            # schema object doesn't permanently grow the corrupt column
            schema = StructType(list(schema.fields)).add(CORRUPT_COL, "string")
        reader = (
            reader.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
        if fmt == "csv":
            reader = reader.option("header", "true")
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, dead_letter) split on the corrupt-record column; the
    clean side drops it. No-op pass-through if the column is absent.

    Spark refuses plans that reference ONLY the corrupt column straight
    off a raw csv/json scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    documented pattern is to materialize the parse first, so the input
    is cached here. The cache is the CALLER's to release: after both
    sides are consumed, ``clean.sparkSession.catalog`` eviction or an
    explicit ``unpersist()`` on the returned frames' common input keeps
    a long-lived session from accumulating cached raw scans (use
    ``split_corrupt_consume`` when the dead-letter side is materialized
    immediately). At raw-interchange scale, land the parse in a staging
    table instead and split from that."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.where(df[CORRUPT_COL].isNotNull())
    return clean, bad


def split_corrupt_consume(
    df: DataFrame,
) -> tuple[DataFrame, list]:
    """Pipeline-friendly variant: materializes the dead-letter side to
    the driver (it is small by assumption — corrupt rows, not data),
    unpersists the cached raw input eagerly, and returns (clean,
    bad_rows). The clean side re-reads from source on use, so no cached
    raw scan lingers in executor storage between calls."""
    clean, bad = split_corrupt(df)
    bad_rows = bad.collect()
    if CORRUPT_COL in df.columns:
        df.unpersist()
    return clean, bad_rows


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` as ``fmt``. ``partition_by`` lands the
    sink directory-partitioned so downstream scans prune; csv gets a
    header so the file round-trips through read_source."""
    fmt = fmt.lower()
    if fmt not in WRITE_FORMATS:
        raise ValueError(f"unsupported write format {fmt!r}; one of {sorted(WRITE_FORMATS)}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
