"""Sources: load the fixture parquet tables and register views.

Replaces the reference's CSV->HDF5 staging reader (reference:
data_preparation/prepare_single_tables.py::read_table_csv — SURVEY.md
§2 C1). Parquet is the at-rest format: columnar, splittable,
predicate-pushdown- and column-pruning-friendly, so a 100 TB table is
scanned only for the partitions/columns a query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = [
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
]


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str] | None = None,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load parquet tables from an sf directory; optionally register
    each as a temp view so ``spark.sql`` can address them by name."""
    # The events fixture stores TIMESTAMP(NANOS) which Spark's reader
    # rejects by default; read nanos as long, then truncate to
    # microsecond timestamps — the same truncation DuckDB applies when
    # it reads ns parquet into its us-precision TIMESTAMP.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catalog: dict[str, DataFrame] = {}
    for name in tables or TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            ts_type = dict(df.dtypes)["ts"]
            if isinstance(df.schema["ts"].dataType, LongType):
                # integer `div`, NOT `/`: double division loses ulps at
                # 1.7e18 ns and shifts some timestamps by 1 us
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif ts_type == "timestamp_ntz":
                # naive micros fixture: reinterpret as UTC (session tz
                # is UTC) so event-time ops that require TIMESTAMP —
                # unix_micros, withWatermark — resolve; DuckDB reads
                # the same naive value, so oracle parity is unchanged
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if register_views:
            df.createOrReplaceTempView(name)
        catalog[name] = df
    return catalog


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSONL (one JSON object per line) ingestion — the lingua franca
    of training-data corpora. A declared schema avoids the inference
    scan AND silently-corrupt rows: records that fail to parse land in
    a `_corrupt_record` column instead of killing the job (PERMISSIVE
    mode), so a 100 TB crawl with a few bad lines still loads;
    filter/route them downstream. (Spark restriction: a query that
    references ONLY `_corrupt_record` over raw JSON is rejected —
    `.cache()` the frame or select data columns alongside it.)"""
    reader = spark.read.option("multiLine", multiline).option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        # the corrupt-record column must be part of the declared schema
        if "_corrupt_record" not in schema:
            schema = f"{schema}, _corrupt_record string"
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV ingestion with a declared schema (reference C1). Explicit
    schema avoids the inference pass — one scan instead of two on
    100 TB inputs."""
    reader = spark.read.option("sep", sep).option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """ORC ingestion (Hive-ecosystem interchange; schema travels with
    the file like parquet, so no declaration needed). Predicate
    pushdown and column pruning work the same as the parquet source."""
    return spark.read.orc(path)
