"""Sinks. The reference only emits CSV result files and pickled
models (SURVEY.md §2 E: "we standardize on parquet"); this module is
the engine's standard at-rest output surface.

Scale notes baked into each writer:
- partitioned parquet: partition columns must be low-cardinality
  (thousands of directories, not millions); high-cardinality keys
  belong in bucketing, which makes later joins on that key
  shuffle-free.
- a `repartition` before write controls output file count — without
  it a 32-task stage writes 32 files per partition directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    if target_files is not None:
        df = (
            df.repartition(target_files, *partition_by)
            if partition_by
            else df.repartition(target_files)
        )
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by join key so repeated
    joins/aggregations on ``bucket_col`` skip the shuffle — the right
    staging layout for repeated SPN ensemble generation over the same
    fact table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted parquet: rows are globally
    range-partitioned on ``sort_cols`` (one sort-key range per output
    file, via ``repartitionByRange`` sampling the key distribution)
    and sorted within each file.

    This is the data-skipping layout for a 100 TB fact table: parquet
    stores per-file and per-row-group min/max statistics, and because
    files own DISJOINT key ranges, a pushed-down filter on the sort
    key prunes whole files at scan time — the scan reads
    O(selectivity) bytes instead of O(table). The skipping itself is
    free (Spark's parquet reader consumes the stats); this writer only
    has to make the stats selective, which random row placement never
    is. tests/test_extensions.py asserts the disjoint-ranges invariant
    from the written footers."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """CSV result export (the reference's evaluation output format)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    target_files: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSONL corpus export (one object per line, optionally gzipped —
    the interchange format downstream tokenizer/training jobs read).
    ``target_files`` bounds output file count; leave None to keep the
    upstream parallelism."""
    if target_files is not None:
        df = df.repartition(target_files)
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    """ORC export (Spark-native columnar alternative for Hive-centric
    consumers) — same partition/file-count discipline as parquet."""
    if target_files is not None:
        df = (
            df.repartition(target_files, *partition_by)
            if partition_by
            else df.repartition(target_files)
        )
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet: rows are laid out along an
    interleaved-bit curve over ``zorder_cols``, so parquet min/max
    stats stay selective for filters on EVERY listed column — the
    multi-column data-skipping layout (Delta/Iceberg's OPTIMIZE
    ZORDER, built here from plain Spark primitives).

    ``write_sorted_parquet`` makes one column's ranges disjoint but
    scatters the others; Z-ordering trades a little per-column
    selectivity for usable min/max bounds on all of them.

    Implementation: each column is rank-normalized to ``bits`` bits
    via percent_rank (rank handles skew and mixed types: any orderable
    column works), the bit patterns interleave into one long Z-value
    (a JVM-side loop over bit positions — no UDF), and the write
    range-partitions + sorts on that Z-value. The Z-value is dropped
    from the output; readers see the original schema.

    Scale shape: percent_rank needs a global sort PER COLUMN — at
    100 TB replace with approxQuantile-derived bucket bounds (same
    interleave afterwards); the curve quality, not the exactness of
    the ranks, is what drives skipping.
    """
    from pyspark.sql.window import Window

    if bits <= 0 or not zorder_cols or bits * len(zorder_cols) > 63:
        raise ValueError(
            f"need bits >= 1 and 1..{63 // max(bits, 1)} z-order columns "
            f"at {bits} bits (got {len(zorder_cols)} cols, bits={bits})"
        )
    work = df
    rank_cols = []
    for c in zorder_cols:
        r = f"__r_{c}"
        # percent_rank in [0,1] -> integer grid [0, 2^bits)
        work = work.withColumn(
            r,
            F.least(
                F.lit((1 << bits) - 1),
                (F.percent_rank().over(Window.orderBy(c)) * (1 << bits)).cast("long"),
            ),
        )
        rank_cols.append(r)
    # interleave: bit j of column i lands at position j*len+ i
    parts = []
    for j in range(bits):
        for i, r in enumerate(rank_cols):
            src = F.shiftright(F.col(r), j).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(src, j * len(rank_cols) + i))
    z = parts[0]
    for p in parts[1:]:
        z = z.bitwiseOR(p)
    (
        work.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *rank_cols)
        .write.mode(mode)
        .parquet(path)
    )
