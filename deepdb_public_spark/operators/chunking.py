"""Document chunking for context-window preparation (extension
surface): split long documents into fixed-size overlapping character
windows, the standard preprocessing step before tokenize-and-pack
(see operators/sampling.pack_sequences for the packing side).

Spark shape: chunk starts are a `sequence()` column computed from the
document length, exploded into one row per chunk, each chunk a
`substring` slice — a pure narrow projection with NO shuffle and no
Python. At 100 TB this is a single columnar scan whose output is
~len/stride times the input rows; downstream operators (dedup,
packing) shuffle, this one never does.

The window semantics are deliberately portable (1-based starts at
1, 1+stride, 1+2*stride, ... while start <= length; the final chunk
may be shorter than ``size``), so any engine reproduces the exact
chunk set — the DuckDB oracle uses generate_series + substr.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import spread_small_input


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Explode documents into overlapping character windows ->
    (id, chunk_id, chunk_start, chunk_len, chunk_md5).

    ``stride`` < ``size`` gives overlapping windows (overlap =
    size - stride), the usual shape for context-window training data
    so no boundary content is lost. Empty/NULL documents produce no
    chunks. ``chunk_md5`` stands in for the chunk text in outputs so
    result rows stay narrow; callers that need the text itself select
    ``substring(text, chunk_start, size)`` instead.
    """
    if size <= 0 or stride <= 0:
        raise ValueError(f"size ({size}) and stride ({stride}) must be positive")
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(1), n, F.lit(stride))
    chunk = F.substring(F.col(text_col), F.col("chunk_start"), size)
    return (
        spread_small_input(df)
        .filter(F.col(text_col).isNotNull() & (n > 0))
        .select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            "chunk_start",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )
