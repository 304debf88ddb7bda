"""Input-partition hygiene for expression-heavy operators.

A small parquet file arrives as ONE input split, so a pipeline whose
cost is per-row expression work (shingling, hashing, signature
computation, dot products) runs on one core no matter how many the
cluster has. At warehouse scale the scan has plenty of splits and
this is a no-op; on small inputs an explicit round-robin exchange of
the (cheap, pre-explosion) rows buys full parallelism for the
downstream per-row work.

reference: deepdb-public assumes pandas single-process execution and
has no analogue; this is the Spark-native concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# DataFrames whose localCheckpoint THIS package created. Only these
# are touched by release_local_checkpoints(): a checkpoint created by
# user code elsewhere in the session must never be swept (releasing a
# checkpoint truncated lineage makes any not-yet-materialized result
# built on it unrecomputable).
_TRACKED: list[DataFrame] = []


def track_local_checkpoint(df: DataFrame) -> DataFrame:
    """Register a locally-checkpointed DataFrame for deterministic
    release by release_local_checkpoints(). Call this on the result of
    every ``df.localCheckpoint(...)`` this package creates."""
    _TRACKED.append(df)
    return df


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when it
    has fewer input partitions.

    The check is metadata-only (no job); the repartition shuffles the
    raw input rows BEFORE any expensive projection, so the exchanged
    bytes are the source rows, not the exploded/shingled form.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    # The repartition alone is NOT enough: Catalyst pushes
    # deterministic projections and filters below the round-robin
    # exchange (measured: a filter on size(shingles) was rewritten to
    # evaluate the full shingling expression UNDER the exchange — in
    # the one-task scan stage — and again above it). A lazy
    # localCheckpoint truncates the lineage at the exchange so
    # downstream expression work genuinely runs on ``target``
    # partitions.
    #
    # Trade-offs, accepted deliberately for THIS branch only (inputs
    # smaller than one split per core; at warehouse scale the
    # function is a metadata-only no-op): the checkpoint blocks are
    # unreplicated, so losing an executor mid-pipeline fails later
    # actions instead of recomputing (retry the operator — its input
    # is small); and blocks are freed by the ContextCleaner only once
    # the driver garbage-collects the underlying RDD, so a long-lived
    # session briefly holds one small-input copy per operator call
    # rather than releasing it at scope exit. Long-lived sessions can
    # free the blocks deterministically via release_local_checkpoints()
    # (wired into dedup.release_cached()).
    return track_local_checkpoint(
        df.repartition(target).localCheckpoint(eager=False)
    )


def release_local_checkpoints(spark=None) -> int:
    """Drop the storage blocks of the locally-checkpointed RDDs THIS
    package created (everything registered via track_local_checkpoint);
    returns how many were unpersisted. Checkpoints created by other
    code in the session are never touched (round-5 advice: the old
    session-wide getPersistentRDDs sweep could truncate an unrelated
    pipeline's lineage out from under it).

    Call ONLY between pipelines, after results are materialized:
    localCheckpoint truncates lineage, so a not-yet-collected result
    that still references a released checkpoint cannot be recomputed.
    This is the deterministic counterpart to waiting for the driver's
    ContextCleaner GC — the same contract as dedup.release_cached(),
    which calls this. The ``spark`` argument is accepted for backward
    compatibility and ignored (tracking is per-package, not
    per-session).
    """
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            # the analyzed plan of a checkpointed DataFrame is the
            # LogicalRDD wrapping the exact RDD localCheckpoint
            # persisted (verified against Spark 4.x); unpersisting it
            # frees the blocks without touching any other RDD
            jrdd = df._jdf.queryExecution().analyzed().rdd()
            if jrdd.isLocallyCheckpointed():
                jrdd.unpersist(False)
                released += 1
        except Exception:
            # py4j internals shifted (non-classic Spark runtime): fall
            # back to ContextCleaner GC semantics rather than fail
            # hygiene
            continue
    return released
