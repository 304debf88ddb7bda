"""Join operators beyond plain equi-joins (extension surface; the
reference has FK equi-joins only — SURVEY.md §2 E).

- skew_tolerant_join: hot-key split-join. AQE's skew-join handles
  moderate skew at runtime; for pathological keys (one key = 30% of a
  100 TB fact table) splitting hot keys into a broadcast path and
  cold keys into the normal shuffle path bounds the largest task
  explicitly.
- asof_join: for each left row, the latest right row with
  right.ts <= left.ts per key (the time-series join Spark lacks as a
  primitive). Implemented as union + ordered window with
  last(ignorenulls) — ONE shuffle on (key), no range cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skew_tolerant_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    hot_key_threshold: int = 100_000,
    sample_fraction: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with explicit hot-key handling: keys whose estimated
    left-side frequency exceeds ``hot_key_threshold`` join via
    broadcast of the (filtered) right side; the cold remainder uses
    the regular shuffle join; results union. Semantics identical to
    ``left.join(right, key, how)`` for ``how`` in {'inner', 'left'}
    — other join types cannot be split per-left-key without
    duplicating or losing unmatched right rows, so they raise.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "skew_tolerant_join preserves semantics only for how in "
            f"{{'inner','left'}}, got {how!r}"
        )
    # NULL keys never join, so they are never hot — and a None inside
    # hot_keys poisons isin(): ~is_hot evaluates to NULL for EVERY
    # cold key and the cold filter silently drops all of them
    freq = (
        left.sample(sample_fraction, seed=seed)
        .filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg((F.count(F.lit(1)) / sample_fraction).alias("est"))
        .filter(F.col("est") >= hot_key_threshold)
    )
    hot_keys = [r[key] for r in freq.collect()]
    if not hot_keys:
        return left.join(right, key, how)
    is_hot = F.col(key).isin(hot_keys)
    hot_left = left.filter(is_hot)  # NULL keys are never hot
    # left join: NULL-key left rows must survive on the cold path
    # (~isin evaluates to NULL for NULL keys and would drop them)
    cold_pred = ~is_hot if how == "inner" else F.col(key).isNull() | ~is_hot
    cold_left = left.filter(cold_pred)
    hot = hot_left.join(F.broadcast(right.filter(is_hot)), key, how)
    cold = cold_left.join(right, key, how)
    return hot.unionByName(cold)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: attach to every left row the most recent right row
    (per ``key``) with right_ts <= left_ts; right columns are NULL when
    no prior right row exists.

    Plan shape: tag both inputs, union, one window sorted by
    (ts, side) per key carrying last-seen right values forward — a
    single shuffle on the key, linear in |left|+|right| (a naive
    range-condition join is a per-key cross product).
    Ties (right_ts == left_ts) count as "already happened", matching
    DuckDB's ASOF JOIN (>= comparison), which serves as the oracle.
    """
    rvals = right_value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    collisions = {f"{right_ts}{suffix}"} | {f"{c}{suffix}" for c in rvals}
    collisions &= set(left.columns)
    if collisions:
        # silently nulling + overwriting an existing left column would
        # corrupt data; demand a different suffix
        raise ValueError(
            f"asof_join: left already has column(s) {sorted(collisions)} "
            f"that the suffix '{suffix}' would overwrite — pass a "
            "different suffix"
        )
    # equi-join semantics: NULL never matches NULL, so NULL-key right
    # rows must not seed the NULL-key window partition (left NULL-key
    # rows then correctly carry NULL right values). NULL-TIMESTAMP
    # right rows are excluded too: they sort NULLS FIRST and would
    # carry their values into left rows with no true preceding right
    # row (DuckDB ASOF matches nothing for a NULL right timestamp)
    right = right.filter(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    )
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ets", F.col(left_ts))
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("__ets"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rvals],
    )
    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in rvals]
    rhs_types = dict(rhs.dtypes)
    for c in carried:
        lhs = lhs.withColumn(c, F.lit(None).cast(rhs_types[c]))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps => equality
    # counts as past (DuckDB ASOF semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ets").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in carried:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).drop("__side", "__ets")
