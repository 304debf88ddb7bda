"""End-to-end corpus curation decision operator (extension surface,
SURVEY.md §7.6): the quality -> exact-dedup -> balanced-quota pipeline
every pre-training data refresh runs, composed from the repo's
portable primitives so the WHOLE pipeline — not just its stages — is
one oracle-checkable DataFrame program.

The reference engine (deepdb-public) has no text surface; this module
exists for the training-data-pipeline extension goal and composes
filters.gopher-style predicates, dedup's keep-first rule, and
sampling's md5-order quota into a single per-document verdict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def curate_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    strata_col: str,
    per_stratum: int,
    quality: Column,
    salt: int = 16,
) -> DataFrame:
    """Per-document curation verdict -> (id, stratum, stage, kept).

    Three stages, applied in pipeline order, each ENGINE-PORTABLE so a
    SQL oracle replays the whole decision:

    1. ``quality`` — a caller-supplied boolean Column over ``df``'s
       rows (e.g. a subset of the Gopher rules configured for the
       corpus's language mix). Failing docs get stage='quality'.
    2. exact dedup — md5(lower(text)) content fingerprint; among
       quality survivors the LOWEST id per fingerprint is kept, the
       rest get stage='duplicate' (the keep-first rule of
       dedup.exact_dedup, restated as a window so the oracle can
       replay rank order).
    3. balanced quota — at most ``per_stratum`` survivors per
       ``strata_col`` value, chosen by md5-of-id order (the
       stratified_sample rule); overflow gets stage='quota'.

    Survivors get stage='kept' and kept=true; every input row appears
    exactly once.

    Scale shape: stage 1 is a pure projection. Stage 2's window
    partitions by content fingerprint — cardinality ~corpus size with
    dup-cluster-sized groups, the skew-free window shape. Stage 3
    partitions by stratum, whose cardinality is SMALL (languages,
    sources), so it uses the TWO-PHASE quota of
    similarity.cluster_balanced_sample: a salted
    (stratum, hash(id) % salt) sub-window keeps local top-per_stratum,
    then a merge window ranks the bounded survivors and the
    strata*per_stratum winner set broadcasts back — no window ever
    sorts a whole stratum in one task. ``salt=0`` keeps the
    single-window plan for small inputs."""
    if salt < 0:
        raise ValueError(f"salt must be >= 0 (got {salt})")
    base = df.select(
        F.col(id_col),
        F.col(strata_col).alias("stratum"),
        quality.alias("__q"),
        F.md5(F.lower(F.col(text_col))).alias("__fp"),
    )
    w_dup = Window.partitionBy("__fp").orderBy(id_col)
    q = base.filter(F.col("__q")).withColumn(
        "__rn_dup", F.row_number().over(w_dup)
    )
    surv = q.filter(F.col("__rn_dup") == 1)
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    if salt > 0:
        w1 = Window.partitionBy(
            "stratum", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt))
        ).orderBy(*order)
        cands = (
            surv.select(id_col, "stratum")
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= per_stratum)
        )
    else:
        cands = surv.select(id_col, "stratum")
    w2 = Window.partitionBy("stratum").orderBy(*order)
    winners = (
        cands.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= per_stratum)
        .select(id_col, F.lit(True).alias("__keep"))
    )
    labeled = (
        base.join(q.select(id_col, "__rn_dup"), id_col, "left")
        .join(F.broadcast(winners), id_col, "left")
    )
    stage = (
        # NULL quality (e.g. NULL text nulling every flag) FAILS the
        # quality stage — without the coalesce such rows fell through
        # both branches (NULL ~q, NULL __rn_dup) and were mislabeled
        # 'quota' (round-11 ADVICE; the x57 oracle mirrors the
        # COALESCE so cross-engine results stay identical)
        F.when(~F.coalesce(F.col("__q"), F.lit(False)), F.lit("quality"))
        .when(F.col("__rn_dup") > 1, F.lit("duplicate"))
        .when(F.col("__keep").isNull(), F.lit("quota"))
        .otherwise(F.lit("kept"))
    )
    return labeled.select(
        F.col(id_col),
        "stratum",
        stage.alias("stage"),
        (stage == "kept").alias("kept"),
    )
