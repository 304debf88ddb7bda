"""skew_tolerant_join equivalence + plan shape; asof_join vs a pandas
reference implementation (the DuckDB ASOF oracle is exercised by
test_oracle_parity::x18)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.operators.joins import asof_join, skew_tolerant_join
from deepdb_public_spark.sources.catalog import load_tables
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def tabs(spark):
    return load_tables(spark, SF_CORRECT, ["orders", "lineitem", "events"])


def test_skew_join_matches_plain_join(spark, tabs):
    # manufacture skew: one synthetic hot key covering ~20% of rows
    left = tabs["lineitem"].withColumn(
        "k", F.when(F.col("l_linenumber") == 1, F.lit(0)).otherwise(F.col("l_orderkey"))
    )
    right = tabs["orders"].withColumn("k", F.col("o_orderkey")).select("k", "o_orderstatus")
    plain = left.join(right, "k").count()
    skew = skew_tolerant_join(left, right, "k", hot_key_threshold=5_000).count()
    assert skew == plain


def test_skew_join_broadcasts_hot_path(spark, tabs):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = tabs["lineitem"].withColumn(
            "k", F.when(F.col("l_linenumber") == 1, F.lit(0)).otherwise(F.col("l_orderkey"))
        )
        right = tabs["orders"].withColumn("k", F.col("o_orderkey")).select("k", "o_orderstatus")
        plan = (
            skew_tolerant_join(left, right, "k", hot_key_threshold=5_000)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan  # hot path
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan  # cold path
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_asof_join_matches_pandas_merge_asof(spark, tabs):
    ev = tabs["events"]
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .limit(2000)
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    got = (
        asof_join(purchases, clicks, "user_id", right_value_cols=["value"])
        .select("event_id", "ts_right", "value_right")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    p = purchases.toPandas().sort_values("ts")
    c = clicks.toPandas().sort_values("ts")
    want = pd.merge_asof(
        p, c, on="ts", by="user_id", direction="backward", suffixes=("", "_r")
    ).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["event_id"] == want["event_id"]).all()
    gv = got["value_right"].fillna(-1).to_numpy()
    wv = want["value"].fillna(-1).to_numpy()
    assert (gv == wv).all()
