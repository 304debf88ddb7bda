"""Scale-safe dictionary encoding: domains above the driver-dict
threshold encode via the distributed mapping join."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdb_public_spark.operators.prep import encode_table


def test_large_domain_encodes_without_driver_dict(spark):
    n = 2000
    df = spark.createDataFrame(
        [(i, f"val_{i:06d}") for i in range(n)], "id int, s string"
    )
    enc, meta = encode_table(df, "t", max_dict_size=500)
    cm = meta.columns["s"]
    assert cm.value_to_code is None  # above threshold: no driver dict
    assert cm.n_distinct == n
    got = {r["id"]: r["s"] for r in enc.collect()}
    # codes are sorted-order ranks; val_%06d sorts by i
    assert got == {i: i for i in range(n)}


def test_small_domain_keeps_dict_and_same_codes(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "c"), (4, "a"), (5, None)],
        "id int, s string",
    )
    enc, meta = encode_table(df, "t")
    cm = meta.columns["s"]
    assert cm.value_to_code == {"a": 0, "b": 1, "c": 2}
    assert cm.n_distinct == 3 and cm.null_code == 3
    got = {r["id"]: r["s"] for r in enc.collect()}
    assert got == {1: 1, 2: 0, 3: 2, 4: 0, 5: None}
