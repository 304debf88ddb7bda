"""Deterministic sampling/split operators + corpus vocabulary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    split_threshold_hex,
)
from deepdb_public_spark.operators.textstats import term_frequencies


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).withColumnRenamed("id", "doc_id")


def test_hash_split_fractions_and_determinism(ids):
    out = hash_split(ids, "doc_id", {"train": 0.8, "dev": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == 20_000
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["dev"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01
    # same assignment on re-evaluation and under repartition
    again = hash_split(ids.repartition(7), "doc_id", {"train": 0.8, "dev": 0.1, "test": 0.1})
    assert out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count() == 0


def test_hash_split_matches_portable_sql(ids, spark):
    """The operator's assignment equals the documented hex-prefix SQL
    (what the DuckDB oracle runs)."""
    thr = split_threshold_hex(0.9)
    assert thr == "e666"
    ids.createOrReplaceTempView("_ids")
    sql = spark.sql(
        f"SELECT doc_id, CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 4) < '{thr}' "
        "THEN 'train' ELSE 'test' END AS split FROM _ids"
    )
    ours = hash_split(ids, "doc_id", {"train": 0.9, "test": 0.1}).select("doc_id", "split")
    assert ours.exceptAll(sql).count() == 0


def test_hash_split_rejects_bad_fractions(ids):
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", {"train": 0.5, "test": 0.1})


def test_deterministic_sample_stable_and_proportional(ids):
    s = deterministic_sample(ids, "doc_id", 0.25)
    n = s.count()
    assert abs(n / 20_000 - 0.25) < 0.02
    # subset property: sampling at a higher fraction keeps the lower one
    s2 = deterministic_sample(ids, "doc_id", 0.5)
    assert s.exceptAll(s2).count() == 0


def test_term_frequencies(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "THE cat!"), (3, "dog dog dog")],
        "doc_id long, text string",
    )
    out = term_frequencies(docs, "text", k=3).collect()
    assert [(r["token"], r["cnt"]) for r in out] == [("dog", 3), ("cat", 2), ("the", 2)]


def test_weighted_mixture_sources_and_fractions(spark):
    from deepdb_public_spark.operators.sampling import weighted_mixture

    a = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    b = spark.range(10_000, 12_000).withColumnRenamed("id", "doc_id")
    mixed = weighted_mixture({"big": (a, 0.5), "small": (b, 1.0)}, "doc_id")
    counts = {r["source"]: r["n"] for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 2_000
    assert abs(counts["big"] / 10_000 - 0.5) < 0.03
    # re-evaluation keeps the exact same rows (deterministic)
    again = weighted_mixture({"big": (a, 0.5), "small": (b, 1.0)}, "doc_id")
    assert mixed.exceptAll(again).count() == 0


def test_contamination_report_finds_planted_leak(spark):
    from deepdb_public_spark.operators.textstats import contamination_report

    rows = [(i, f"unique text {i}", "train" if i % 2 == 0 else "test") for i in range(100)]
    rows.append((1000, "unique text 2", "test"))   # duplicates a train doc
    rows.append((1001, "Unique   TEXT 2", "test")) # same after normalization
    rows.append((1002, "unique text 3", "train"))  # contaminates test doc 3
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    hits = contamination_report(df, "text", "doc_id", "split").collect()
    assert {r["doc_id"] for r in hits} == {3, 1000, 1001}
    assert all(r["n_train_dups"] == 1 for r in hits)
