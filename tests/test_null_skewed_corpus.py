"""Round 8: NULL-skewed corpus variants for the round-7 hardening
fixes.

The round-7 deep review fixed real data-loss bugs in the skew join
(NULL hot-key cold-row drop), the as-of join (NULL-timestamp right
rows carrying values into false matches), and the corpus filters
(empty/NULL docs vanishing) — each with a narrow unit test. This
module routes the ACTUAL testdata tables, deterministically NULLed at
~10% on keys/timestamps/texts, through those operators and pins
equivalence against plain-Spark references, so the NULL-heavy shapes
are exercised at corpus scale, not just on 3-row toys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _null_out(col, mod, hit):
    """Deterministic ~10% NULL injection keyed on a stable id."""
    return F.when(F.col("__nk") % mod == hit, F.lit(None)).otherwise(col)


@pytest.fixture(scope="module")
def tabs(spark):
    from deepdb_public_spark.sources.catalog import load_tables

    return load_tables(spark, SF, register_views=False)


def test_skew_join_null_keys_corpus(tabs):
    """skew_tolerant_join over lineitem⋈orders with 10% NULL l_orderkey
    must equal the plain join for inner AND left — including the left
    join's NULL-key rows surviving on the cold path (the round-7
    data-loss fix), with the hot path genuinely engaged."""
    from deepdb_public_spark.operators.joins import skew_tolerant_join

    li = (
        tabs["lineitem"]
        .withColumn("__nk", F.col("l_orderkey") * 7 + F.col("l_linenumber"))
        .withColumn("l_orderkey", _null_out(F.col("l_orderkey"), 10, 3))
        .drop("__nk")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .select("o_orderkey", "l_quantity", "l_extendedprice")
    )
    orders = tabs["orders"].select("o_orderkey", "o_orderstatus")
    for how in ("inner", "left"):
        # sample_fraction=1.0 + tiny threshold => every key is "hot";
        # the union of broadcast-hot and cold paths must still be exact
        got = skew_tolerant_join(
            li, orders, "o_orderkey", how=how,
            hot_key_threshold=3, sample_fraction=1.0,
        )
        want = li.join(orders, "o_orderkey", how)
        assert got.count() == want.count(), how
        assert (
            got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0
        ), how
        if how == "left":
            # the NULL-key mass must be present, unmatched
            n_null = got.filter(F.col("o_orderkey").isNull()).count()
            assert n_null == li.filter(F.col("o_orderkey").isNull()).count()
            assert n_null > 0


def test_asof_join_null_ts_and_keys_corpus(tabs):
    """asof_join over the events table with ~10% NULL timestamps on
    BOTH sides and NULL keys on the left: must equal a brute-force
    range-join reference. NULL right timestamps must carry nothing
    (round-7 fix); NULL left timestamps/keys match nothing but
    survive."""
    from deepdb_public_spark.operators.joins import asof_join

    ev = tabs["events"].select("event_id", "ts", "user_id", "event_type", "value")
    left = (
        ev.filter(F.col("event_type") != "purchase")
        .withColumn("__nk", F.col("event_id"))
        .withColumn("ts", _null_out(F.col("ts"), 10, 3))
        .withColumn("user_id", _null_out(F.col("user_id"), 20, 7))
        .drop("__nk", "event_type")
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("__nk", F.col("event_id"))
        .withColumn("ts", _null_out(F.col("ts"), 10, 4))
        .withColumn("user_id", _null_out(F.col("user_id"), 20, 9))
        .drop("__nk", "event_type")
        .select("user_id", "ts", F.col("value").alias("pval"))
        # unique (user_id, ts) so the as-of tie-break is deterministic
        .dropDuplicates(["user_id", "ts"])
    )
    got = asof_join(
        left, right, "user_id", left_ts="ts", right_ts="ts",
        right_value_cols=["pval"],
    ).select("event_id", "ts_right", "pval_right")

    # brute-force reference: most recent prior purchase per left row;
    # NULL comparisons are falsy, so NULL keys/timestamps match nothing
    ref = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") <= F.col("l.ts"))
            & F.col("r.ts").isNotNull(),
            "left",
        )
        .groupBy("l.event_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("r.ts").alias("ts_right"),
                    F.col("r.pval").alias("pval_right"),
                ),
                F.col("r.ts"),
            ).alias("m")
        )
        .select(
            F.col("event_id"),
            F.col("m.ts_right").alias("ts_right"),
            F.col("m.pval_right").alias("pval_right"),
        )
    )
    g = {r["event_id"]: (r["ts_right"], r["pval_right"]) for r in got.collect()}
    w = {r["event_id"]: (r["ts_right"], r["pval_right"]) for r in ref.collect()}
    assert g == w
    # the NULL shapes are genuinely present in the comparison
    assert any(v == (None, None) for v in g.values())
    assert any(v[0] is not None for v in g.values())


def test_ngram_contamination_null_texts_corpus(tabs):
    """ngram_contamination over documents with ~10% NULL texts: NULL
    docs produce no grams (absent from the report, never a crash) and
    the report over the NULLed corpus equals the report over the
    corpus with NULL-text rows pre-dropped — NULL train docs must not
    contaminate, NULL test docs must not dilute."""
    from deepdb_public_spark.operators.textstats import ngram_contamination

    docs = (
        tabs["documents"]
        .withColumn("__nk", F.col("doc_id"))
        .withColumn("text", _null_out(F.col("text"), 10, 3))
        .drop("__nk")
        .withColumn(
            "split",
            F.when(F.col("doc_id") % 2 == 0, "train").otherwise("test"),
        )
    )
    got = ngram_contamination(docs, "text", "doc_id", "split", n=8)
    want = ngram_contamination(
        docs.filter(F.col("text").isNotNull()), "text", "doc_id", "split", n=8
    )
    g = {r["doc_id"]: (r["n_grams"], r["n_hit"]) for r in got.collect()}
    w = {r["doc_id"]: (r["n_grams"], r["n_hit"]) for r in want.collect()}
    assert g == w
    assert g, "corpus should produce a non-empty report"
    nulled_test_ids = {
        r["doc_id"]
        for r in docs.filter(
            F.col("text").isNull() & (F.col("split") == "test")
        ).collect()
    }
    assert nulled_test_ids and nulled_test_ids.isdisjoint(g)
