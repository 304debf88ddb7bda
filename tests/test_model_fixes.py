"""Regression tests for model-plane review fixes: FD-chain determinant
protection, SQL AVG NULL semantics, capped-dictionary loudness,
unseen-categorical delta rejection, categorical range-bound bisection,
and shared-column-name FK probes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.plans.parser import parse_query
from deepdb_public_spark.plans.schema import SchemaGraph, Table
from deepdb_public_spark.spn.trainer import train_spn_model


def _single_table_setup(spark, rows, schema_str, name="t"):
    df = spark.createDataFrame(rows, schema_str)
    g = SchemaGraph()
    g.add_table(Table(name, ["id"]))
    return {name: df}, g, df


class TestFDChain:
    def test_transitive_chain_keeps_determinant(self, spark):
        """city -> state -> country: conditions on country must keep
        working (state, the determinant, must never be dropped)."""
        rows = []
        cities = [
            ("aa", "s1", "cx"), ("ab", "s1", "cx"), ("ac", "s2", "cx"),
            ("ad", "s2", "cx"), ("ae", "s3", "cy"), ("af", "s3", "cy"),
        ]
        for i in range(600):
            city, state, country = cities[i % len(cities)]
            rows.append((i, city, state, country, float(i % 40)))
        cat, g, df = _single_table_setup(
            spark, rows, "id long, city string, state string, country string, v double"
        )
        model = train_spn_model(
            cat, g, {"t"}, 5_000, use_functional_dependencies=True
        )
        q = parse_query("SELECT COUNT(*) AS c FROM t WHERE t.country = 'cx'", g)
        est = model.cardinality(q)
        true = df.filter(F.col("country") == "cx").count()
        assert abs(est - true) < 0.2 * true + 10

    def test_conditions_on_all_chain_levels(self, spark):
        rows = [
            (i, f"c{i % 6}", f"s{(i % 6) // 2}", "k" if i % 6 < 4 else "m", 1.0)
            for i in range(400)
        ]
        cat, g, df = _single_table_setup(
            spark, rows, "id long, city string, state string, country string, v double"
        )
        model = train_spn_model(
            cat, g, {"t"}, 5_000, use_functional_dependencies=True
        )
        for col, val in (("city", "c1"), ("state", "s0"), ("country", "m")):
            q = parse_query(
                f"SELECT COUNT(*) AS c FROM t WHERE t.{col} = '{val}'", g
            )
            est = model.cardinality(q)  # must not raise
            true = df.filter(F.col(col) == val).count()
            assert abs(est - true) < 0.25 * true + 10, (col, est, true)


class TestAvgNullSemantics:
    @pytest.fixture(scope="class")
    def setup(self, spark):
        # x NULL in half the rows, 10.0 otherwise; SQL AVG(x) = 10
        rows = [
            (i, 10.0 if i % 2 == 0 else None, float(i % 5)) for i in range(2000)
        ]
        cat, g, df = _single_table_setup(spark, rows, "id long, x double, grp double")
        model = train_spn_model(cat, g, {"t"}, 5_000)
        return g, df, model

    def test_ungrouped_avg(self, setup):
        g, df, model = setup
        q = parse_query("SELECT AVG(t.x) AS a FROM t", g)
        est = model.aqp(q)[0]["a"]
        assert abs(est - 10.0) < 0.5, est  # not ~5 (the null-biased value)

    def test_grouped_avg(self, setup):
        g, df, model = setup
        q = parse_query("SELECT t.grp, AVG(t.x) AS a FROM t GROUP BY t.grp", g)
        for row in model.aqp(q):
            assert abs(row["a"] - 10.0) < 0.8, row

    def test_avg_ci_centered_on_sql_avg(self, setup):
        g, _df, model = setup
        q = parse_query("SELECT AVG(t.x) AS a FROM t", g)
        ci = model.confidence_interval(q, 0.95)[0]
        assert ci["lo"] <= 10.0 <= ci["hi"], ci

    def test_count_star_unaffected(self, setup):
        g, df, model = setup
        q = parse_query("SELECT COUNT(*) AS c FROM t", g)
        assert abs(model.cardinality(q) - df.count()) < 0.05 * df.count()


class TestCategoricalRangeBounds:
    @pytest.fixture(scope="class")
    def setup(self, spark):
        vals = ["apple", "mango", "zebra"]
        rows = [(i, vals[i % 3], 1.0) for i in range(900)]
        cat, g, df = _single_table_setup(spark, rows, "id long, s string, v double")
        model = train_spn_model(cat, g, {"t"}, 5_000)
        return g, df, model

    @pytest.mark.parametrize(
        "pred",
        [
            "t.s BETWEEN 'b' AND 'n'",   # unseen bounds -> mango only
            "t.s BETWEEN 'apple' AND 'n'",
            "t.s > 'b'",                  # mango + zebra
            "t.s <= 'n'",                 # apple + mango
            "t.s < 'apple'",              # nothing
            "t.s >= 'zebra'",             # zebra
        ],
    )
    def test_range_predicates_match_exact(self, setup, spark, pred):
        g, df, model = setup
        q = parse_query(f"SELECT COUNT(*) AS c FROM t WHERE {pred}", g)
        est = model.cardinality(q)
        spark_pred = pred.replace("t.s", "s")
        true = df.filter(F.expr(spark_pred)).count()
        assert abs(est - true) < 0.1 * true + 5, (pred, est, true)

    def test_conjunct_with_unseen_bound_intersects(self, setup, spark):
        """Two range conjuncts on the same column, one with an unseen
        literal, must intersect instead of raising TypeError."""
        g, df, model = setup
        q = parse_query(
            "SELECT COUNT(*) AS c FROM t WHERE t.s > 'b' AND t.s < 'n'", g
        )
        est = model.cardinality(q)
        true = df.filter((F.col("s") > "b") & (F.col("s") < "n")).count()
        assert abs(est - true) < 0.1 * true + 5


class TestCappedDictionaryLoud:
    def test_literal_raises_not_zero(self, spark):
        rows = [(i, f"v{i}", 1.0) for i in range(500)]
        cat, g, _df = _single_table_setup(spark, rows, "id long, s string, v double")
        model = train_spn_model(cat, g, {"t"}, 5_000)
        # simulate a beyond-cap column: dictionary withheld
        if "s" in model.column_names:
            model.meta.columns["s"].value_to_code = None
            with pytest.raises(ValueError, match="dictionary"):
                q = parse_query(
                    "SELECT COUNT(*) AS c FROM t WHERE t.s = 'v1'", g
                )
                model.cardinality(q)


class TestDeltaUnseenCategory:
    def test_absorb_rejects_unseen_value(self, spark):
        from deepdb_public_spark.spn.incremental import absorb_delta

        rows = [(i, ["A", "B"][i % 2], float(i % 30)) for i in range(800)]
        cat, g, df = _single_table_setup(spark, rows, "id long, s string, v double")
        model = train_spn_model(cat, g, {"t"}, 5_000)
        bad = spark.createDataFrame(
            [(9001, "NEW_CATEGORY", 1.0)], "id long, s string, v double"
        )
        with pytest.raises(ValueError, match="unseen"):
            absorb_delta(model, bad)
        ok = spark.createDataFrame([(9001, "A", 1.0)], "id long, s string, v double")
        assert absorb_delta(model, ok) == 1  # seen values still absorb


class TestSharedColumnNameProbes:
    def test_fk_probe_with_shared_column_name(self, spark):
        """Both edge tables carry a non-key column literally named
        'name': the RDC probes must neither crash on ambiguity nor
        score the edge via a column with itself."""
        from deepdb_public_spark.spn.ensemble import (
            compute_pairwise_rdc,
            score_fk_edges,
        )

        left = spark.createDataFrame(
            [(i, f"n{i % 7}", float(i % 11)) for i in range(300)],
            "lk long, name string, lv double",
        )
        right = spark.createDataFrame(
            [(i, i % 50, f"n{i % 5}", float(i % 13)) for i in range(300)],
            "rk long, lk long, name string, rv double",
        )
        g = SchemaGraph()
        g.add_table(Table("left_t", ["lk"]))
        g.add_table(Table("right_t", ["rk"]))
        g.add_relationship("right_t", "lk", "left_t", "lk")
        cat = {"left_t": left, "right_t": right}
        scores = score_fk_edges(cat, g, ["left_t", "right_t"], rdc_sample=300)
        assert len(scores) == 1 and 0.0 <= next(iter(scores.values())) <= 1.0
        pairwise = compute_pairwise_rdc(cat, g, ["left_t", "right_t"], rdc_sample=300)
        assert all(len(k) == 2 for k in pairwise)  # no self-pairs
