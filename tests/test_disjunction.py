"""Disjunction extension: ``(t.c < 5 OR t.c > 45)``.

The reference grammar is conjunctive-only (reference:
evaluation/utils.py::parse_query — SURVEY.md §2 A8/table E); this is
a beyond-reference extension. Both planes serve it: the exact plane
compiles an or-filter (pushed into the scan when one table owns the
group, post-join otherwise); the model plane evaluates SAME-column
groups as one range union (spn/ranges.py::union_ranges) and
CROSS-column groups via inclusion-exclusion (SPNEnsemble._ie_terms).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.engine import Engine
from deepdb_public_spark.plans.parser import parse_query
from deepdb_public_spark.plans.schema import tpch_like_schema
from deepdb_public_spark.spn.leaves import Leaf
from deepdb_public_spark.spn.ranges import (
    NominalRange,
    NullOnlyRange,
    NumericRange,
    union_ranges,
)
from tests.conftest import SF_SMOKE

# ---------------------------------------------------------------- ranges


def test_union_numeric_merges_overlap():
    a = NumericRange([(0.0, 10.0, True, True)])
    b = NumericRange([(5.0, 20.0, True, False)])
    u = union_ranges(a, b)
    assert u.intervals == [(0.0, 20.0, True, False)]


def test_union_numeric_keeps_disjoint():
    a = NumericRange([(-np.inf, 5.0, True, False)])
    b = NumericRange([(45.0, np.inf, False, True)])
    u = union_ranges(a, b)
    assert u.intervals == [
        (-np.inf, 5.0, True, False),
        (45.0, np.inf, False, True),
    ]


def test_union_touching_inclusive_coalesces():
    a = NumericRange([(0.0, 5.0, True, True)])
    b = NumericRange([(5.0, 9.0, False, True)])
    u = union_ranges(a, b)
    assert u.intervals == [(0.0, 9.0, True, True)]


def test_union_touching_both_exclusive_stays_split():
    a = NumericRange([(0.0, 5.0, True, False)])
    b = NumericRange([(5.0, 9.0, False, True)])
    u = union_ranges(a, b)
    assert u.intervals == [
        (0.0, 5.0, True, False),
        (5.0, 9.0, False, True),
    ]


def test_union_nominal_sets():
    u = union_ranges(NominalRange([1, 3]), NominalRange([3, 7]))
    assert u.values == [1, 3, 7]


def test_union_null_marks_include_null():
    u = union_ranges(NullOnlyRange(), NumericRange([(0.0, 1.0, True, True)]))
    assert isinstance(u, NumericRange) and u.include_null


def test_union_mixed_nominal_numeric_lifts_codes():
    u = union_ranges(NominalRange([2, 8]), NumericRange([(3.0, 5.0, True, True)]))
    assert isinstance(u, NumericRange)
    assert u.intervals == [
        (2.0, 2.0, True, True),
        (3.0, 5.0, True, True),
        (8.0, 8.0, True, True),
    ]


def test_union_prob_matches_brute_force_on_leaf():
    """P over a union range == brute-force count over the histogram,
    for random interval unions (the leaf masks OR per interval, so
    this also guards against double counting)."""
    rng = np.random.default_rng(7)
    col = rng.integers(0, 50, size=2000).astype(float)
    leaf = Leaf.fit(0, col)
    for _ in range(50):
        bounds = np.sort(rng.uniform(0, 50, size=4))
        a = NumericRange([(bounds[0], bounds[1], True, False)])
        b = NumericRange([(bounds[2], bounds[3], True, True)])
        u = union_ranges(a, b)
        in_a = (col >= bounds[0]) & (col < bounds[1])
        in_b = (col >= bounds[2]) & (col <= bounds[3])
        want = (in_a | in_b).mean()
        assert leaf.prob(u) == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------- parser


def test_parser_or_group_and_conjuncts():
    sch = tpch_like_schema()
    q = parse_query(
        "SELECT COUNT(*) FROM lineitem WHERE "
        "(lineitem.l_quantity < 5 OR lineitem.l_quantity > 45) "
        "AND lineitem.l_discount <= 0.05",
        sch,
    )
    assert len(q.conditions) == 2
    assert q.conditions[0].op == "OR"
    assert [c.op for c in q.conditions[0].value] == ["<", ">"]


def test_parser_or_with_between_and_literals():
    sch = tpch_like_schema()
    q = parse_query(
        "SELECT COUNT(*) FROM orders, lineitem WHERE "
        "orders.o_orderkey = lineitem.l_orderkey AND "
        "(lineitem.l_quantity BETWEEN 1 AND 5 OR "
        "lineitem.l_quantity BETWEEN 40 AND 50) AND "
        "orders.o_orderstatus = 'F'",
        sch,
    )
    assert len(q.conditions) == 2
    assert q.conditions[0].op == "OR"
    assert q.conditions[0].value[0].op == "BETWEEN"
    assert len(q.relationship_set) == 1


def test_parser_or_literal_containing_keywords():
    sch = tpch_like_schema()
    q = parse_query(
        "SELECT COUNT(*) FROM lineitem WHERE "
        "(lineitem.l_returnflag = 'ROCK AND ROLL' "
        "OR lineitem.l_returnflag IN ('R', 'N'))",
        sch,
    )
    (cond,) = q.conditions
    assert cond.op == "OR"
    assert cond.value[0].value == "ROCK AND ROLL"
    assert cond.value[1].value == ["R", "N"]


def test_parser_rejects_top_level_or():
    sch = tpch_like_schema()
    with pytest.raises(ValueError, match="top-level OR"):
        parse_query(
            "SELECT COUNT(*) FROM lineitem WHERE "
            "lineitem.l_quantity < 5 OR lineitem.l_quantity > 45",
            sch,
        )


def test_parser_single_parenthesized_predicate_degrades():
    sch = tpch_like_schema()
    q = parse_query(
        "SELECT COUNT(*) FROM lineitem WHERE (lineitem.l_quantity < 5)",
        sch,
    )
    (cond,) = q.conditions
    assert cond.op == "<"


# ------------------------------------------------------------ exact plane


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_quantity < 5 OR lineitem.l_quantity > 45)",
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_returnflag = 'A' OR lineitem.l_returnflag = 'R') "
        "AND lineitem.l_discount <= 0.05",
        "SELECT SUM(lineitem.l_extendedprice) AS s FROM orders, lineitem "
        "WHERE orders.o_orderkey = lineitem.l_orderkey AND "
        "(lineitem.l_quantity BETWEEN 1 AND 5 OR "
        "lineitem.l_quantity BETWEEN 40 AND 50)",
    ],
)
def test_exact_plane_or_matches_duckdb(spark, duck, sql):
    eng = Engine(spark, SF_SMOKE)
    got = eng.query(sql).collect()[0][0]
    want = duck[SF_SMOKE].execute(sql).fetchone()[0]
    assert got == want or got == pytest.approx(want, rel=1e-9)


# ------------------------------------------------------------ model plane


def test_model_plane_or_within_budget(spark):
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, SF_SMOKE)
    eng.ensemble = SPNEnsemble(eng.schema)
    eng.ensemble.add_model(
        train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 60_000)
    )
    for sql in [
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_quantity < 5 OR lineitem.l_quantity > 45)",
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_returnflag = 'A' OR lineitem.l_returnflag = 'R')",
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_discount BETWEEN 0.0 AND 0.02 "
        "OR lineitem.l_discount >= 0.08)",
    ]:
        q = eng.parse(sql)
        est = float(eng.ensemble.cardinality(q))
        true = int(eng.query(q).collect()[0][0])
        qerr = max(est / max(true, 1), true / max(est, 1e-9))
        assert qerr < 2.0, (sql, est, true)


# --------------------------------------------- cross-column OR (IE)


def test_parser_cross_column_group_allowed_now():
    sch = tpch_like_schema()
    q = parse_query(
        "SELECT COUNT(*) FROM lineitem WHERE "
        "(lineitem.l_quantity < 5 OR lineitem.l_discount > 0.08)",
        sch,
    )
    (cond,) = q.conditions
    assert cond.op == "OR" and cond.column is None
    assert cond.table == "lineitem"


def test_parser_cross_table_group_has_no_table():
    sch = tpch_like_schema()
    q = parse_query(
        "SELECT COUNT(*) FROM orders, lineitem WHERE "
        "orders.o_orderkey = lineitem.l_orderkey AND "
        "(orders.o_totalprice > 200000 OR lineitem.l_quantity > 45)",
        sch,
    )
    or_conds = [c for c in q.conditions if c.op == "OR"]
    assert len(or_conds) == 1 and or_conds[0].table is None


def test_parser_caps_cross_column_width():
    sch = tpch_like_schema()
    with pytest.raises(ValueError, match="at most"):
        parse_query(
            "SELECT COUNT(*) FROM lineitem WHERE "
            "(lineitem.l_quantity < 1 OR lineitem.l_discount > 0.09 "
            "OR lineitem.l_tax > 0.07 OR lineitem.l_extendedprice > 50000 "
            "OR lineitem.l_suppkey = 3)",
            sch,
        )


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_quantity < 5 OR lineitem.l_discount > 0.08)",
        "SELECT COUNT(*) AS cnt FROM orders, lineitem WHERE "
        "orders.o_orderkey = lineitem.l_orderkey AND "
        "(orders.o_totalprice > 200000 OR lineitem.l_quantity > 45) "
        "AND lineitem.l_tax <= 0.05",
    ],
)
def test_exact_plane_cross_column_or_matches_duckdb(spark, duck, sql):
    eng = Engine(spark, SF_SMOKE)
    got = eng.query(sql).collect()[0][0]
    want = duck[SF_SMOKE].execute(sql).fetchone()[0]
    assert got == want


@pytest.fixture(scope="module")
def li_engine(spark):
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, SF_SMOKE)
    eng.ensemble = SPNEnsemble(eng.schema)
    eng.ensemble.add_model(
        train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 60_000)
    )
    return eng


def test_model_plane_cross_column_or_inclusion_exclusion(li_engine):
    eng = li_engine
    for sql in [
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)",
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_returnflag = 'A' OR lineitem.l_quantity > 45 "
        "OR lineitem.l_discount < 0.01)",
    ]:
        q = eng.parse(sql)
        est = float(eng.ensemble.cardinality(q))
        true = int(eng.query(q).collect()[0][0])
        qerr = max(est / max(true, 1), true / max(est, 1e-9))
        assert qerr < 2.0, (sql, est, true)


def test_model_plane_cross_column_or_aqp(li_engine):
    eng = li_engine
    sql = (
        "SELECT COUNT(*) AS cnt, SUM(lineitem.l_quantity) AS sq, "
        "AVG(lineitem.l_extendedprice) AS ap FROM lineitem WHERE "
        "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)"
    )
    q = eng.parse(sql)
    (est,) = eng.ensemble.aqp(q)
    (true,) = eng.query(q).collect()
    assert est["cnt"] == pytest.approx(true["cnt"], rel=0.25)
    assert est["sq"] == pytest.approx(true["sq"], rel=0.25)
    assert est["ap"] == pytest.approx(true["ap"], rel=0.25)


def test_grouped_cross_column_or_signed_grids(li_engine):
    """Grouped AQP over a cross-column OR: per-group signed sums of
    the term grids; visible groups = union over positive terms —
    matches SQL's group set exactly and the counts within budget."""
    eng = li_engine
    sql = (
        "SELECT lineitem.l_returnflag, COUNT(*) AS cnt, "
        "SUM(lineitem.l_quantity) AS sq, "
        "AVG(lineitem.l_extendedprice) AS ap FROM lineitem "
        "WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08) "
        "GROUP BY lineitem.l_returnflag"
    )
    q = eng.parse(sql)
    est = {r["l_returnflag"]: r for r in eng.ensemble.aqp(q)}
    exact = {
        r["l_returnflag"]: r.asDict() for r in eng.query(q).collect()
    }
    assert set(est) == set(exact)
    for g, truth in exact.items():
        assert est[g]["cnt"] == pytest.approx(truth["cnt"], rel=0.3), g
        assert est[g]["sq"] == pytest.approx(truth["sq"], rel=0.3), g
        assert est[g]["ap"] == pytest.approx(truth["ap"], rel=0.3), g


def test_cross_column_or_ci_supported_count_sum_only(li_engine):
    """Round 5: COUNT/SUM CIs compose over the signed IE terms and the
    interval must contain the exact count; AVG stays exact-plane."""
    from deepdb_public_spark.spn.model import ModelPlaneUnsupported

    eng = li_engine
    q = eng.parse(
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)"
    )
    (ci,) = eng.ensemble.confidence_interval(q, confidence=0.99)
    true = eng.query(q).collect()[0][0]
    assert ci["lo"] <= true <= ci["hi"]
    # round 5b: AVG composes via the delta method over signed sums
    q_avg = eng.parse(
        "SELECT AVG(lineitem.l_quantity) AS a FROM lineitem WHERE "
        "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)"
    )
    (ci_a,) = eng.ensemble.confidence_interval(q_avg, confidence=0.99)
    true_avg = eng.sql(
        "SELECT AVG(l_quantity) FROM lineitem "
        "WHERE l_quantity < 10 OR l_discount > 0.08"
    ).collect()[0][0]
    assert ci_a["lo"] <= true_avg <= ci_a["hi"]
    # round 8: ungrouped COUNT(DISTINCT) under OR now gets Poisson-
    # occupancy moments; est matches the aqp threshold count and the
    # interval covers the exact distinct count
    q_cd = eng.parse(
        "SELECT COUNT(DISTINCT lineitem.l_returnflag) AS d FROM lineitem "
        "WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)"
    )
    (ci_d,) = eng.ensemble.confidence_interval(q_cd, confidence=0.99)
    (aqp_d,) = eng.ensemble.aqp(q_cd)
    assert ci_d["est"] == aqp_d["d"]
    true_d = eng.sql(
        "SELECT COUNT(DISTINCT l_returnflag) FROM lineitem "
        "WHERE l_quantity < 10 OR l_discount > 0.08"
    ).collect()[0][0]
    assert ci_d["lo"] <= true_d <= ci_d["hi"] + 1e-9, (ci_d, true_d)
    # well-separated value masses => near-degenerate interval, far
    # narrower than the domain size
    assert ci_d["hi"] - ci_d["lo"] < 2.0
    # grouped composition: per-(group, value) occupancy moments —
    # every group's interval covers its exact distinct count and the
    # point estimates equal aqp's
    q_cdg = eng.parse(
        "SELECT COUNT(DISTINCT lineitem.l_quantity) AS d FROM lineitem "
        "WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08) "
        "GROUP BY lineitem.l_returnflag"
    )
    cis_g = {
        r["l_returnflag"]: r
        for r in eng.ensemble.confidence_interval(q_cdg, confidence=0.99)
    }
    aqp_g = {r["l_returnflag"]: r["d"] for r in eng.ensemble.aqp(q_cdg)}
    trues_g = {
        r["grp"]: r["t"]
        for r in eng.sql(
            "SELECT l_returnflag AS grp, COUNT(DISTINCT l_quantity) AS t "
            "FROM lineitem WHERE l_quantity < 10 OR l_discount > 0.08 "
            "GROUP BY l_returnflag"
        ).collect()
    }
    assert set(cis_g) == set(aqp_g) == set(trues_g)
    for g, ci in cis_g.items():
        assert ci["est"] == aqp_g[g], (g, ci, aqp_g[g])
        assert ci["lo"] <= trues_g[g] <= ci["hi"] + 1e-9, (g, ci, trues_g[g])


def test_single_model_rejects_cross_column_or(li_engine):
    from deepdb_public_spark.spn.model import ModelPlaneUnsupported

    eng = li_engine
    q = eng.parse(
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)"
    )
    model = eng.ensemble.models[0]
    with pytest.raises(ModelPlaneUnsupported):
        model.cardinality(q)


def test_explain_factors_ie_terms(li_engine):
    eng = li_engine
    q = eng.parse(
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
        "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)"
    )
    trace = eng.ensemble.explain_factors(q)
    assert [t["kind"] for t in trace] == ["ie_term"] * 3
    signed = sum(t["sign"] * t["value"] for t in trace)
    assert signed == pytest.approx(eng.ensemble.cardinality(q), rel=1e-9)


# ------------------------------------------- review-fix regressions


def test_parenthesized_conjunction_parses_as_conjuncts():
    """(t.a = 1 AND t.b = 2) — redundant parens must parse as TWO
    conjuncts, never as a literal '1 AND t.b = 2'."""
    sch = tpch_like_schema()
    q = parse_query(
        "SELECT COUNT(*) FROM lineitem WHERE "
        "(lineitem.l_quantity < 5 AND lineitem.l_discount <= 0.05)",
        sch,
    )
    assert len(q.conditions) == 2
    assert {c.op for c in q.conditions} == {"<", "<="}
    # nested: (a AND (b OR c))
    q2 = parse_query(
        "SELECT COUNT(*) FROM lineitem WHERE "
        "(lineitem.l_tax < 0.05 AND "
        "(lineitem.l_quantity < 5 OR lineitem.l_quantity > 45))",
        sch,
    )
    assert len(q2.conditions) == 2
    assert sorted(c.op for c in q2.conditions) == ["<", "OR"]


def test_join_shaped_disjunct_rejected():
    sch = tpch_like_schema()
    with pytest.raises(ValueError, match="join predicates"):
        parse_query(
            "SELECT COUNT(*) FROM orders, lineitem WHERE "
            "orders.o_orderkey = lineitem.l_orderkey AND "
            "(lineitem.l_quantity = 5 OR lineitem.l_orderkey = orders.o_orderkey)",
            sch,
        )


def test_conjunction_inside_or_group_rejected():
    sch = tpch_like_schema()
    with pytest.raises(ValueError, match="conjunctions inside"):
        parse_query(
            "SELECT COUNT(*) FROM lineitem WHERE "
            "(lineitem.l_quantity < 5 AND lineitem.l_tax < 0.05 "
            "OR lineitem.l_quantity > 45)",
            sch,
        )


def test_cross_table_or_with_shared_column_names(spark):
    """Post-join OR filters bind through scan lineage, so two tables
    sharing a column name stay unambiguous."""
    from deepdb_public_spark.plans.compiler import ExactCompiler
    from deepdb_public_spark.plans.query import Condition, Query
    from deepdb_public_spark.plans.schema import SchemaGraph, Table

    a = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "id int, status int"
    )
    b = spark.createDataFrame(
        [(i, i % 3, i % 5) for i in range(300)], "bid int, aid int, status int"
    )
    g = SchemaGraph()
    g.add_table(Table("ta", ["id"]))
    g.add_table(Table("tb", ["bid"]))
    rel = g.add_relationship("tb", "aid", "ta", "id")
    comp = ExactCompiler(g, {"ta": a, "tb": b})
    q = Query(
        table_set={"ta", "tb"},
        relationship_set={rel.identifier},
        conditions=[
            Condition(
                None, None, "OR",
                [Condition("ta", "status", "=", 2),
                 Condition("tb", "status", "=", 1)],
            )
        ],
    )
    got = comp.compile(q).collect()[0][0]
    want = (
        b.alias("b").join(a.alias("a"), F.col("b.aid") == F.col("a.id"))
        .filter("a.status = 2 OR b.status = 1").count()
    )
    assert got == want


def test_ci_harness_covers_cross_column_or(li_engine):
    """Round 5: COUNT/SUM/AVG CIs under OR are model-plane now, so the
    harness evaluates them all; round 8: COUNT(DISTINCT)-over-OR gets
    Poisson-occupancy moments, so nothing is skipped anymore."""
    from deepdb_public_spark.evaluation import evaluate_confidence_intervals

    eng = li_engine
    summary = evaluate_confidence_intervals(
        eng,
        [
            "SELECT COUNT(*) AS cnt FROM lineitem WHERE lineitem.l_quantity < 25",
            "SELECT COUNT(*) AS cnt FROM lineitem WHERE "
            "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)",
            "SELECT AVG(lineitem.l_quantity) AS a FROM lineitem WHERE "
            "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)",
            "SELECT COUNT(DISTINCT lineitem.l_returnflag) AS d FROM lineitem "
            "WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)",
        ],
    )
    assert summary["skipped_queries"] == []
    assert summary["n_cells"] >= 4


def test_or_ci_having_filters_groups(li_engine):
    """Round 8: CIs with HAVING under cross-column OR (was a refusal)
    — group membership decided on point estimates, matching aqp's
    visible set; surviving intervals cover the exact counts."""
    eng = li_engine
    sql = (
        "SELECT lineitem.l_returnflag, COUNT(*) AS cnt FROM lineitem "
        "WHERE (lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08) "
        "GROUP BY lineitem.l_returnflag HAVING cnt > 2000"
    )
    q = eng.parse(sql)
    visible_aqp = {r["l_returnflag"] for r in eng.ensemble.aqp(q)}
    cis = {r["l_returnflag"]: r for r in eng.ensemble.confidence_interval(q, confidence=0.99)}
    assert set(cis) == visible_aqp
    trues = {
        r["l_returnflag"]: r["cnt"] for r in eng.query(q).collect()
    }
    # threshold far from every group's count => same membership as exact
    assert set(cis) == set(trues)
    for g, ci in cis.items():
        assert ci["lo"] <= trues[g] <= ci["hi"], (g, ci, trues[g])
