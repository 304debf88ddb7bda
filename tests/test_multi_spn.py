"""Multi-SPN cardinality factorization (B11, reference:
spn_ensemble.py::_greedily_select_first_cardinality_spn +
evaluate_factors): queries whose table set no single model covers are
answered by a product of cross-model factors."""

from __future__ import annotations

import pytest

from deepdb_public_spark.engine import Engine
from deepdb_public_spark.plans.query import Condition, Query
from deepdb_public_spark.plans.schema import SchemaGraph, Table
from deepdb_public_spark.spn.ensemble import SPNEnsemble
from deepdb_public_spark.spn.learn import LearnParams
from deepdb_public_spark.spn.trainer import train_spn_model
from tests.conftest import SF_SMOKE


def _qerr(est: float, true: float) -> float:
    return max(est / max(true, 1), true / max(est, 1e-9))


def test_fanout_weighted_child_expansion_beats_uniform(spark):
    """Parents whose group correlates with fanout: the factorized
    estimate must use the boundary multiplier (grp='A' parents have
    10 children each, 'B' parents 1), not the uniform average."""
    parents = [(i, "A" if i < 500 else "B") for i in range(1000)]
    children = []
    cid = 0
    for pid, grp in parents:
        for _ in range(10 if grp == "A" else 1):
            children.append((cid, pid, float(cid % 7)))
            cid += 1
    pdf = spark.createDataFrame(parents, "pid int, grp string")
    cdf = spark.createDataFrame(children, "cid int, pid int, v double")

    g = SchemaGraph()
    g.add_table(Table("parent", ["pid"]))
    g.add_table(Table("child", ["cid"]))
    rel = g.add_relationship("child", "pid", "parent", "pid")
    catalog = {"parent": pdf, "child": cdf}
    params = LearnParams(min_instances_slice=200)

    ens = SPNEnsemble(g)
    ens.add_model(train_spn_model(catalog, g, {"parent"}, 50_000, params))
    ens.add_model(train_spn_model(catalog, g, {"child"}, 50_000, params))

    q = Query(
        table_set={"parent", "child"},
        relationship_set={rel.identifier},
        conditions=[Condition("parent", "grp", "=", "A")],
    )
    est = ens.cardinality(q)
    true = 500 * 10
    assert est == pytest.approx(true, rel=0.2)
    # the uniform-fanout estimate would be 500 * 5500/1000 = 2750
    assert abs(est - true) < abs(2750 - true)


def test_factorized_three_way_join_fixture(spark):
    """customer JOIN orders JOIN lineitem answered from a
    {orders,lineitem} model x a {customer} model (the verdict's m03
    acceptance case)."""
    eng = Engine(spark, SF_SMOKE)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(
        train_spn_model(eng.catalog, eng.schema, {"orders", "lineitem"}, 50_000)
    )
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"customer"}, 50_000))

    for sql in [
        "SELECT COUNT(*) AS cnt FROM customer, orders, lineitem "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND orders.o_orderkey = lineitem.l_orderkey "
        "AND customer.c_mktsegment = 'BUILDING' AND lineitem.l_quantity < 25",
        "SELECT COUNT(*) AS cnt FROM customer, orders, lineitem "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND orders.o_orderkey = lineitem.l_orderkey "
        "AND customer.c_acctbal > 5000",
    ]:
        q = eng.parse(sql)
        # no single model covers the 3-table set -> factorized path
        with pytest.raises(ValueError):
            ens.select_model(q)
        est = ens.cardinality(q)
        true = eng.query(q).collect()[0][0]
        assert _qerr(est, true) < 2.0, f"{sql}: est={est} true={true}"


def test_exploit_overlapping_conditions_on_shared_scope(spark):
    """A 3-table chain A <- B <- C where B's group is a copy of its
    parent A's group (perfect cross-table correlation). The anchor
    model {B,C} covers the B and C conditions; expanding to A through
    the {A,B} model must condition the factor on the SHARED B
    predicate (reference: exploit_overlapping) — the unconditioned
    factor P(ag='X') = 0.5 would halve the estimate (q-error 2)."""
    a_rows = [(i, "X" if i < 500 else "Y") for i in range(1000)]
    b_rows, c_rows = [], []
    bid = cid = 0
    for aid, ag in a_rows:
        for _ in range(2):
            b_rows.append((bid, aid, ag))  # bg == parent's ag
            for _ in range(3):
                c_rows.append((cid, bid, float(cid % 7)))
                cid += 1
            bid += 1
    adf = spark.createDataFrame(a_rows, "aid int, ag string")
    bdf = spark.createDataFrame(b_rows, "bid int, b_aid int, bg string")
    cdf = spark.createDataFrame(c_rows, "cid int, c_bid int, cv double")

    g = SchemaGraph()
    g.add_table(Table("ta", ["aid"]))
    g.add_table(Table("tb", ["bid"]))
    g.add_table(Table("tc", ["cid"]))
    r_ba = g.add_relationship("tb", "b_aid", "ta", "aid")
    r_cb = g.add_relationship("tc", "c_bid", "tb", "bid")
    catalog = {"ta": adf, "tb": bdf, "tc": cdf}
    params = LearnParams(min_instances_slice=200)

    ens = SPNEnsemble(g)
    # {B,C} first so it anchors (same cond coverage as {A,B})
    ens.add_model(train_spn_model(catalog, g, {"tb", "tc"}, 50_000, params))
    ens.add_model(train_spn_model(catalog, g, {"ta", "tb"}, 50_000, params))
    ens.add_model(train_spn_model(catalog, g, {"ta"}, 50_000, params))

    q = Query(
        table_set={"ta", "tb", "tc"},
        relationship_set={r_ba.identifier, r_cb.identifier},
        conditions=[
            Condition("ta", "ag", "=", "X"),
            Condition("tb", "bg", "=", "X"),
            Condition("tc", "cv", "<=", 10.0),  # admits all C rows
        ],
    )
    est = ens.cardinality(q)
    true = 500 * 2 * 3
    # without overlap conditioning the factor is P(ag='X') = 0.5
    # -> est ~1500, q-error ~2; with it, P(ag='X' | bg='X') = 1
    assert _qerr(est, true) < 1.3, f"est={est} true={true}"


def test_max_variants_averages_factorizations(spark):
    """max_variants > 1 (reference: _cardinality_greedy's variant
    averaging) evaluates several anchor choices and averages; the
    averaged estimate stays within budget and differs from neither
    anchor by more than the anchors differ from each other."""
    eng = Engine(spark, SF_SMOKE)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(
        train_spn_model(eng.catalog, eng.schema, {"orders", "lineitem"}, 50_000)
    )
    ens.add_model(
        train_spn_model(eng.catalog, eng.schema, {"customer", "orders"}, 50_000)
    )
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"customer"}, 50_000))
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 50_000))

    sql = (
        "SELECT COUNT(*) AS cnt FROM customer, orders, lineitem "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND orders.o_orderkey = lineitem.l_orderkey "
        "AND customer.c_mktsegment = 'BUILDING' AND lineitem.l_quantity < 25"
    )
    q = eng.parse(sql)
    anchors = ens._rank_first_factors(q)
    assert len(anchors) >= 2  # both join models can anchor
    e1 = ens.cardinality(q, max_variants=1)
    e3 = ens.cardinality(q, max_variants=3)
    true = eng.query(q).collect()[0][0]
    assert _qerr(e1, true) < 2.0
    assert _qerr(e3, true) < 2.0
    # the average lies within the span of the individual variants
    singles = [
        ens._expand_factors(q, m, set(c)) for _k, m, c in anchors[:3]
    ]
    assert min(singles) - 1e-6 <= e3 <= max(singles) + 1e-6


def test_explain_factors_product_equals_estimate(spark):
    """explain_factors returns the anchor + per-edge factors whose
    product is exactly the factorized estimate; a covered query
    returns one single_model entry."""
    import math

    eng = Engine(spark, SF_SMOKE)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(
        train_spn_model(eng.catalog, eng.schema, {"orders", "lineitem"}, 50_000)
    )
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"customer"}, 50_000))

    q = eng.parse(
        "SELECT COUNT(*) AS cnt FROM customer, orders, lineitem "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND orders.o_orderkey = lineitem.l_orderkey "
        "AND customer.c_acctbal > 5000"
    )
    factors = ens.explain_factors(q)
    assert factors[0]["kind"] == "anchor"
    assert any(f["kind"] in ("parent_factor", "child_factor") for f in factors[1:])
    prod = math.prod(f["value"] for f in factors)
    assert prod == pytest.approx(ens.cardinality(q), rel=1e-9)

    q1 = eng.parse("SELECT COUNT(*) AS cnt FROM customer WHERE customer.c_acctbal > 5000")
    single = ens.explain_factors(q1)
    assert len(single) == 1 and single[0]["kind"] == "single_model"
    assert single[0]["value"] == pytest.approx(ens.cardinality(q1), rel=1e-9)

    # max_variants > 1: one trace per variant; the mean of per-variant
    # products equals the averaged estimate the caller received
    k = 3
    traced = ens.explain_factors(q, max_variants=k)
    variants = sorted({f["variant"] for f in traced})
    per_variant = [
        math.prod(f["value"] for f in traced if f["variant"] == v)
        for v in variants
    ]
    est_k = ens.cardinality(q, max_variants=k)
    assert sum(per_variant) / len(per_variant) == pytest.approx(est_k, rel=1e-9)
