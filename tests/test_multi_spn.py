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
