"""B10 confidence intervals, D8 rdc-based ensemble, §4.3 join hints."""

from __future__ import annotations

import pytest

from deepdb_public_spark.engine import Engine
from deepdb_public_spark.spn.ensemble import SPNEnsemble, create_rdc_ensemble
from deepdb_public_spark.spn.trainer import train_spn_model
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, SF_CORRECT)


@pytest.fixture(scope="module")
def li_model(engine):
    return train_spn_model(engine.catalog, engine.schema, {"lineitem"}, 60_000)


def test_confidence_intervals_cover_truth(engine, li_model):
    cases = [
        ("SELECT COUNT(*) AS cnt FROM lineitem WHERE lineitem.l_quantity < 25", "cnt"),
        (
            "SELECT SUM(lineitem.l_extendedprice) AS s FROM lineitem "
            "WHERE lineitem.l_discount <= 0.05",
            "s",
        ),
        (
            "SELECT AVG(lineitem.l_quantity) AS a FROM lineitem "
            "WHERE lineitem.l_returnflag = 'A'",
            "a",
        ),
    ]
    for sql, alias in cases:
        q = engine.parse(sql)
        ci = li_model.confidence_interval(q, 0.95)[0]
        true = engine.query(q).collect()[0][0]
        assert ci["lo"] <= ci["est"] <= ci["hi"]
        # 95% CI from a 60k exact-fit sample: truth must fall inside
        assert ci["lo"] <= true <= ci["hi"], f"{alias}: {true} outside {ci}"
        assert ci["hi"] - ci["lo"] < 2 * abs(true) + 1, f"{alias}: CI uselessly wide"


def test_ci_width_shrinks_with_sample_size(engine):
    small = train_spn_model(engine.catalog, engine.schema, {"lineitem"}, 5_000)
    big = train_spn_model(engine.catalog, engine.schema, {"lineitem"}, 60_000)
    q = engine.parse(
        "SELECT COUNT(*) AS cnt FROM lineitem WHERE lineitem.l_quantity < 25"
    )
    ws = [m.confidence_interval(q)[0] for m in (small, big)]
    assert (ws[0]["hi"] - ws[0]["lo"]) > (ws[1]["hi"] - ws[1]["lo"])


def test_rdc_ensemble_selects_correlated_edge(engine):
    ens = create_rdc_ensemble(
        engine.catalog,
        engine.schema,
        ["orders", "lineitem", "customer"],
        max_join_models=1,
        rdc_sample=3_000,
        sample_budget=30_000,
    )
    # 3 single-table models always; at most 1 join model
    assert len(ens.models) in (3, 4)
    q = engine.parse(
        "SELECT COUNT(*) AS cnt FROM customer WHERE customer.c_mktsegment = 'BUILDING'"
    )
    est = ens.cardinality(q)
    true = engine.query(q).collect()[0][0]
    assert max(est / true, true / est) <= 1.2


def test_estimate_hints_broadcast_filtered_fact(engine, li_model):
    """With hints on, a selectively-filtered fact table side becomes a
    broadcast join even though it is not a declared dimension."""
    ens = SPNEnsemble(engine.schema)
    ens.add_model(li_model)
    ens.add_model(
        train_spn_model(engine.catalog, engine.schema, {"orders"}, 30_000)
    )
    engine.ensemble = ens
    sql = (
        "SELECT COUNT(*) AS cnt FROM orders, lineitem "
        "WHERE orders.o_orderkey = lineitem.l_orderkey "
        "AND orders.o_totalprice > 400000"
    )
    # disable size-based auto-broadcast: at fixture scale everything
    # fits under the default threshold, which is exactly NOT the
    # situation the hint exists for (100 TB fact-fact joins)
    spark = engine.spark
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_before = engine.query(sql)._jdf.queryExecution().executedPlan().toString()
        engine.enable_estimate_hints()
        plan_after = engine.query(sql)._jdf.queryExecution().executedPlan().toString()
    finally:
        engine.compiler.cardinality_estimator = None
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the estimator added a broadcast hint on the filtered orders side;
    # without it two fact tables shuffle-join
    assert "BroadcastHashJoin" in plan_after
    assert "BroadcastHashJoin" not in plan_before
    assert "SortMergeJoin" in plan_before or "ShuffledHashJoin" in plan_before
