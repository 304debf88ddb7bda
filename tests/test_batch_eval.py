"""B8 vectorized batch group-by evaluation + B13 factor cache."""

from __future__ import annotations

import time

import numpy as np
import pytest

from deepdb_public_spark.operators.prep import ColumnMeta, TableMeta
from deepdb_public_spark.plans.query import (
    AggOperation,
    AggregationOperationType,
    AggregationType,
    Condition,
    Query,
    QueryType,
)
from deepdb_public_spark.spn.learn import LearnParams, learn_spn
from deepdb_public_spark.spn.model import SPNModel, _identity
from deepdb_public_spark.spn.nodes import (
    distinct_values,
    evaluate,
    evaluate_groupby,
)
from deepdb_public_spark.spn.ranges import NumericRange


def _model(data: np.ndarray, cols: list[str], mis=300) -> SPNModel:
    root = learn_spn(
        data, list(range(data.shape[1])), LearnParams(min_instances_slice=mis)
    )
    meta = TableMeta("t", len(data))
    for c in cols:
        meta.columns[c] = ColumnMeta(c, "numeric", 100)
    return SPNModel(
        table_set={"t"},
        relationships=[],
        full_join_size=float(len(data)),
        column_names=cols,
        meta=meta,
        column_table={c: "t" for c in cols},
        root=root,
        sample_size=len(data),
    )


def _agg(agg_type, operands=(), alias=None):
    return AggOperation(
        AggregationOperationType.AGGREGATION,
        agg_type,
        list(operands),
        alias=alias,
    )


def test_batch_groupby_matches_per_combo_walks():
    rng = np.random.default_rng(3)
    g1 = rng.integers(0, 6, 6000).astype(float)
    g2 = rng.integers(0, 4, 6000).astype(float)
    x = (g1 * 10 + rng.integers(0, 10, 6000)).astype(float)
    m = _model(np.stack([g1, g2, x], axis=1), ["g1", "g2", "x"])

    q = Query(query_type=QueryType.AQP, table_set={"t"})
    q.add_where_condition(Condition("t", "x", ">=", 5))
    q.add_group_by("t", "g1")
    q.add_group_by("t", "g2")
    q.aggregations.append(_agg(AggregationType.COUNT, alias="cnt"))
    q.aggregations.append(_agg(AggregationType.SUM, [("t", "x")], alias="sx"))
    q.aggregations.append(_agg(AggregationType.AVG, [("t", "x")], alias="ax"))
    rows = m.aqp(q)

    # brute force: one evaluate() per combination per aggregate
    base = m.conditions_to_ranges(q)
    doms = [distinct_values(m.root, i) for i in (0, 1)]
    expected = {}
    for v1 in doms[0]:
        for v2 in doms[1]:
            cond = dict(base)
            cond[0] = NumericRange([(v1, v1, True, True)])
            cond[1] = NumericRange([(v2, v2, True, True)])
            cnt = m.full_join_size * evaluate(m.root, cond)
            if cnt < 0.5:
                continue
            sx = m.full_join_size * evaluate(m.root, cond, {2: _identity})
            expected[(v1, v2)] = (cnt, sx, sx / cnt)
    got = {(r["g1"], r["g2"]): (r["cnt"], r["sx"], r["ax"]) for r in rows}
    assert set(got) == set(expected)
    for k, (cnt, sx, ax) in expected.items():
        assert got[k][0] == pytest.approx(cnt, rel=1e-9)
        assert got[k][1] == pytest.approx(sx, rel=1e-9)
        assert got[k][2] == pytest.approx(ax, rel=1e-9)


def test_batch_groupby_1000_groups_under_2s():
    rng = np.random.default_rng(4)
    n = 60_000
    g = rng.integers(0, 1500, n).astype(float)  # ~1.5k distinct groups
    x = rng.normal(50, 10, n).round(0)
    y = rng.integers(0, 30, n).astype(float)
    m = _model(np.stack([g, x, y], axis=1), ["g", "x", "y"], mis=512)

    q = Query(query_type=QueryType.AQP, table_set={"t"})
    q.add_group_by("t", "g")
    q.aggregations.append(_agg(AggregationType.COUNT, alias="cnt"))
    q.aggregations.append(_agg(AggregationType.SUM, [("t", "x")], alias="sx"))
    t0 = time.monotonic()
    rows = m.aqp(q)
    elapsed = time.monotonic() - t0
    assert len(rows) >= 1000
    assert elapsed < 2.0, f"batch group-by took {elapsed:.2f}s"
    total = sum(r["cnt"] for r in rows)
    assert total == pytest.approx(n, rel=0.01)


def test_factor_cache_hits_and_invalidation():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 20, 4000).astype(float)
    m = _model(x.reshape(-1, 1), ["x"], mis=100)
    q = Query(table_set={"t"})
    q.add_where_condition(Condition("t", "x", ">=", 10))
    a = m.cardinality(q)
    assert len(m._eval_cache) == 1
    assert m.cardinality(q) == a  # served from cache
    m.add_dataset(np.full((500, 1), 3.0))
    assert len(m._eval_cache) == 0  # invalidated
    b = m.cardinality(q)
    assert b == pytest.approx(a, rel=0.01)  # delta is all x=3, below 10


def test_groupby_grid_cap_falls_back_to_exact(spark, monkeypatch):
    """A group-by grid past MAX_GROUPBY_CELLS raises GroupByExplosion
    on the model plane; Engine.estimate falls back to the exact plane
    (SURVEY §7.7: cap + fall back for high-cardinality groups)."""
    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn import model as spn_model
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model
    from tests.conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"orders"}, 20_000))
    eng.ensemble = ens

    sql = (
        "SELECT orders.o_orderstatus, COUNT(*) AS cnt "
        "FROM orders GROUP BY orders.o_orderstatus"
    )
    monkeypatch.setattr(spn_model, "MAX_GROUPBY_CELLS", 1)
    with pytest.raises(spn_model.GroupByExplosion):
        eng.estimate(sql, exact_fallback=False)
    rows = eng.estimate(sql)  # exact-plane fallback
    exact = {
        r["o_orderstatus"]: r["cnt"]
        for r in (x.asDict() for x in eng.query(sql).collect())
    }
    assert {r["o_orderstatus"]: r["cnt"] for r in rows} == exact
    # under the real cap the model plane answers (approximately)
    monkeypatch.setattr(spn_model, "MAX_GROUPBY_CELLS", 2_000_000)
    est_rows = eng.estimate(sql, exact_fallback=False)
    assert {r["o_orderstatus"] for r in est_rows} <= set(exact)
