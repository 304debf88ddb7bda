"""B10 per-node variance propagation: CI widths must track the true
sampling variability of the estimator (bootstrap reference)."""

from __future__ import annotations

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
from deepdb_public_spark.spn.model import SPNModel
from deepdb_public_spark.spn.nodes import evaluate_with_variance


def _model(data, cols, mis=300):
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


def _gen(rng, n):
    # mixture: two clusters with different x distributions
    comp = rng.integers(0, 2, n)
    x = np.where(comp == 0, rng.integers(0, 10, n), rng.integers(20, 40, n))
    y = comp * 5 + rng.integers(0, 3, n)
    return np.stack([x.astype(float), y.astype(float)], axis=1)


def test_count_ci_width_matches_bootstrap():
    rng = np.random.default_rng(7)
    n = 3000
    base = _gen(rng, n)
    m = _model(base, ["x", "y"])
    q = Query(table_set={"t"})
    q.add_where_condition(Condition("t", "x", ">=", 20))

    cond = m.conditions_to_ranges(q)
    est, var = evaluate_with_variance(m.root, cond)
    our_std = np.sqrt(var)

    # bootstrap: retrain on resamples, std of the resulting estimates
    boots = []
    for b in range(40):
        res = base[rng.integers(0, n, n)]
        mb = _model(res, ["x", "y"])
        boots.append(evaluate_with_variance(mb.root, cond)[0])
    boot_std = np.std(boots)
    assert our_std == pytest.approx(boot_std, rel=1.5)
    assert 0.3 * boot_std < our_std < 3.0 * boot_std


def test_ci_coverage_at_three_levels():
    """True value inside the CI at roughly the nominal rate over
    repeated training draws from the population."""
    rng = np.random.default_rng(8)
    pop = _gen(rng, 200_000)
    true_p = (pop[:, 0] >= 20).mean()

    for conf, z_ok in ((0.9, 0.75), (0.95, 0.85), (0.99, 0.9)):
        hits = 0
        trials = 30
        for tdx in range(trials):
            samp = pop[rng.integers(0, len(pop), 2000)]
            m = _model(samp, ["x", "y"])
            q = Query(query_type=QueryType.AQP, table_set={"t"})
            q.add_where_condition(Condition("t", "x", ">=", 20))
            q.aggregations.append(
                AggOperation(
                    AggregationOperationType.AGGREGATION,
                    AggregationType.COUNT,
                    alias="cnt",
                )
            )
            (ci,) = m.confidence_interval(q, confidence=conf)
            truth = true_p * m.full_join_size
            if ci["lo"] <= truth <= ci["hi"]:
                hits += 1
        assert hits / trials >= z_ok, f"conf={conf}: coverage {hits}/{trials}"


def test_sum_and_avg_cis_contain_truth():
    rng = np.random.default_rng(9)
    data = _gen(rng, 5000)
    m = _model(data, ["x", "y"])
    q = Query(query_type=QueryType.AQP, table_set={"t"})
    q.add_where_condition(Condition("t", "y", ">=", 5))
    q.aggregations.append(
        AggOperation(
            AggregationOperationType.AGGREGATION,
            AggregationType.SUM,
            [("t", "x")],
            alias="s",
        )
    )
    q.aggregations.append(
        AggOperation(
            AggregationOperationType.AGGREGATION,
            AggregationType.AVG,
            [("t", "x")],
            alias="a",
        )
    )
    mask = data[:, 1] >= 5
    true_sum = data[mask, 0].sum()
    true_avg = data[mask, 0].mean()
    ci_s, ci_a = m.confidence_interval(q, confidence=0.99)
    # model trained on the full data: estimates are near-exact, CIs
    # must still be finite, positive-width and contain the truth
    assert ci_s["lo"] <= true_sum <= ci_s["hi"]
    assert ci_a["lo"] <= true_avg <= ci_a["hi"]
    assert 0 < ci_s["hi"] - ci_s["lo"] < 2 * true_sum


def test_grouped_cis_cover_per_group_truth():
    """GROUP BY CIs: one row per (group, aggregate); each 0.99 CI
    contains the group's true value on a model trained on the full
    data."""
    rng = np.random.default_rng(11)
    n = 6000
    g = rng.integers(0, 3, n).astype(float)          # group column, 3 values
    x = rng.normal(10 + 5 * g, 2.0, n)               # mean depends on group
    data = np.column_stack([x, g])
    m = _model(data, ["x", "g"])
    q = Query(query_type=QueryType.AQP, table_set={"t"})
    q.group_bys.append(("t", "g"))
    q.aggregations.append(
        AggOperation(
            AggregationOperationType.AGGREGATION,
            AggregationType.COUNT, [], alias="c",
        )
    )
    q.aggregations.append(
        AggOperation(
            AggregationOperationType.AGGREGATION,
            AggregationType.AVG, [("t", "x")], alias="a",
        )
    )
    rows = m.confidence_interval(q, confidence=0.99)
    assert len(rows) == 6  # 3 groups x 2 aggregates
    for gv in (0.0, 1.0, 2.0):
        mask = data[:, 1] == gv
        true_by_agg = {"c": mask.sum(), "a": data[mask, 0].mean()}
        for row in rows:
            if row["g"] == gv:
                t = true_by_agg[row["agg"]]
                assert row["lo"] <= t <= row["hi"], (gv, row, t)
                assert row["hi"] > row["lo"]


def test_z_value_exact_outside_table():
    """Levels near-but-not-equal to a table key compute the exact
    quantile (0.995 used to silently get the 0.99 z of 2.576)."""
    from deepdb_public_spark.spn.model import z_value

    assert z_value(0.995) == pytest.approx(2.807, abs=0.01)
    assert z_value(0.95) == pytest.approx(1.96, abs=1e-9)
    assert z_value(0.98) == pytest.approx(2.326, abs=0.01)

