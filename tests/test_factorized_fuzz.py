"""Seeded fuzz band for the round-6 factorized surface: AQP and CIs
over table sets NO single model covers (models {customer, orders} and
{lineitem}; every query spans {orders, lineitem}), grouped and
ungrouped, with and without cross-column OR. Each estimate must track
the exact plane within the documented budgets — the guard rail for
the factorization's independence assumptions across a wider predicate
space than the targeted tests.

Also pins nodes.evaluate_many ≡ nodes.evaluate per batch item (the
plan-time batch pricing must be a pure vectorization, never a
different answer).
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import SF_SMOKE

COUNT_REL_BUDGET = 0.35
SUM_REL_BUDGET = 0.35
AVG_REL_BUDGET = 0.15
MIN_GROUP_ROWS = 30  # tiny groups are dominated by sampling noise


@pytest.fixture(scope="module")
def two_model_engine(spark):
    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, SF_SMOKE)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(
        train_spn_model(eng.catalog, eng.schema, {"customer", "orders"}, 50_000)
    )
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 50_000))
    eng.ensemble = ens
    return eng


def _gen_queries(seed: int = 20260815, n: int = 36) -> list[str]:
    rng = random.Random(seed)
    o_preds = [
        "orders.o_orderstatus = 'F'",
        "orders.o_orderstatus <> 'O'",
        "orders.o_totalprice > {}".format,
    ]
    l_preds = [
        "lineitem.l_discount <= 0.0{}".format,
        "lineitem.l_quantity < {}".format,
        "lineitem.l_quantity >= {}".format,
    ]
    aggs = [
        "COUNT(*) AS v",
        "SUM(lineitem.l_quantity) AS v",
        "AVG(lineitem.l_quantity) AS v",
        "SUM(lineitem.l_extendedprice) AS v",
    ]
    out = []
    for _ in range(n):
        agg = rng.choice(aggs)
        op = rng.choice(o_preds)
        o_pred = op(rng.choice([100000, 150000, 200000])) if callable(op) else op
        lp = rng.choice(l_preds)
        l_pred = (
            lp(rng.choice([4, 6, 8]))
            if "discount" in lp("")
            else lp(rng.choice([15, 25, 35]))
        )
        where = f"{o_pred} AND {l_pred}"
        if rng.random() < 0.35:
            where = f"({o_pred} OR {l_pred})"
        group = (
            " GROUP BY lineitem.l_returnflag" if rng.random() < 0.5 else ""
        )
        out.append(
            f"SELECT {agg} FROM orders, lineitem "
            f"WHERE orders.o_orderkey = lineitem.l_orderkey AND {where}"
            f"{group}"
        )
    return out


def test_factorized_aqp_fuzz_band(two_model_engine):
    eng = two_model_engine
    worst: list[tuple[float, str]] = []
    n_checked = 0
    for sql in _gen_queries():
        is_avg = sql.startswith("SELECT AVG")
        budget = AVG_REL_BUDGET if is_avg else (
            COUNT_REL_BUDGET if "COUNT" in sql.split(" FROM ")[0] else SUM_REL_BUDGET
        )
        grouped = "GROUP BY" in sql
        est_rows = eng.ensemble.aqp(eng.parse(sql))
        exact_rows = [r.asDict() for r in eng.query(sql).collect()]
        if grouped:
            gcol = "l_returnflag"
            est = {r[gcol]: float(r["v"]) for r in est_rows}
            # group row-count guard needs the exact COUNT per group
            cnt_sql = sql.split(" FROM ")[0].replace(
                sql.split("SELECT ")[1].split(" FROM")[0], "COUNT(*) AS v"
            ) + " FROM " + sql.split(" FROM ", 1)[1]
            cnts = {
                r[gcol]: int(r["v"])
                for r in eng.query(cnt_sql).collect()
            }
            for r in exact_rows:
                g = r[gcol]
                if cnts.get(g, 0) < MIN_GROUP_ROWS:
                    continue
                true = float(r["v"])
                got = est.get(g)
                assert got is not None, (sql, g)
                rel = abs(got - true) / max(abs(true), 1e-9)
                worst.append((rel, f"{sql} [{g}]"))
                assert rel <= budget, (sql, g, got, true)
                n_checked += 1
        else:
            (er,) = est_rows
            true = float(exact_rows[0]["v"])
            if true == 0:
                continue
            rel = abs(float(er["v"]) - true) / abs(true)
            worst.append((rel, sql))
            assert rel <= budget, (sql, er["v"], true)
            n_checked += 1
    assert n_checked >= 40, n_checked  # the band actually exercised cases


def test_factorized_distinct_fuzz_band(two_model_engine):
    """Round-7 surface: COUNT(DISTINCT) across models — seeded
    predicate sweep over ungrouped/grouped/OR shapes, each estimate
    within a 1.3 q-error of the exact plane (distinct domains here
    are sample-covered, so the factorized per-value masses should be
    near-exact; the band guards the chain-scaling against predicate
    drift)."""
    import random

    rng = random.Random(20260815)
    eng = two_model_engine
    o_preds = [
        "orders.o_orderstatus = 'F'",
        "orders.o_totalprice > 150000",
        "orders.o_totalprice <= 100000",
    ]
    l_preds = [
        "lineitem.l_discount <= 0.06",
        "lineitem.l_quantity < 30",
        "lineitem.l_quantity >= 10",
    ]
    n_checked = 0
    for _ in range(12):
        op, lp = rng.choice(o_preds), rng.choice(l_preds)
        where = f"{op} AND {lp}"
        if rng.random() < 0.3:
            where = f"({op} OR {lp})"
        group = " GROUP BY lineitem.l_returnflag" if rng.random() < 0.4 else ""
        sql = (
            "SELECT COUNT(DISTINCT lineitem.l_quantity) AS v "
            "FROM orders, lineitem "
            f"WHERE orders.o_orderkey = lineitem.l_orderkey AND {where}"
            f"{group}"
        )
        est_rows = eng.ensemble.aqp(eng.parse(sql))
        exact_rows = [r.asDict() for r in eng.query(sql).collect()]
        if group:
            est = {r["l_returnflag"]: float(r["v"]) for r in est_rows}
            for r in exact_rows:
                true = float(r["v"])
                if true < 5:  # tiny domains are threshold-noise bound
                    continue
                got = est.get(r["l_returnflag"])
                assert got is not None, (sql, r)
                qerr = max(got / true, true / max(got, 1e-9))
                assert qerr <= 1.3, (sql, r, got)
                n_checked += 1
        else:
            true = float(exact_rows[0]["v"])
            got = float(est_rows[0]["v"])
            qerr = max(got / max(true, 1), true / max(got, 1e-9))
            assert qerr <= 1.3, (sql, got, true)
            n_checked += 1
    assert n_checked >= 12, n_checked


def test_evaluate_many_matches_scalar_evaluate(two_model_engine):
    """The batch pass is a pure vectorization: for every sub-query in
    a seeded set, evaluate_many's vector entry equals the scalar
    evaluate result bit-for-bit."""
    import numpy as np

    from deepdb_public_spark.spn.nodes import evaluate, evaluate_many

    eng = two_model_engine
    model = next(
        m for m in eng.ensemble.models if m.table_set == {"lineitem"}
    )
    sqls = [
        "SELECT COUNT(*) AS c FROM lineitem WHERE lineitem.l_quantity < 20",
        "SELECT COUNT(*) AS c FROM lineitem WHERE lineitem.l_discount > 0.05",
        "SELECT COUNT(*) AS c FROM lineitem "
        "WHERE lineitem.l_returnflag = 'A' AND lineitem.l_quantity >= 10",
        "SELECT COUNT(*) AS c FROM lineitem "
        "WHERE lineitem.l_quantity BETWEEN 5 AND 25",
    ]
    conds = []
    for sql in sqls:
        q = eng.parse(sql)
        cond = model.conditions_to_ranges(q)
        extra, feats = model.correction_factors(q)
        cond.update(extra)
        conds.append((cond, feats))
    vec = evaluate_many(model.root, conds)
    for (cond, feats), v in zip(conds, vec):
        assert float(evaluate(model.root, cond, feats)) == float(v)
    assert len(vec) == len(conds) and np.all(np.isfinite(vec))


def test_cross_piece_grouped_fuzz_band(two_model_engine):
    """Round-8 surface: grouped AQP whose GROUP BY columns span models
    with no covering anchor (orders.o_orderstatus x
    lineitem.l_returnflag over {customer,orders} + {lineitem}) —
    seeded sweep over COUNT/SUM/AVG and AND/OR predicates; every
    well-populated group within the documented budgets."""
    import random

    rng = random.Random(20260815)
    eng = two_model_engine
    o_preds = [
        "orders.o_totalprice > 100000",
        "orders.o_totalprice <= 300000",
    ]
    l_preds = [
        "lineitem.l_discount <= 0.08",
        "lineitem.l_quantity < 40",
    ]
    aggs = [
        ("COUNT(*) AS v", COUNT_REL_BUDGET),
        ("SUM(lineitem.l_quantity) AS v", SUM_REL_BUDGET),
        ("AVG(lineitem.l_extendedprice) AS v", AVG_REL_BUDGET),
    ]
    n_checked = 0
    for _ in range(10):
        agg, budget = rng.choice(aggs)
        op, lp = rng.choice(o_preds), rng.choice(l_preds)
        where = f"{op} AND {lp}"
        if rng.random() < 0.3:
            where = f"({op} OR {lp})"
        sql = (
            f"SELECT {agg} FROM orders, lineitem "
            f"WHERE orders.o_orderkey = lineitem.l_orderkey AND {where} "
            "GROUP BY orders.o_orderstatus, lineitem.l_returnflag"
        )
        est = {
            (r["o_orderstatus"], r["l_returnflag"]): float(r["v"])
            for r in eng.ensemble.aqp(eng.parse(sql))
        }
        cnt_sql = (
            "SELECT COUNT(*) AS c, " + agg + " FROM orders, lineitem "
            f"WHERE orders.o_orderkey = lineitem.l_orderkey AND {where} "
            "GROUP BY orders.o_orderstatus, lineitem.l_returnflag"
        )
        for r in eng.query(cnt_sql).collect():
            if int(r["c"]) < MIN_GROUP_ROWS:
                continue
            key = (r["o_orderstatus"], r["l_returnflag"])
            true = float(r["v"])
            got = est.get(key)
            assert got is not None, (sql, key)
            rel = abs(got - true) / max(abs(true), 1e-9)
            assert rel <= budget, (sql, key, got, true, rel)
            n_checked += 1
    assert n_checked >= 40, n_checked
