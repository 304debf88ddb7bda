"""D8 join-subtree enumeration: a correlated 3-table chain gets a
joint model and beats the independence estimate."""

from __future__ import annotations

import pytest

from deepdb_public_spark.plans.query import Condition, Query
from deepdb_public_spark.plans.schema import SchemaGraph, Table
from deepdb_public_spark.spn.ensemble import (
    SPNEnsemble,
    create_rdc_ensemble,
    score_fk_edges,
)
from deepdb_public_spark.spn.learn import LearnParams
from deepdb_public_spark.spn.trainer import train_spn_model


@pytest.fixture(scope="module")
def chain(spark):
    """a(aid, x) <- b(bid, b_aid, y) <- c(cid, c_bid, z) with x, y, z
    perfectly correlated along the chain (y copies the parent's x,
    z copies the parent's y)."""
    a = [(i, float(i % 2)) for i in range(1000)]
    b = [(2 * i + j, i, float(i % 2)) for i in range(1000) for j in (0, 1)]
    c = [(2 * bid + j, bid, y) for bid, _aid, y in b for j in (0, 1)]
    catalog = {
        "a": spark.createDataFrame(a, "aid int, x double"),
        "b": spark.createDataFrame(b, "bid int, b_aid int, y double"),
        "c": spark.createDataFrame(c, "cid int, c_bid int, z double"),
    }
    g = SchemaGraph()
    g.add_table(Table("a", ["aid"]))
    g.add_table(Table("b", ["bid"]))
    g.add_table(Table("c", ["cid"]))
    g.add_relationship("b", "b_aid", "a", "aid")
    g.add_relationship("c", "c_bid", "b", "bid")
    return catalog, g


def test_edge_probe_excludes_keys_and_finds_correlation(spark, chain):
    catalog, g = chain
    scores = score_fk_edges(catalog, g, ["a", "b", "c"], rdc_sample=2000)
    assert scores["b.b_aid = a.aid"] > 0.6  # y copies x
    assert scores["c.c_bid = b.bid"] > 0.6  # z copies y


def test_correlated_chain_gets_joint_model_and_beats_independence(
    spark, chain
):
    catalog, g = chain
    params = LearnParams(min_instances_slice=200)
    ens = create_rdc_ensemble(
        catalog,
        g,
        ["a", "b", "c"],
        max_join_models=2,
        max_no_joins=2,
        rdc_sample=2000,
        sample_budget=20_000,
        params=params,
    )
    joint = [m for m in ens.models if m.table_set == {"a", "b", "c"}]
    assert joint, "3-table subtree was not selected"

    q = Query(
        table_set={"a", "b", "c"},
        relationship_set={"b.b_aid = a.aid", "c.c_bid = b.bid"},
        conditions=[
            Condition("a", "x", "=", 1),
            Condition("c", "z", "=", 1),
        ],
    )
    true = 2000.0  # 500 a-rows with x=1 -> 1000 b -> 2000 c, all z=1
    est_joint = ens.cardinality(q)

    singles = SPNEnsemble(g)
    for t in ("a", "b", "c"):
        singles.add_model(train_spn_model(catalog, g, {t}, 20_000, params))
    est_indep = singles.cardinality(q)  # factorized: assumes x ⊥ z

    qerr_joint = max(est_joint / true, true / max(est_joint, 1e-9))
    qerr_indep = max(est_indep / true, true / max(est_indep, 1e-9))
    assert qerr_joint < 1.3
    assert qerr_indep > 1.5  # x=1 implies z=1; independence halves it
    assert qerr_joint < qerr_indep


@pytest.fixture(scope="module")
def star(spark):
    """a(aid, x) with children b(y = parent x, correlated) and
    d(w, independent of x): the rdc_spn_selection scenario — two
    2-table models tie on condition coverage, only one captures a
    correlated condition pair jointly."""
    a = [(i, float(i % 2)) for i in range(2000)]
    b = [(i, i, float(i % 2)) for i in range(2000)]          # y == x
    d = [(i, i, float(1 if i % 4 >= 2 else 0)) for i in range(2000)]  # w ⊥ x
    catalog = {
        "a": spark.createDataFrame(a, "aid int, x double"),
        "b": spark.createDataFrame(b, "bid int, b_aid int, y double"),
        "d": spark.createDataFrame(d, "did int, d_aid int, w double"),
    }
    g = SchemaGraph()
    g.add_table(Table("a", ["aid"]))
    g.add_table(Table("b", ["bid"]))
    g.add_table(Table("d", ["did"]))
    g.add_relationship("b", "b_aid", "a", "aid")
    g.add_relationship("d", "d_aid", "a", "aid")
    return catalog, g


def test_compute_pairwise_rdc_separates_pairs(spark, star):
    from deepdb_public_spark.spn.ensemble import compute_pairwise_rdc

    catalog, g = star
    pairwise = compute_pairwise_rdc(catalog, g, ["a", "b", "d"], rdc_sample=2000)
    assert pairwise[frozenset(("x", "y"))] > 0.6
    assert pairwise.get(frozenset(("x", "w")), 0.0) < 0.3


def test_rdc_spn_selection_prefers_correlated_anchor(spark, star):
    """With pairwise RDC enabled, the factorization anchor that models
    the correlated condition pair (x, y) jointly outranks the anchor
    that only covers the independent pair (x, w) — the reference's
    rdc_spn_selection behavior. The artifact survives save/load."""
    from deepdb_public_spark.plans.query import Condition, Query
    from deepdb_public_spark.spn.ensemble import compute_pairwise_rdc

    catalog, g = star
    params = LearnParams(min_instances_slice=200)
    ens = SPNEnsemble(g)
    # m_ad FIRST: the rdc-free tie-break (model order) picks it
    ens.add_model(train_spn_model(catalog, g, {"a", "d"}, 20_000, params))
    ens.add_model(train_spn_model(catalog, g, {"a", "b"}, 20_000, params))

    q = Query(
        table_set={"a", "b", "d"},
        relationship_set={"b.b_aid = a.aid", "d.d_aid = a.aid"},
        conditions=[
            Condition("a", "x", "=", 1),
            Condition("b", "y", "=", 1),
            Condition("d", "w", "=", 1),
        ],
    )
    _key, first, piece = ens._rank_first_factors(q)[0]
    assert first.table_set == {"a", "d"}  # order tie-break, no rdc

    pairwise = compute_pairwise_rdc(catalog, g, ["a", "b", "d"], rdc_sample=2000)
    ens.enable_rdc_selection(pairwise)
    _key, first, piece = ens._rank_first_factors(q)[0]
    assert first.table_set == {"a", "b"}  # correlated pair wins
    assert piece == frozenset({"a", "b"})

    # estimate stays within budget with the rdc-chosen anchor
    est = ens.cardinality(q)
    true = 500.0  # x=1: 1000 a-rows; w=1 on half of those joins
    assert max(est / true, true / est) < 1.5

    # persistence carries the artifact
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ens.pkl")
        ens.save(path)
        back = SPNEnsemble.load(path, g)
        assert back.pairwise_rdc == pairwise


def test_rdc_ties_use_average_ranks():
    """Round-7 review fix: ordinal ranks turned every tie run into a
    shared row-index ramp — two INDEPENDENT skewed binary columns
    scored RDC 0.93 and constant columns 0.99+, blocking Product
    splits. Average ranks keep independents near 0 and real
    dependence near 1."""
    import numpy as np

    from deepdb_public_spark.spn.rdc import rdc

    rng = np.random.default_rng(0)
    a = (rng.random(5000) < 0.05).astype(float)
    b = (rng.random(5000) < 0.05).astype(float)
    assert rdc(a, b) < 0.15, "independent skewed binaries must score low"
    const = np.ones(5000)
    assert rdc(const, b) < 0.15
    assert rdc(const, np.ones(5000)) < 0.15
    x = rng.random(5000)
    y = x * 2 + rng.random(5000) * 0.01
    assert rdc(x, y) > 0.9, "real dependence must stay high"
