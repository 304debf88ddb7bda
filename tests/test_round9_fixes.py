"""Round-9 fixes: on-demand model training closes the anchorless
grouped refusal (round-8 review 'what's missing' #2), and the driver
window / oracle coverage of parked registry entries is pinned so
rotating entries into _PRIORITY_TAIL cannot silently shed coverage
(round-8 ADVICE)."""

from __future__ import annotations

import pytest

from deepdb_public_spark.plans.query import (
    AggOperation,
    AggregationOperationType,
    AggregationType,
    Condition,
    Query,
    QueryType,
)
from deepdb_public_spark.plans.schema import SchemaGraph, Table
from deepdb_public_spark.spn.ensemble import SPNEnsemble
from deepdb_public_spark.spn.learn import LearnParams
from deepdb_public_spark.spn.model import ModelPlaneUnsupported
from deepdb_public_spark.spn.trainer import train_spn_model
from tests.conftest import SF_SMOKE


def _parent_child(spark):
    """parent(grp in {A,B}) 1->N child with grp-correlated fanout and
    a child value column — the same fixture shape test_multi_spn
    uses, small enough for sub-second training."""
    parents = [(i, "A" if i < 400 else "B") for i in range(1000)]
    children = []
    cid = 0
    for pid, grp in parents:
        for _ in range(4 if grp == "A" else 1):
            children.append((cid, pid, float(cid % 7)))
            cid += 1
    pdf = spark.createDataFrame(parents, "pid int, grp string")
    cdf = spark.createDataFrame(children, "cid int, pid int, v double")
    g = SchemaGraph()
    g.add_table(Table("parent", ["pid"]))
    g.add_table(Table("child", ["cid"]))
    rel = g.add_relationship("child", "pid", "parent", "pid")
    return {"parent": pdf, "child": cdf}, g, rel


def _grouped_count_query(g, rel):
    return Query(
        query_type=QueryType.AQP,
        table_set={"parent", "child"},
        relationship_set={rel.identifier},
        conditions=[Condition("child", "v", "<=", 5.0)],
        group_bys=[("parent", "grp")],
        aggregations=[
            AggOperation(
                AggregationOperationType.AGGREGATION,
                AggregationType.COUNT,
                [],
                alias="cnt",
            )
        ],
    )


def test_anchorless_grouped_refuses_without_on_demand(spark):
    """Baseline semantics preserved: with no model covering the
    group-by table and on-demand training NOT enabled, the grouped
    model plane must still refuse loudly."""
    catalog, g, rel = _parent_child(spark)
    params = LearnParams(min_instances_slice=200)
    ens = SPNEnsemble(g)
    ens.add_model(train_spn_model(catalog, g, {"child"}, 50_000, params))
    with pytest.raises(ModelPlaneUnsupported):
        ens.aqp(_grouped_count_query(g, rel))


def test_on_demand_training_closes_anchorless_grouped(spark):
    """With on-demand training enabled, the same anchorless grouped
    query answers: a single-table model over the missing group-by
    table is trained, registered, and reused (no retraining on the
    second query)."""
    catalog, g, rel = _parent_child(spark)
    params = LearnParams(min_instances_slice=200)
    ens = SPNEnsemble(g)
    ens.add_model(train_spn_model(catalog, g, {"child"}, 50_000, params))
    ens.enable_on_demand_training(catalog, sample_budget=50_000, params=params)

    q = _grouped_count_query(g, rel)
    rows = {r["grp"]: r["cnt"] for r in ens.aqp(q)}
    assert any(m.table_set == {"parent"} for m in ens.models)
    n_models = len(ens.models)

    # exact truths (v = cid % 7 <= 5): A-children are cids [0, 1600),
    # B-children cids [1600, 2200)
    trues = {
        "A": sum(1 for c in range(0, 1600) if c % 7 <= 5),
        "B": sum(1 for c in range(1600, 2200) if c % 7 <= 5),
    }
    for grp, true in trues.items():
        assert rows[grp] == pytest.approx(true, rel=0.25), (grp, rows, trues)

    # second query: the trained model is reused, not retrained
    rows2 = {r["grp"]: r["cnt"] for r in ens.aqp(q)}
    assert len(ens.models) == n_models
    assert rows2 == rows


def test_on_demand_refusal_memoized_for_unknown_table(spark):
    """A table set on-demand training cannot help with (absent from
    the catalog) is attempted once, memoized, and keeps refusing
    without growing the ensemble."""
    catalog, g, rel = _parent_child(spark)
    params = LearnParams(min_instances_slice=200)
    ens = SPNEnsemble(g)
    ens.add_model(train_spn_model(catalog, g, {"child"}, 50_000, params))
    # enable with a catalog that is MISSING the parent table: the
    # trainer hook must decline (no data to train on), not crash
    ens.enable_on_demand_training({"child": catalog["child"]})
    q = _grouped_count_query(g, rel)
    for _ in range(2):
        with pytest.raises(ModelPlaneUnsupported):
            ens.aqp(q)
    assert len(ens.models) == 1
    assert frozenset({"parent"}) in ens._od_attempted


def test_parked_entries_keep_oracle_coverage():
    """Every entry parked in _PRIORITY_TAIL (outside the driver's
    50-entry window) must still exist in queries() and keep its
    oracle_sql twin, except the documented rows-only entries — so
    parking an entry can never silently drop it from the full
    correctness artifact (round-8 ADVICE on q26)."""
    import __spark_entry__ as entry_mod

    # x07 flipped to oracle-green in round 10 (portable md5-derived
    # token hash); x17 flipped in round 11 (md5-derived stand-in
    # features over real document payloads) — the registry is now
    # 122/122 oracle-checkable, so no rows-only exceptions remain
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in entry_mod._PRIORITY_TAIL:
        assert name in qs, f"parked entry {name} missing from queries()"
        assert name in oracles, f"parked entry {name} lost its oracle"


def test_model_plane_inside_driver_window():
    """EVERY m-plane entry must sit inside the driver's 50-entry
    record window (round-11 fix: m18 was the one overflow since it
    landed; the rotation rule is to park a decorative q-entry instead,
    never a model-plane entry)."""
    import __spark_entry__ as entry_mod

    window = list(entry_mod.queries())[:50]
    m_entries = [n for n in entry_mod.queries() if n.startswith("m")]
    out = [n for n in m_entries if n not in window]
    assert out == [], out


def test_every_entry_has_oracle():
    """Round 11: the full registry is oracle-checkable — every
    queries() entry has an oracle_sql() twin (x17 was the last
    rows-only entry; its stand-in decoder is now md5-derived and
    engine-portable)."""
    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert missing == [], missing


def test_label_propagation_rounds_bounded(spark):
    """duplicate_clusters observability (round 9): the distributed
    min-label branch reports its propagation round count, which on the
    star topologies capped_bucket_pairs emits must stay at the
    documented 2-3 bound (1 propagation + 1 confirmation here); the
    driver union-find branch reports branch='driver', rounds=0."""
    from deepdb_public_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 30)] + [(100, 101), (100, 102)],
        "id_a long, id_b long",
    )
    st: dict = {}
    out = duplicate_clusters(pairs, driver_max_edges=0, stats=st)
    labels = {r["id"]: r["cluster"] for r in out.collect()}
    assert st["branch"] == "distributed" and st["n_edges"] == 31
    assert st["rounds"] <= 3, st
    assert all(labels[i] == 0 for i in range(30))
    assert labels[101] == labels[102] == labels[100] == 100

    st2: dict = {}
    out2 = duplicate_clusters(pairs, stats=st2)
    assert st2["branch"] == "driver" and st2["rounds"] == 0
    assert {r["id"]: r["cluster"] for r in out2.collect()} == labels


@pytest.fixture(scope="module")
def lineitem_ci_engine(spark):
    from deepdb_public_spark.engine import Engine

    eng = Engine(spark, SF_SMOKE)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 60_000))
    eng.ensemble = ens
    return eng


def test_distinct_ci_coverage_fuzz_band(lineitem_ci_engine):
    """End-to-end coverage band for the round-8 COUNT(DISTINCT) CIs
    (Poisson-occupancy moments), round-9 brief item 6: a seeded sweep
    of 24 conjunctive / OR / grouped queries, each 0.95 interval
    checked against the exact plane. The numpy calibration is already
    property-pinned (test_round8_fixes); this band asserts the
    EMPIRICAL coverage of the full query path stays >= nominal - eps
    over a wider predicate space, like the factorized fuzz band does
    for point estimates."""
    import random

    rng = random.Random(20260815)
    eng = lineitem_ci_engine
    preds = [
        "lineitem.l_discount <= 0.0{}".format,
        "lineitem.l_quantity < {}".format,
        "lineitem.l_quantity >= {}".format,
        "lineitem.l_tax <= 0.0{}".format,
    ]

    def _pred(p):
        if "discount" in p("") or "tax" in p(""):
            return p(rng.choice([3, 5, 7]))
        return p(rng.choice([12, 22, 32, 42]))

    covered, total = 0, 0
    for _ in range(24):
        a, b = rng.sample(preds, 2)
        pa, pb = _pred(a), _pred(b)
        where = f"({pa} OR {pb})" if rng.random() < 0.35 else f"{pa} AND {pb}"
        gcol = rng.choice([None, "l_returnflag", "l_linestatus"])
        group = f" GROUP BY lineitem.{gcol}" if gcol else ""
        sql = (
            "SELECT COUNT(DISTINCT lineitem.l_quantity) AS v FROM lineitem "
            f"WHERE {where}{group}"
        )
        ci_rows = eng.ensemble.confidence_interval(
            eng.parse(sql), confidence=0.95
        )
        exact = [r.asDict() for r in eng.query(sql).collect()]
        if gcol:
            cis = {r[gcol]: r for r in ci_rows}
            for r in exact:
                true = float(r["v"])
                if true < 5:  # tiny domains are threshold-noise bound
                    continue
                ci = cis.get(r[gcol])
                assert ci is not None, (sql, r)
                total += 1
                covered += ci["lo"] <= true <= ci["hi"] + 1e-9
        else:
            (ci,) = ci_rows
            true = float(exact[0]["v"])
            if true < 5:
                continue
            total += 1
            covered += ci["lo"] <= true <= ci["hi"] + 1e-9
    assert total >= 30, total  # the band actually exercised cases
    # nominal 0.95 minus sampling slack over ~30-60 checks
    assert covered / total >= 0.85, (covered, total)


def test_on_demand_training_closes_ungrouped_chain(spark):
    """Round-9 extension of the closure to the UNGROUPED factorized
    chain: an ensemble with only a {child} model answers a
    parent-join cardinality by training the {parent} model on demand
    at the frontier edge (fanout-weighted, so the grp<->fanout
    correlation is captured); and an ensemble with ZERO covering
    models seeds itself for a single-table query."""
    catalog, g, rel = _parent_child(spark)
    params = LearnParams(min_instances_slice=200)
    ens = SPNEnsemble(g)
    ens.add_model(train_spn_model(catalog, g, {"child"}, 50_000, params))
    ens.enable_on_demand_training(catalog, sample_budget=50_000, params=params)

    q = Query(
        query_type=QueryType.CARDINALITY,
        table_set={"parent", "child"},
        relationship_set={rel.identifier},
        conditions=[
            Condition("child", "v", "<=", 5.0),
            Condition("parent", "grp", "=", "A"),
        ],
    )
    est = ens.cardinality(q)
    true = sum(1 for c in range(0, 1600) if c % 7 <= 5)
    assert est == pytest.approx(true, rel=0.25), (est, true)
    assert any(m.table_set == {"parent"} for m in ens.models)

    # empty ensemble + single-table query: the anchor itself seeds
    ens2 = SPNEnsemble(g)
    ens2.enable_on_demand_training(catalog, sample_budget=50_000, params=params)
    q2 = Query(
        query_type=QueryType.CARDINALITY,
        table_set={"parent"},
        conditions=[Condition("parent", "grp", "=", "B")],
    )
    assert ens2.cardinality(q2) == pytest.approx(600, rel=0.2)
    assert len(ens2.models) == 1

    # and still refuses loudly when the feature is off
    ens3 = SPNEnsemble(g)
    with pytest.raises(ValueError, match="no model covers"):
        ens3.cardinality(q2)
