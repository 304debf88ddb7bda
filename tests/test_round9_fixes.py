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

    ROWS_ONLY_BY_DESIGN = {"x07_simhash_pairs", "x17_media_features"}
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in entry_mod._PRIORITY_TAIL:
        assert name in qs, f"parked entry {name} missing from queries()"
        if name not in ROWS_ONLY_BY_DESIGN:
            assert name in oracles, f"parked entry {name} lost its oracle"


def test_model_plane_inside_driver_window():
    """All m-plane entries except the documented overflow (m18, whose
    capability m04/m06/m19/m20 cover in-window) must sit inside the
    driver's 50-entry record window."""
    import __spark_entry__ as entry_mod

    window = list(entry_mod.queries())[:50]
    m_entries = [n for n in entry_mod.queries() if n.startswith("m")]
    out = [n for n in m_entries if n not in window]
    assert out == ["m18_factorized_aqp"], out
