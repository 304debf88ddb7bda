"""Dataset-as-declaration: a user brings their OWN schema as JSON
(the reference's per-dataset schemas/<dataset>/schema.py surface) and
runs the full lifecycle — load, exact queries, training, estimates —
without touching Python.
"""

from __future__ import annotations

import json

import pytest

from deepdb_public_spark.plans.schema import (
    schema_from_json,
    schema_to_json,
    tpch_like_schema,
)
from tests.conftest import SF_SMOKE


def test_roundtrip_preserves_everything():
    g = tpch_like_schema()
    g2 = schema_from_json(schema_to_json(g))
    assert set(g2.tables) == set(g.tables)
    assert set(g2.relationships) == set(g.relationships)
    for name, t in g.tables.items():
        t2 = g2.tables[name]
        assert t2.primary_key == t.primary_key
        assert t2.irrelevant_attributes == t.irrelevant_attributes
        assert t2.table_size == t.table_size


def test_undeclared_edge_endpoint_is_loud():
    with pytest.raises(ValueError, match="undeclared table"):
        schema_from_json(
            {
                "tables": [{"name": "a", "primary_key": ["id"]}],
                "relationships": [
                    {"start": "a", "start_attr": "x", "end": "ghost", "end_attr": "id"}
                ],
            }
        )


def test_custom_dataset_full_lifecycle(spark, tmp_path):
    """A 2-table subset declared purely via JSON: exact plane, model
    plane, and the parser all honor the declared graph."""
    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.trainer import train_spn_model

    decl = {
        "tables": [
            {"name": "orders", "primary_key": ["o_orderkey"]},
            {"name": "customer", "primary_key": ["c_custkey"], "table_size": 150},
        ],
        "relationships": [
            {
                "start": "orders",
                "start_attr": "o_custkey",
                "end": "customer",
                "end_attr": "c_custkey",
            }
        ],
    }
    path = tmp_path / "myschema.json"
    path.write_text(json.dumps(decl))
    from deepdb_public_spark.plans.schema import load_schema_json

    eng = Engine(spark, SF_SMOKE, schema=load_schema_json(str(path)))
    assert set(eng.catalog) == {"orders", "customer"}
    # exact plane honors the declared graph
    n = eng.query(
        "SELECT COUNT(*) AS cnt FROM customer, orders "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND customer.c_mktsegment = 'BUILDING'"
    ).collect()[0][0]
    assert n > 0
    # tables outside the declaration are rejected
    with pytest.raises(ValueError):
        eng.query("SELECT COUNT(*) AS cnt FROM lineitem")
    # model plane trains over the declared join and estimates
    model = train_spn_model(eng.catalog, eng.schema, {"orders", "customer"}, 20_000)
    q = eng.parse(
        "SELECT COUNT(*) AS cnt FROM customer, orders "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND customer.c_mktsegment = 'BUILDING'"
    )
    est = float(model.cardinality(q))
    qerr = max(est / max(n, 1), n / max(est, 1e-9))
    assert qerr < 2.0


def test_cli_schema_json(spark, tmp_path):
    """--schema_json drives the CLI against a declared dataset."""
    from deepdb_public_spark.cli import main
    from deepdb_public_spark.plans.schema import tpch_like_schema

    decl = schema_to_json(tpch_like_schema())
    # restrict to a 2-table dataset to prove the declaration is honored
    decl["tables"] = [t for t in decl["tables"] if t["name"] in ("orders", "customer")]
    decl["relationships"] = [
        r for r in decl["relationships"]
        if {r["start"], r["end"]} <= {"orders", "customer"}
    ]
    path = tmp_path / "two_tables.json"
    path.write_text(json.dumps(decl))
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--schema_json", str(path),
            "--execute_query",
            "SELECT COUNT(*) AS cnt FROM orders WHERE orders.o_orderstatus = 'F'",
        ],
        spark=spark,
    )
    assert rc == 0
