"""C7 sample-rate scaling and the MLlib KMeans top-level row split
(D3 scale path)."""

from __future__ import annotations

import copy

import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.engine import Engine
from deepdb_public_spark.plans.query import Condition, Query
from deepdb_public_spark.spn.nodes import Sum
from deepdb_public_spark.spn.trainer import train_spn_model
from tests.conftest import SF_SMOKE


def _qerr(est, true):
    return max(est / max(true, 1), true / max(est, 1e-9))


def test_sample_rate_scales_estimates_to_full_table(spark):
    """Model trained on a 10% staged sample with sample_rate=0.1 must
    estimate FULL-table counts (C7)."""
    eng = Engine(spark, SF_SMOKE)
    full = eng.catalog["lineitem"]
    staged = full.filter(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 1)
    catalog = dict(eng.catalog)
    catalog["lineitem"] = staged
    schema = copy.deepcopy(eng.schema)
    schema.tables["lineitem"].sample_rate = staged.count() / full.count()

    model = train_spn_model(catalog, schema, {"lineitem"}, 100_000)
    q = Query(table_set={"lineitem"})
    q.add_where_condition(Condition("lineitem", "l_quantity", "<", 25))
    est = model.cardinality(q)
    true = full.filter("l_quantity < 25").count()
    assert _qerr(est, true) < 1.25, f"est={est} true={true}"


def test_mllib_top_split_trains_and_estimates(spark):
    """Forcing the data-parallel first split (driver_row_limit below
    the table size) yields a valid Sum root with MLlib centers and
    passes the usual q-error budget."""
    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(
        eng.catalog, eng.schema, {"lineitem"}, 100_000, driver_row_limit=1000
    )
    assert isinstance(model.root, Sum)
    assert model.root.cluster_centers is not None
    assert hasattr(model.root, "scale_lo")

    true_n = eng.catalog["lineitem"].count()
    assert model.full_join_size == true_n
    for cond, pred in [
        (Condition("lineitem", "l_quantity", "<", 25), "l_quantity < 25"),
        (Condition("lineitem", "l_returnflag", "=", "A"), "l_returnflag = 'A'"),
    ]:
        q = Query(table_set={"lineitem"})
        q.add_where_condition(cond)
        est = model.cardinality(q)
        true = eng.catalog["lineitem"].filter(pred).count()
        assert _qerr(est, true) < 1.2, f"{pred}: est={est} true={true}"

    # phase timings are captured for the scale artifact
    # (tools/train_at_scale.py / TRAIN_AT_SCALE.json)
    tm = getattr(model, "train_timings", {})
    for key in ("join_materialize_count", "encode_dictionaries",
                "kmeans_fit", "per_cluster_sample_and_learn",
                "top_split_total"):
        assert key in tm and tm[key] >= 0.0, tm

    # incremental routing still works against MLlib centers (D5)
    import numpy as np

    rows = np.zeros((10, len(model.column_names)))
    model.add_dataset(rows, n_total=10)  # must not raise