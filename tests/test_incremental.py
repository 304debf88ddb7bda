"""Distributed incremental inserts (D5 at scale): absorb_delta must
match the grown table without any data-scale collect."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.engine import Engine
from deepdb_public_spark.operators.prep import encode_table, encode_with_meta
from deepdb_public_spark.spn.incremental import absorb_delta
from deepdb_public_spark.spn.learn import LearnParams
from deepdb_public_spark.spn.nodes import Sum
from deepdb_public_spark.spn.trainer import train_spn_model
from tests.conftest import SF_SMOKE


def _qerr(est, true):
    return max(est / max(true, 1), true / max(est, 1e-9))


def test_encode_with_meta_matches_encode_table(spark):
    eng = Engine(spark, SF_SMOKE)
    cust = eng.catalog["customer"].select("c_custkey", "c_mktsegment")
    enc, meta = encode_table(cust, "customer")
    re_enc = encode_with_meta(cust, meta)
    a = {r["c_custkey"]: r["c_mktsegment"] for r in enc.collect()}
    b = {r["c_custkey"]: r["c_mktsegment"] for r in re_enc.collect()}
    assert a == b


def test_absorb_delta_exact_path_sum_free(spark):
    """A product-of-leaves model takes the melt+groupBy exact path:
    the grown histogram must match the grown table exactly-ish."""
    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(
        eng.catalog, eng.schema, {"customer"}, 100_000,
        LearnParams(min_instances_slice=10**9, adaptive_slice_floor=False),
    )
    assert not any(
        isinstance(n, Sum)
        for n in __import__(
            "deepdb_public_spark.spn.incremental", fromlist=["_iter_nodes"]
        )._iter_nodes(model.root)
    )
    base = eng.catalog["customer"]
    delta = base.filter(F.pmod(F.xxhash64("c_custkey"), F.lit(4)) < 1)
    n_delta = delta.count()
    absorb_delta(model, delta)
    assert model.full_join_size == base.count() + n_delta

    from deepdb_public_spark.plans.query import Condition, Query

    grown = base.unionByName(delta)
    q = Query(table_set={"customer"})
    q.add_where_condition(Condition("customer", "c_mktsegment", "=", "BUILDING"))
    est = model.cardinality(q)
    true = grown.filter("c_mktsegment = 'BUILDING'").count()
    # sample fraction is 1 at this scale and the delta path is exact
    assert est == pytest.approx(true, rel=0.01)


def test_absorb_delta_sampled_path_with_sum_nodes(spark):
    """A mixture model takes the bounded-sample path; estimates on the
    grown table stay inside the q-error budget even when the sample
    is much smaller than the delta."""
    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 100_000)
    base = eng.catalog["lineitem"]
    delta = base.filter(
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 3
    )
    # force sampling: budget far below the delta size
    absorb_delta(model, delta, sample_budget=500)
    grown = base.unionByName(delta)
    for pred, sql_pred in [
        ("l_quantity < 25", ("lineitem", "l_quantity", "<", 25)),
        ("l_returnflag = 'A'", ("lineitem", "l_returnflag", "=", "A")),
    ]:
        from deepdb_public_spark.plans.query import Condition, Query

        q = Query(table_set={"lineitem"})
        q.add_where_condition(Condition(*sql_pred))
        est = model.cardinality(q)
        true = grown.filter(pred).count()
        assert _qerr(est, true) < 1.3, f"{pred}: est={est} true={true}"


def test_remove_delta_exact_path_sum_free(spark):
    """DELETE twin of the exact insert path: removing the rows we just
    absorbed must restore the original estimates (mass clamping only
    triggers on over-deletion, not on a clean round trip)."""
    from deepdb_public_spark.plans.query import Condition, Query
    from deepdb_public_spark.spn.incremental import remove_delta

    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(
        eng.catalog, eng.schema, {"customer"}, 100_000,
        LearnParams(min_instances_slice=10**9, adaptive_slice_floor=False),
    )
    base = eng.catalog["customer"]
    q = Query(table_set={"customer"})
    q.add_where_condition(Condition("customer", "c_mktsegment", "=", "BUILDING"))
    before = model.cardinality(q)

    delta = base.filter(F.pmod(F.xxhash64("c_custkey"), F.lit(4)) < 1)
    n_delta = delta.count()
    absorb_delta(model, delta)
    remove_delta(model, delta)
    assert model.full_join_size == pytest.approx(base.count())
    assert model.cardinality(q) == pytest.approx(before, rel=0.01)

    # delete from the ORIGINAL model: estimates track the shrunk table
    model2 = train_spn_model(
        eng.catalog, eng.schema, {"customer"}, 100_000,
        LearnParams(min_instances_slice=10**9, adaptive_slice_floor=False),
    )
    remove_delta(model2, delta)
    remaining = base.subtract(delta)
    true = remaining.filter("c_mktsegment = 'BUILDING'").count()
    assert model2.cardinality(q) == pytest.approx(true, rel=0.05)


def test_remove_delta_sampled_path_with_sum_nodes(spark):
    """Mixture models take the bounded-sample delete path; estimates
    on the shrunk table stay inside the q-error budget."""
    from deepdb_public_spark.plans.query import Condition, Query
    from deepdb_public_spark.spn.incremental import remove_delta

    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 100_000)
    base = eng.catalog["lineitem"]
    delta = base.filter(
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 3
    )
    remove_delta(model, delta, sample_budget=500)
    remaining = base.subtract(delta)
    assert model.full_join_size == pytest.approx(remaining.count(), rel=1e-6)
    for pred, cond in [
        ("l_quantity < 25", ("lineitem", "l_quantity", "<", 25)),
        ("l_returnflag = 'A'", ("lineitem", "l_returnflag", "=", "A")),
    ]:
        q = Query(table_set={"lineitem"})
        q.add_where_condition(Condition(*cond))
        est = model.cardinality(q)
        true = remaining.filter(pred).count()
        assert _qerr(est, true) < 1.5, (pred, est, true)


def test_remove_delta_rejects_full_wipe(spark):
    from deepdb_public_spark.spn.incremental import remove_delta

    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(
        eng.catalog, eng.schema, {"customer"}, 100_000,
        LearnParams(min_instances_slice=10**9, adaptive_slice_floor=False),
    )
    with pytest.raises(ValueError, match="retrain"):
        remove_delta(model, eng.catalog["customer"])


def test_update_delta_exact_path_equals_sequential(spark):
    """Fused UPDATE on a sum-free model must be EXACTLY equivalent to
    remove_delta(old) followed by absorb_delta(new) — both are exact
    histogram arithmetic, so cardinalities and bookkeeping match to
    float precision."""
    import copy

    from deepdb_public_spark.plans.query import Condition, Query
    from deepdb_public_spark.spn.incremental import remove_delta, update_delta

    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(
        eng.catalog, eng.schema, {"customer"}, 100_000,
        LearnParams(min_instances_slice=10**9, adaptive_slice_floor=False),
    )
    seq = copy.deepcopy(model)
    base = eng.catalog["customer"]
    old = base.filter(F.pmod(F.xxhash64("c_custkey"), F.lit(5)) < 1)
    new = old.withColumn("c_acctbal", F.col("c_acctbal") + 10_000.0)

    n_old, n_new = update_delta(model, old, new)
    remove_delta(seq, old)
    absorb_delta(seq, new)

    assert n_old == old.count() and n_new == n_old
    assert model.full_join_size == pytest.approx(seq.full_join_size)
    assert model.sample_size == pytest.approx(seq.sample_size)
    for cond in [
        ("customer", "c_mktsegment", "=", "BUILDING"),
        ("customer", "c_acctbal", ">=", 10_000.0),
    ]:
        q = Query(table_set={"customer"})
        q.add_where_condition(Condition(*cond))
        assert model.cardinality(q) == pytest.approx(
            seq.cardinality(q), rel=1e-9
        ), cond


def test_update_delta_sampled_path_with_sum_nodes(spark):
    """Mixture-model UPDATE (the m10 shape): one stratified sampleBy
    pass; estimates track the CASE-updated table within the q-error
    budget, including the never-seen shifted value region."""
    from deepdb_public_spark.plans.query import Condition, Query
    from deepdb_public_spark.spn.incremental import update_delta

    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 100_000)
    base = eng.catalog["lineitem"]
    old = base.filter((F.col("l_orderkey") % 10) < 2)
    new = old.withColumn("l_quantity", F.col("l_quantity") + 25)
    n_old, n_new = update_delta(model, old, new, sample_budget=10_000)
    assert n_old == n_new == old.count()

    updated = base.filter((F.col("l_orderkey") % 10) >= 2).unionByName(new)
    assert model.full_join_size == pytest.approx(updated.count(), rel=1e-6)
    for pred, cond in [
        ("l_quantity < 25", ("lineitem", "l_quantity", "<", 25)),
        ("l_quantity >= 50", ("lineitem", "l_quantity", ">=", 50)),
        ("l_returnflag = 'A'", ("lineitem", "l_returnflag", "=", "A")),
    ]:
        q = Query(table_set={"lineitem"})
        q.add_where_condition(Condition(*cond))
        est = model.cardinality(q)
        true = updated.filter(pred).count()
        assert _qerr(est, true) < 1.5, (pred, est, true)


def test_update_delta_rejects_unseen_value(spark):
    """The fused stats pass must reject unseen categoricals on EITHER
    side of the update, naming example pairs."""
    from deepdb_public_spark.spn.incremental import update_delta

    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(
        eng.catalog, eng.schema, {"customer"}, 100_000,
        LearnParams(min_instances_slice=10**9, adaptive_slice_floor=False),
    )
    base = eng.catalog["customer"]
    old = base.limit(10)
    new = old.withColumn("c_mktsegment", F.lit("NO_SUCH_SEGMENT"))
    with pytest.raises(ValueError, match="unseen"):
        update_delta(model, old, new)
