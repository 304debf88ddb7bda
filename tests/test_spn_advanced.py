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


class TestPostSamplingCompaction:
    """Leaf.compact (reference post_sampling_factor): mass and mean
    preserved exactly, range probabilities within bin granularity."""

    def test_mass_mean_preserved_and_size_reduced(self):
        import numpy as np

        from deepdb_public_spark.spn.leaves import Leaf

        rng = np.random.default_rng(7)
        col = rng.integers(0, 5000, size=20_000).astype(float)
        leaf = Leaf.fit(0, col)
        n0 = len(leaf.values)
        mean0 = leaf.expect(lambda x: x, None)
        leaf.compact(10)
        assert len(leaf.values) < n0 / 5
        assert abs(leaf.probs.sum() + leaf.null_prob - 1.0) < 1e-12
        assert abs(leaf.expect(lambda x: x, None) - mean0) < 1e-9 * abs(mean0)
        # values stay sorted (range masks rely on it)
        assert (np.diff(leaf.values) > 0).all()

    def test_range_prob_within_bin_granularity(self):
        import numpy as np

        from deepdb_public_spark.spn.leaves import Leaf
        from deepdb_public_spark.spn.ranges import NumericRange

        rng = np.random.default_rng(11)
        col = rng.uniform(0, 1000, size=30_000)
        leaf = Leaf.fit(0, col)
        r = NumericRange([(100.0, 700.0, True, True)])
        p0 = leaf.prob(r)
        leaf.compact(20)
        # equal-mass bins: boundary error bounded by ~2 bin masses
        bin_mass = leaf.probs.max()
        assert abs(leaf.prob(r) - p0) <= 2 * bin_mass + 1e-9

    def test_small_leaf_untouched(self):
        import numpy as np

        from deepdb_public_spark.spn.leaves import Leaf

        leaf = Leaf.fit(0, np.arange(50, dtype=float))
        vals = leaf.values.copy()
        leaf.compact(10)
        assert np.array_equal(leaf.values, vals)

    def test_learned_model_with_compaction_still_estimates(self, spark):
        import numpy as np

        from deepdb_public_spark.spn.learn import LearnParams, learn_spn
        from deepdb_public_spark.spn.nodes import iter_leaves, validate
        from deepdb_public_spark.spn.ranges import NumericRange

        rng = np.random.default_rng(3)
        data = np.column_stack(
            [rng.integers(0, 2000, 30_000), rng.uniform(0, 10, 30_000)]
        ).astype(float)
        root = learn_spn(
            data, [0, 1], LearnParams(post_sampling_factor=10.0)
        )
        validate(root, 2)
        # every leaf holds <= ceil(slice_distinct/10) values (bounded
        # by its slice rows / 10, plus the min_keep floor)
        assert all(
            len(lf.values) <= max(100, int(np.ceil(lf.n_rows / 10)) + 1)
            for lf in iter_leaves(root)
        )
        from deepdb_public_spark.spn.nodes import evaluate

        want = ((data[:, 0] >= 100) & (data[:, 0] <= 900)).mean()
        got = evaluate(root, {0: NumericRange([(100.0, 900.0, True, True)])})
        assert abs(got - want) < 0.05


def test_ensemble_stats_mb_scale(spark):
    """Paper parity: trained ensembles are MB-scale driver objects;
    stats() reports sizes and compaction shrinks them."""
    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.nodes import iter_leaves
    from deepdb_public_spark.spn.trainer import train_spn_model
    from tests.conftest import SF_CORRECT

    eng = Engine(spark, SF_CORRECT)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 30_000))
    s = ens.stats()
    assert s["n_models"] == 1
    m = s["models"][0]
    assert m["n_leaves"] >= 1 and m["n_nodes"] > m["n_leaves"] - 1
    assert 0 < s["total_bytes"] < 50 * 1024 * 1024  # MB-scale, not GB
    before = s["models"][0]["n_leaf_values"]
    for lf in iter_leaves(ens.models[0].root):
        lf.compact(10)
    after = ens.stats()["models"][0]["n_leaf_values"]
    assert after < before
