"""Round-3 wave 3: model-plane quantiles, approximate top-k groups,
and streaming model maintenance (online inserts via foreachBatch)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.engine import Engine
from deepdb_public_spark.spn.ensemble import SPNEnsemble
from deepdb_public_spark.spn.trainer import train_spn_model
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark, SF_SMOKE)
    e.ensemble = SPNEnsemble(e.schema)
    e.ensemble.add_model(
        train_spn_model(e.catalog, e.schema, {"lineitem"}, 60_000)
    )
    return e


def test_model_quantiles_match_exact_percentiles(eng):
    base = eng.catalog["lineitem"]
    q = eng.parse(
        "SELECT COUNT(*) AS c FROM lineitem WHERE lineitem.l_discount <= 0.05"
    )
    got = eng.ensemble.quantile(q, "l_extendedprice", [0.1, 0.5, 0.9])
    truth = (
        base.filter("l_discount <= 0.05")
        .selectExpr(
            "percentile(l_extendedprice, 0.1) AS p10",
            "percentile(l_extendedprice, 0.5) AS p50",
            "percentile(l_extendedprice, 0.9) AS p90",
        )
        .collect()[0]
    )
    # conditional quantiles inherit the model's independence error
    # (the condition column and the quantile column may sit in
    # different factors): budget 10%, observed ~5% worst-case
    for est, true in zip(got, [truth["p10"], truth["p50"], truth["p90"]]):
        assert est == pytest.approx(true, rel=0.10), (est, true)


def test_model_quantiles_unconditioned_median(eng):
    from deepdb_public_spark.plans.query import Query

    q = Query(table_set={"lineitem"})
    (med,) = eng.ensemble.quantile(q, "l_quantity", [0.5])
    true = eng.catalog["lineitem"].selectExpr(
        "percentile(l_quantity, 0.5)"
    ).collect()[0][0]
    assert med == pytest.approx(true, abs=1.0)


def test_model_quantiles_cross_column_or(eng):
    q = eng.parse(
        "SELECT COUNT(*) AS c FROM lineitem WHERE "
        "(lineitem.l_quantity < 10 OR lineitem.l_discount > 0.08)"
    )
    (med,) = eng.ensemble.quantile(q, "l_extendedprice", [0.5])
    true = (
        eng.catalog["lineitem"]
        .filter("l_quantity < 10 OR l_discount > 0.08")
        .selectExpr("percentile(l_extendedprice, 0.5)")
        .collect()[0][0]
    )
    assert med == pytest.approx(true, rel=0.08)


def test_model_quantiles_reject_categorical(eng):
    from deepdb_public_spark.plans.query import Query

    q = Query(table_set={"lineitem"})
    with pytest.raises(ValueError, match="categorical"):
        eng.ensemble.quantile(q, "l_returnflag", [0.5])


def test_topk_groups_match_exact_ranking(eng):
    sql = (
        "SELECT lineitem.l_returnflag, COUNT(*) AS cnt FROM lineitem "
        "GROUP BY lineitem.l_returnflag"
    )
    q = eng.parse(sql)
    top = eng.ensemble.topk_groups(q, k=2)
    exact = sorted(
        (r.asDict() for r in eng.query(q).collect()),
        key=lambda r: -r["cnt"],
    )[:2]
    assert [r["l_returnflag"] for r in top] == [
        r["l_returnflag"] for r in exact
    ]
    for got, want in zip(top, exact):
        assert got["cnt"] == pytest.approx(want["cnt"], rel=0.1)


def test_streaming_model_maintenance_insert(eng, spark, tmp_path):
    """Stream the delta through foreachBatch: the maintained model's
    estimates must track the grown table, matching the one-shot
    absorb_delta contract (m02) through the streaming path."""
    import copy

    from deepdb_public_spark.streaming.model_update import (
        maintain_model_stream,
    )

    model = copy.deepcopy(eng.ensemble.models[0])
    base = eng.catalog["lineitem"]
    delta = base.filter((F.col("l_orderkey") % 10) < 3)
    src = str(tmp_path / "delta_src")
    # several files -> several input splits for the stream
    delta.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_model_stream(
        model, stream, str(tmp_path / "ckpt"), sample_budget=60_000
    )
    q.awaitTermination(120)
    assert not q.isActive

    grown = base.unionByName(delta)
    assert model.full_join_size == pytest.approx(grown.count(), rel=1e-6)
    for pred, cond_sql in [
        ("l_quantity < 25", "lineitem.l_quantity < 25"),
        ("l_returnflag = 'A'", "lineitem.l_returnflag = 'A'"),
    ]:
        iq = eng.parse(f"SELECT COUNT(*) AS c FROM lineitem WHERE {cond_sql}")
        est = model.cardinality(iq)
        true = grown.filter(pred).count()
        qerr = max(est / max(true, 1), true / max(est, 1e-9))
        assert qerr < 1.5, (pred, est, true)


def test_streaming_model_maintenance_rejects_bad_mode(eng, spark, tmp_path):
    from deepdb_public_spark.streaming.model_update import (
        maintain_model_stream,
    )

    with pytest.raises(ValueError, match="insert|delete"):
        maintain_model_stream(
            eng.ensemble.models[0],
            spark.readStream.schema("x int").parquet(str(tmp_path)),
            str(tmp_path / "c"),
            mode="upsert",
        )
