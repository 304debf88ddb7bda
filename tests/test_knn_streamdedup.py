"""Bucketed kNN join (scale path vs exact oracle) and streaming
exact dedup (dropDuplicatesWithinWatermark)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdb_public_spark.operators.similarity import knn_join, knn_join_lsh
from deepdb_public_spark.sources.catalog import load_tables
from deepdb_public_spark.streaming.windows import (
    run_streaming_batch,
    stream_events,
    streaming_dedup,
)
from tests.conftest import SF_SMOKE


def test_knn_join_lsh_recall_vs_exact(spark):
    emb = load_tables(spark, SF_SMOKE, ["embeddings"], register_views=False)[
        "embeddings"
    ]
    left = emb.filter(F.col("vec_id") < 50)
    right = emb.filter(F.col("vec_id") >= 50)
    exact = knn_join(left, right, "embedding", "vec_id", "vec_id", k=5)
    approx = knn_join_lsh(
        left, right, "embedding", "vec_id", "vec_id",
        k=5, n_planes=6, multiprobe_hamming=2,
    )
    ex = {(r["lid"], r["rid"]) for r in exact.collect()}
    ap = {(r["lid"], r["rid"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"recall {recall:.2f}"
    # every approx result must respect per-left top-k size
    from collections import Counter

    per_left = Counter(l for l, _ in ap)
    assert all(v <= 5 for v in per_left.values())


def test_streaming_dedup_matches_batch_distinct(spark):
    src = stream_events(spark, f"{SF_SMOKE}/events.parquet")
    # duplicate every event 2x upstream, then dedup on event_id
    dup = lambda df: streaming_dedup(
        df.withColumn("__copy", F.explode(F.array(F.lit(1), F.lit(2)))).drop(
            "__copy"
        ),
        ["event_id"],
    )
    got = run_streaming_batch(src, dup, "dedup_test", output_mode="append")
    batch = load_tables(spark, SF_SMOKE, ["events"], register_views=False)[
        "events"
    ]
    assert got.count() == batch.select("event_id").distinct().count()
