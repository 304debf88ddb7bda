"""Round-10 extension operators: DSIR importance resampling
(sampling.dsir_select) and deterministic Lloyd refinement
(similarity.kmeans_refine). Both are oracle-checked end-to-end in the
registry (x53/x54); these tests pin the semantics the oracle can't
see — determinism under repartitioning, degenerate inputs, an
independent numpy replication of the k-means math, and the plan
shapes the 100 TB story relies on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.operators.sampling import dsir_select
from deepdb_public_spark.operators.similarity import kmeans_refine
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


# ---------------------------------------------------------------- DSIR


def test_dsir_selects_exactly_top_k(docs):
    out = dsir_select(docs, "text", "doc_id", F.col("lang") == "en", top_k=60)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc surfaces
    assert sum(r["selected"] for r in rows) == 60


def test_dsir_prefers_target_domain(docs):
    """The whole point of DSIR: target-domain docs must score higher
    on average, and the selected set must over-represent the target
    relative to its base rate (en = 193/500 = 38.6% in the fixture;
    the synthetic langs share most vocabulary, so the lift is real
    but bounded — measured 50% en in the top 60)."""
    out = dsir_select(
        docs, "text", "doc_id", F.col("lang") == "en", top_k=60
    ).join(docs.select("doc_id", "lang"), "doc_id")
    stats = out.groupBy(F.col("lang") == "en").agg(
        F.avg("log_weight").alias("w"), F.count(F.lit(1)).alias("n")
    )
    by_tgt = {r[0]: r["w"] for r in stats.collect()}
    assert by_tgt[True] > by_tgt[False]
    sel_en = out.filter("selected").filter(F.col("lang") == "en").count()
    base_rate = 193 / 500
    assert sel_en / 60 > base_rate + 0.05  # measured: 0.50 vs 0.386


def test_dsir_deterministic_under_repartition(docs):
    a = dsir_select(docs, "text", "doc_id", F.col("lang") == "en", top_k=50)
    b = dsir_select(
        docs.repartition(7), "text", "doc_id", F.col("lang") == "en", top_k=50
    )
    sa = {r["doc_id"]: (r["n_tokens"], r["log_weight"], r["selected"])
          for r in a.collect()}
    sb = {r["doc_id"]: (r["n_tokens"], r["log_weight"], r["selected"])
          for r in b.collect()}
    assert sa == sb


def test_dsir_anchors_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "aa bb cc", True), (2, "", False), (3, None, False),
         (4, "aa aa dd", True), (5, "bb cc dd ee", False)],
        "id long, text string, tgt boolean",
    )
    out = {r["id"]: r for r in
           dsir_select(df, "text", "id", F.col("tgt"), top_k=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for empty in (2, 3):
        assert out[empty]["n_tokens"] == 0
        assert out[empty]["log_weight"] is None
        assert out[empty]["selected"] is False
    assert sum(r["selected"] for r in out.values()) == 2


def test_dsir_degenerate_target_sets(spark):
    """All-target and no-target corpora must not divide by zero or
    drop rows: with target == raw the per-token log-ratio collapses
    to exactly 0 for every token (same counts, same totals), and with
    an EMPTY target the weights are finite (add-one smoothing keeps
    p_tgt > 0) — negative for every doc in this fixture, whose tokens
    all repeat enough that the smoothed empty-target LM underprices
    them."""
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "bb cc"), (3, "cc dd aa")],
        "id long, text string",
    )
    all_tgt = dsir_select(df, "text", "id", F.lit(True), top_k=2).collect()
    assert all(r["log_weight"] == 0.0 for r in all_tgt)
    assert sum(r["selected"] for r in all_tgt) == 2
    no_tgt = dsir_select(df, "text", "id", F.lit(False), top_k=2).collect()
    assert all(r["log_weight"] < 0 for r in no_tgt)
    assert sum(r["selected"] for r in no_tgt) == 2


def test_dsir_plan_shape(docs):
    """Selection is distributed top-k (TakeOrderedAndProject), the
    winner set joins back via broadcast, and nothing plans a
    cartesian product."""
    out = dsir_select(docs, "text", "doc_id", F.col("lang") == "en", top_k=60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ------------------------------------------------------------- k-means


def _numpy_reference(vecs_by_id: dict[int, np.ndarray], k: int, iters: int):
    ids = sorted(vecs_by_id)
    V = np.array([vecs_by_id[i] for i in ids], dtype=np.float64)
    cent = np.round(V[:k].copy(), 6)

    def dists(c):
        return np.round(((V[:, None, :] - c[None, :, :]) ** 2).sum(-1), 6)

    for _ in range(iters):
        assign = dists(cent).argmin(1)  # first-min = lowest index tie rule
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = np.round(V[m].mean(0), 6)
    d = dists(cent)
    assign = d.argmin(1)
    return {
        ids[i]: (int(assign[i]), float(d[i, assign[i]]))
        for i in range(len(ids))
    }


def test_kmeans_matches_numpy_replication(emb):
    """Independent replication of the full refinement (seeding,
    rounded distances, first-min ties, rounded means, empty-cluster
    keep-previous) in numpy — every assignment and distance must
    agree."""
    out = {r["id"]: (r["cluster"], r["dist"])
           for r in kmeans_refine(emb, "embedding", "vec_id", k=8, iters=2).collect()}
    raw = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in emb.collect()}
    ref = _numpy_reference(raw, k=8, iters=2)
    assert set(out) == set(ref)
    n_cluster_diff = sum(out[i][0] != ref[i][0] for i in out)
    assert n_cluster_diff == 0
    for i in out:
        assert out[i][1] == pytest.approx(ref[i][1], abs=2e-6)


def test_kmeans_deterministic_under_repartition(emb):
    a = kmeans_refine(emb, "embedding", "vec_id", k=8, iters=2).collect()
    b = kmeans_refine(
        emb.repartition(11), "embedding", "vec_id", k=8, iters=2
    ).collect()
    assert {r["id"]: (r["cluster"], r["dist"]) for r in a} == {
        r["id"]: (r["cluster"], r["dist"]) for r in b
    }


def test_kmeans_uses_multiple_clusters(emb):
    out = kmeans_refine(emb, "embedding", "vec_id", k=8, iters=2)
    n = out.select("cluster").distinct().count()
    assert 2 <= n <= 8
    assert out.count() == emb.count()


def test_kmeans_assignment_plan_has_no_join(emb):
    """Centroids are compiled literals: assigning 100 TB of vectors is
    a single narrow projection — no join, no shuffle."""
    out = kmeans_refine(emb, "embedding", "vec_id", k=4, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "CartesianProduct", "Exchange"):
        assert bad not in plan, f"{bad} in assignment plan:\n{plan[:2000]}"


def test_kmeans_duplicate_seeds_and_empty_cluster(spark):
    """Duplicate vectors among the seeds produce two IDENTICAL
    centroids: every point ties between them and the lower index must
    win (first-min rule), leaving the higher-index cluster empty —
    which then keeps its previous centroid instead of crashing."""
    rows = [(i, [float(i % 2), 0.0]) for i in range(10)]  # two point sites
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_refine(df, "embedding", "vec_id", k=4, iters=2).collect()
    assert len(out) == 10
    # seeds: ids 0..3 -> vectors [0,0],[1,0],[0,0],[1,0]; clusters 2/3
    # duplicate 0/1 and must end up empty under the tie rule
    used = {r["cluster"] for r in out}
    assert used == {0, 1}
    for r in out:
        assert r["cluster"] == (0 if r["id"] % 2 == 0 else 1)
        assert r["dist"] == 0.0


def test_cluster_balanced_sample_quota_and_determinism(emb):
    """Every cluster contributes min(per_cluster, |cluster|) selected
    rows — the balancing guarantee — and the selected SET is stable
    under repartitioning (md5-of-id order, not partition order)."""
    from deepdb_public_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    out = cluster_balanced_sample(
        emb, "embedding", "vec_id", per_cluster=25, k=8, iters=2
    )
    rows = out.collect()
    assert len(rows) == emb.count()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r["selected"])
    for c, flags in by_cluster.items():
        assert sum(flags) == min(25, len(flags)), f"cluster {c} quota"
    again = {
        r["id"]
        for r in cluster_balanced_sample(
            emb.repartition(9), "embedding", "vec_id", per_cluster=25,
            k=8, iters=2,
        ).collect()
        if r["selected"]
    }
    assert again == {r["id"] for r in rows if r["selected"]}


def test_kmeans_needs_k_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="need >= 4"):
        kmeans_refine(df, "embedding", "vec_id", k=4, iters=1)
