"""Round-5 fixes: adaptive minhash prefilter knob, deterministic
localCheckpoint release, sample-CI finite-sampling correction.

Each guards a behavior the oracle can't see (knob equivalence, block
accounting, interval width)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


# ------------------------------------------- adaptive minhash prefilter


def test_minhash_prefilter_knob_equivalent_output(spark):
    """prefilter True / False / adaptive must produce the same verified
    pair set on the fixture corpus (the prefilter only removes
    candidates the exact verify would reject anyway)."""
    from deepdb_public_spark.operators.dedup import (
        minhash_lsh_pairs,
        release_cached,
    )

    docs = _docs(spark)
    results = []
    for knob in (None, True, False):
        got = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                docs, "text", "doc_id", threshold=0.8, n_hashes=64,
                n_bands=16, use_char_ngrams=True, ngram=5, prefilter=knob,
            ).collect()
        }
        release_cached()
        results.append(got)
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0  # fixture has near-dups


def test_minhash_adaptive_skips_below_threshold(spark):
    """On a tiny corpus the adaptive path must SKIP the prefilter
    (candidate count < prefilter_min_candidates) and still verify
    exactly — same output as prefilter=False."""
    from deepdb_public_spark.operators.dedup import (
        minhash_lsh_pairs,
        release_cached,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        (3, "a completely different sentence about spark partitions here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, "text", "doc_id", threshold=0.6, n_hashes=64, n_bands=16,
            use_char_ngrams=True, ngram=5,
        ).collect()
    }
    release_cached()
    assert out == {(1, 2)}


# --------------------------------------- localCheckpoint release hook


def test_release_local_checkpoints_frees_blocks(spark):
    from deepdb_public_spark.operators.partitioning import (
        release_local_checkpoints,
        spread_small_input,
    )

    release_local_checkpoints(spark)  # clean slate
    out = spread_small_input(spark.range(100).coalesce(1))
    assert out.count() == 100  # materializes the lazy checkpoint
    assert release_local_checkpoints(spark) >= 1
    assert release_local_checkpoints(spark) == 0  # idempotent


def test_release_cached_also_releases_checkpoints(spark):
    from deepdb_public_spark.operators.dedup import release_cached
    from deepdb_public_spark.operators.partitioning import (
        release_local_checkpoints,
        spread_small_input,
    )

    release_local_checkpoints(spark)
    spread_small_input(spark.range(50).coalesce(1)).count()
    release_cached()
    assert release_local_checkpoints(spark) == 0  # already freed


# ------------------------------------------- sample-CI correction


def test_similarity_sample_ci_width_shrinks_with_fraction(spark):
    """The (1-f) finite-sampling factor: at f close to 1 the CI must be
    much narrower than the Poisson approximation would give, and the
    estimate stays unbiased-ish on a fixed corpus."""
    from deepdb_public_spark.operators.similarity import similarity_selectivity

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = [1.0] + [0.0] * 63
    exact = similarity_selectivity(
        emb, "embedding", "vec_id", q, threshold=0.0, method="exact"
    )
    hi_f = similarity_selectivity(
        emb, "embedding", "vec_id", q, threshold=0.0, method="sample",
        sample_fraction=0.9, seed=7,
    )
    lo_f = similarity_selectivity(
        emb, "embedding", "vec_id", q, threshold=0.0, method="sample",
        sample_fraction=0.2, seed=7,
    )
    w_hi = hi_f["hi"] - hi_f["lo"]
    w_lo = lo_f["hi"] - lo_f["lo"]
    assert w_hi < w_lo  # more sample => tighter interval
    # sd at f: sqrt(hits*(1-f))/f — check the implementation emits it
    hits_hi = hi_f["estimate"] * 0.9
    expected_w = 2 * 1.96 * math.sqrt(max(hits_hi, 1.0) * 0.1) / 0.9
    assert w_hi == pytest.approx(expected_w, rel=1e-6)
    assert exact["lo"] == exact["hi"] == exact["estimate"]


def test_similarity_sample_ci_nonstandard_confidence(spark):
    """Non-tabled confidence levels get a computed z-score, not a
    silent 1.96 fallback."""
    from deepdb_public_spark.operators.similarity import similarity_selectivity

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = [1.0] + [0.0] * 63
    r80 = similarity_selectivity(
        emb, "embedding", "vec_id", q, threshold=0.0, method="sample",
        sample_fraction=0.5, seed=7, confidence=0.80,
    )
    r95 = similarity_selectivity(
        emb, "embedding", "vec_id", q, threshold=0.0, method="sample",
        sample_fraction=0.5, seed=7, confidence=0.95,
    )
    assert (r80["hi"] - r80["lo"]) < (r95["hi"] - r95["lo"])
    # z(0.80) = 1.2816: interval ratio must match z-ratio exactly
    ratio = (r80["hi"] - r80["lo"]) / (r95["hi"] - r95["lo"])
    assert ratio == pytest.approx(1.281552 / 1.96, rel=1e-4)


# ------------------------- merge_indicator_exp factor cancellation


def test_factor_cancellation_chain_shrinks_and_preserves_estimate(spark):
    """reference: spn_ensemble.py::merge_indicator_exp. On the chain
    customer <- orders <- lineitem with an anchor over
    {customer, orders} and a {lineitem}-only expansion model, the
    child factor's fanout denominator card({customer,orders} | conds)
    is algebraically identical to the anchor nominator — the
    cancellation must (a) fire (trace records it), (b) leave the
    estimate equal to the uncancelled product of the per-step trace
    values, and (c) skip re-evaluating the cancelled anchor term."""
    import math

    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, SF_SMOKE)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(
        train_spn_model(eng.catalog, eng.schema, {"customer", "orders"}, 50_000)
    )
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 50_000))

    q = eng.parse(
        "SELECT COUNT(*) AS cnt FROM customer, orders, lineitem "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND orders.o_orderkey = lineitem.l_orderkey "
        "AND customer.c_mktsegment = 'BUILDING'"
    )
    factors = ens.explain_factors(q)
    cancel = [f for f in factors if f["kind"] == "cancellation"]
    assert cancel and cancel[0]["cancelled_pairs"] >= 1
    # uncancelled product (trace values) == cancelled estimate: the
    # cancellation changes WHAT is evaluated, never the result
    est = ens.cardinality(q)
    prod = math.prod(f["value"] for f in factors)
    assert prod == pytest.approx(est, rel=1e-9)
    true = eng.query(q).collect()[0][0]
    assert max(est / max(true, 1), true / max(est, 1e-9)) < 2.0

    # (c) the anchor sub-query is evaluated ONCE for the whole
    # estimate despite appearing as both nominator and denominator
    anchors = ens._rank_first_factors(q)
    _k, first, covered = anchors[0]
    calls = []
    orig = first.cardinality

    def counting(subq, *a, **kw):
        calls.append(frozenset(subq.table_set))
        return orig(subq, *a, **kw)

    first.cardinality = counting
    try:
        ens._expand_factors(q, first, set(covered))
    finally:
        first.cardinality = orig
    assert calls.count(frozenset({"customer", "orders"})) == 0, (
        "cancelled anchor/denominator pair must not be evaluated"
    )
