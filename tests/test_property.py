"""Property-based tests (hypothesis) for driver-side model math — no
Spark session needed, so these run in milliseconds and cover the
input space the example tests can't."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepdb_public_spark.spn.leaves import Leaf
from deepdb_public_spark.spn.learn import LearnParams, learn_spn
from deepdb_public_spark.spn.nodes import evaluate, validate
from deepdb_public_spark.spn.ranges import NumericRange
from deepdb_public_spark.spn.rdc import rdc

finite = st.floats(-1e6, 1e6, allow_nan=False)


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=300),
    n_nulls=st.integers(0, 30),
    lo=finite,
    hi=finite,
)
@settings(max_examples=200, deadline=None)
def test_leaf_prob_expect_match_bruteforce(vals, n_nulls, lo, hi):
    lo, hi = min(lo, hi), max(lo, hi)
    col = np.array(vals + [np.nan] * n_nulls, dtype=float)
    leaf = Leaf.fit(0, col)
    rng = NumericRange([(lo, hi, True, True)])
    mask = (col >= lo) & (col <= hi)
    want_p = np.where(np.isnan(col), False, mask).mean()
    assert leaf.prob(rng) == np.float64(want_p) or abs(leaf.prob(rng) - want_p) < 1e-12
    want_e = np.nansum(np.where(mask, col, 0.0)) / len(col)
    assert abs(leaf.expect(lambda x: x, rng) - want_e) < 1e-9 * (1 + abs(want_e))
    # total mass invariant
    assert abs(leaf.prob(None) - 1.0) < 1e-12


@given(
    vals=st.lists(st.integers(0, 20), min_size=2, max_size=200),
    extra=st.lists(st.integers(0, 20), min_size=1, max_size=50),
)
@settings(max_examples=50, deadline=None)
def test_leaf_absorb_equals_refit(vals, extra):
    a = np.array(vals, dtype=float)
    b = np.array(extra, dtype=float)
    leaf = Leaf.fit(0, a)
    leaf.absorb(b, prior_n=len(a))
    refit = Leaf.fit(0, np.concatenate([a, b]))
    assert np.array_equal(leaf.values, refit.values)
    assert np.allclose(leaf.probs, refit.probs)


@given(seed=st.integers(0, 10_000))
@settings(max_examples=20, deadline=None)
def test_rdc_deterministic_and_bounded(seed):
    rng = np.random.default_rng(seed)
    x, y = rng.standard_normal(300), rng.standard_normal(300)
    a = rdc(x, y, seed=seed)
    b = rdc(x, y, seed=seed)
    assert a == b
    assert 0.0 <= a <= 1.0


@given(seed=st.integers(0, 500))
@settings(max_examples=10, deadline=None)
def test_learned_spn_mass_and_marginals(seed):
    rng = np.random.default_rng(seed)
    n = 1200
    data = np.stack(
        [
            rng.integers(0, 8, n).astype(float),
            rng.normal(0, 1, n).round(1),
            rng.integers(0, 3, n).astype(float),
        ],
        axis=1,
    )
    root = learn_spn(data, [0, 1, 2], LearnParams(min_instances_slice=200, seed=seed))
    validate(root)
    assert abs(evaluate(root, {}) - 1.0) < 1e-9
    # marginal of a single column is exact regardless of structure
    p = evaluate(root, {0: NumericRange([(0, 3, True, True)])})
    truth = ((data[:, 0] >= 0) & (data[:, 0] <= 3)).mean()
    assert abs(p - truth) < 0.05


@given(
    vals=st.lists(st.integers(0, 20), min_size=2, max_size=200),
    extra=st.lists(st.integers(0, 20), min_size=1, max_size=50),
)
@settings(max_examples=50, deadline=None)
def test_leaf_absorb_then_remove_is_identity(vals, extra):
    """DELETE undoes INSERT exactly (m10's update = delete+insert rests
    on this): absorbing a delta and then removing the same delta with
    negative weight restores the original histogram bit-for-bit up to
    float roundoff — including when the delta introduced values the
    original never had (their mass must clamp back to zero and the
    value drop out)."""
    a = np.array(vals, dtype=float)
    b = np.array(extra, dtype=float)
    leaf = Leaf.fit(0, a)
    orig_vals, orig_probs = leaf.values.copy(), leaf.probs.copy()
    leaf.absorb(b, prior_n=len(a))
    leaf.absorb(b, prior_n=len(a) + len(b), weight=-1.0)
    assert np.array_equal(leaf.values, orig_vals)
    assert np.allclose(leaf.probs, orig_probs)
