"""Property tests for the range algebra (spn/ranges.py): the
model plane's predicate semantics reduce to set algebra over column
domains, so intersect/union must agree with brute-force membership on
EVERY generated value — for any mix of interval shapes, inclusivity
flags, nominal code sets, and NULL flags. These are the operations
every OR/NOT/BETWEEN query routes through; a membership bug here is a
silently-wrong estimate everywhere.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deepdb_public_spark.spn.ranges import (
    NominalRange,
    NumericRange,
    intersect_ranges,
    is_empty_range,
    union_ranges,
    value_admitted,
)

# Small integer grid: membership is checked on every point, so
# interval endpoints and probe values collide often (the interesting
# cases: boundary inclusivity, empty intersections, adjacent spans).
_POINTS = list(range(-3, 8))

_interval = st.tuples(
    st.integers(-3, 7), st.integers(-3, 7), st.booleans(), st.booleans()
).map(lambda t: (min(t[0], t[1]), max(t[0], t[1]), t[2], t[3]))

_numeric = st.lists(_interval, min_size=1, max_size=3).map(
    lambda iv: NumericRange(iv)
)
_nominal = st.lists(st.integers(-3, 7), min_size=1, max_size=5).map(
    lambda vs: NominalRange(sorted(set(vs)))
)
_range = st.one_of(_numeric, _nominal)


def _member(rng, v):
    return value_admitted(rng, float(v))


@given(a=_range, b=_range)
@settings(max_examples=300, deadline=None)
def test_intersect_is_pointwise_and(a, b):
    c = intersect_ranges(a, b)
    for v in _POINTS:
        want = _member(a, v) and _member(b, v)
        got = (not is_empty_range(c)) and _member(c, v)
        assert got == want, (a, b, c, v)


@given(a=_range, b=_range)
@settings(max_examples=300, deadline=None)
def test_union_is_pointwise_or(a, b):
    c = union_ranges(a, b)
    for v in _POINTS:
        want = _member(a, v) or _member(b, v)
        got = _member(c, v)
        assert got == want, (a, b, c, v)


@given(a=_range, b=_range)
@settings(max_examples=200, deadline=None)
def test_union_null_flag_is_or_intersect_is_and(a, b):
    a.include_null, b.include_null = True, False
    assert union_ranges(a, b).include_null is True
    u = intersect_ranges(a, b)
    if not is_empty_range(u):
        assert u.include_null is False


@given(a=_range)
@settings(max_examples=100, deadline=None)
def test_union_and_intersect_idempotent(a):
    u = union_ranges(a, a)
    i = intersect_ranges(a, a)
    for v in _POINTS:
        assert _member(u, v) == _member(a, v)
        got = (not is_empty_range(i)) and _member(i, v)
        assert got == _member(a, v)
