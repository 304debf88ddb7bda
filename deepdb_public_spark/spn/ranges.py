"""Condition ranges for SPN evaluation (reference:
aqp_spn/aqp_spn.py::_parse_conditions -> NominalRange / NumericRange,
SURVEY.md §2 B1/B2).

A range describes the admissible set for one column; None means
unconstrained. NULL semantics follow the reference: NULL is excluded
unless include_null is set (IS NULL maps to a null-only range).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class NominalRange:
    """Categorical membership: admissible dictionary codes."""

    values: list[int]
    include_null: bool = False


@dataclass
class NumericRange:
    """Union of closed/open numeric intervals [(lo, hi, lo_incl,
    hi_incl), ...]."""

    intervals: list[tuple[float, float, bool, bool]]
    include_null: bool = False


@dataclass
class NullOnlyRange:
    """IS NULL."""

    include_null: bool = True


Range = NominalRange | NumericRange | NullOnlyRange


def range_key(rng: Range) -> tuple:
    """Canonical hashable form — the factor-cache key component
    (reference B13: IndicatorExpectation.__hash__). Canonical means
    semantically identical conditions hash identically: nominal values
    sort (IN ('a','b') == IN ('b','a')) and interval lists pass
    through _merge_intervals (intersect output is nested-loop-ordered
    and unmerged) — without this, equal factors missed the cache and
    re-walked the tree."""
    if isinstance(rng, NullOnlyRange):
        return ("null",)
    if isinstance(rng, NominalRange):
        return ("nom", tuple(sorted(rng.values)), rng.include_null)
    return (
        "num",
        tuple(_merge_intervals(rng.intervals)),
        rng.include_null,
    )


def value_admitted(rng: Range, v: float) -> bool:
    """True when scalar ``v`` lies inside the range."""
    if isinstance(rng, NullOnlyRange):
        return False
    if isinstance(rng, NominalRange):
        return v in rng.values
    return _value_in_intervals(v, rng.intervals)


def is_empty_range(rng: Range) -> bool:
    """True when the range admits no value (and no NULL)."""
    if isinstance(rng, NullOnlyRange):
        return False
    if isinstance(rng, NominalRange):
        return not rng.values and not rng.include_null
    return not rng.intervals and not rng.include_null


def _norm_iv(iv):
    """Normalize an interval's unbounded endpoints: None -> +/-inf.
    leaves._mask accepts None bounds, but comparisons here would
    TypeError on them — one normalization point keeps both encodings
    legal everywhere."""
    lo, hi, li, hi_incl = iv
    return (
        float("-inf") if lo is None else lo,
        float("inf") if hi is None else hi,
        li,
        hi_incl,
    )


def _interval_intersect(a, b):
    lo1, hi1, l1, h1 = _norm_iv(a)
    lo2, hi2, l2, h2 = _norm_iv(b)
    if lo1 > lo2:
        lo, li = lo1, l1
    elif lo2 > lo1:
        lo, li = lo2, l2
    else:
        lo, li = lo1, l1 and l2
    if hi1 < hi2:
        hi, hi_incl = hi1, h1
    elif hi2 < hi1:
        hi, hi_incl = hi2, h2
    else:
        hi, hi_incl = hi1, h1 and h2
    if lo > hi or (lo == hi and not (li and hi_incl)):
        return None
    return (lo, hi, li, hi_incl)


def _value_in_intervals(v: float, intervals) -> bool:
    for iv in intervals:
        lo, hi, li, hi_incl = _norm_iv(iv)
        above = v > lo or (v == lo and li)
        below = v < hi or (v == hi and hi_incl)
        if above and below:
            return True
    return False


def intersect_ranges(a: Range, b: Range) -> Range:
    """Conjunction of two ranges on the same column. Two conjuncts on
    one column (``x >= 10 AND x < 20``) must answer the intersection,
    not last-wins (reference: per-column condition merging in
    aqp_spn.py::_parse_conditions)."""
    both_null = getattr(a, "include_null", False) and getattr(
        b, "include_null", False
    )
    if isinstance(a, NullOnlyRange) or isinstance(b, NullOnlyRange):
        other = b if isinstance(a, NullOnlyRange) else a
        if isinstance(other, NullOnlyRange) or other.include_null:
            return NullOnlyRange()
        return NominalRange([], include_null=False)
    if isinstance(a, NominalRange) and isinstance(b, NominalRange):
        sb = set(b.values)
        return NominalRange(
            [v for v in a.values if v in sb], include_null=both_null
        )
    if isinstance(a, NominalRange) or isinstance(b, NominalRange):
        nom = a if isinstance(a, NominalRange) else b
        num = b if isinstance(a, NominalRange) else a
        return NominalRange(
            [v for v in nom.values if _value_in_intervals(v, num.intervals)],
            include_null=both_null,
        )
    out = []
    for ia in a.intervals:
        for ib in b.intervals:
            r = _interval_intersect(ia, ib)
            if r is not None:
                out.append(r)
    return NumericRange(out, include_null=both_null)


def _merge_intervals(intervals):
    """Canonical union of interval lists: sorted, overlapping/touching
    intervals coalesced (inclusivity-aware). Leaf masks OR intervals
    together so overlap never double-counts, but the merged form is
    the canonical factor-cache key (B13) and keeps interval counts
    bounded under repeated unions."""
    if not intervals:
        return []
    ivs = sorted(
        (_norm_iv(iv) for iv in intervals),
        key=lambda iv: (iv[0], 0 if iv[2] else 1),
    )
    out = [list(ivs[0])]
    for lo, hi, lo_incl, hi_incl in ivs[1:]:
        _L, H, _Li, Hi = out[-1]
        if lo < H or (lo == H and (lo_incl or Hi)):
            if hi > H:
                out[-1][1], out[-1][3] = hi, hi_incl
            elif hi == H:
                out[-1][3] = Hi or hi_incl
        else:
            out.append([lo, hi, lo_incl, hi_incl])
    return [tuple(iv) for iv in out]


def union_ranges(a: Range, b: Range) -> Range:
    """Disjunction of two ranges on the same column — the model-plane
    half of the same-column OR extension (beyond the reference's
    conjunctive-only grammar, SURVEY.md §2 table E). Nominal unions
    stay nominal; mixed nominal/numeric unions lift dictionary codes
    to point intervals (codes ARE the numeric domain of categorical
    leaves, so the lifted range evaluates identically)."""
    include_null = getattr(a, "include_null", False) or getattr(
        b, "include_null", False
    )
    if isinstance(a, NullOnlyRange) and isinstance(b, NullOnlyRange):
        return NullOnlyRange()
    if isinstance(a, NullOnlyRange) or isinstance(b, NullOnlyRange):
        other = b if isinstance(a, NullOnlyRange) else a
        if isinstance(other, NominalRange):
            return NominalRange(list(other.values), include_null=True)
        return NumericRange(list(other.intervals), include_null=True)
    if isinstance(a, NominalRange) and isinstance(b, NominalRange):
        return NominalRange(
            sorted(set(a.values) | set(b.values)), include_null=include_null
        )
    ia = (
        [(v, v, True, True) for v in a.values]
        if isinstance(a, NominalRange)
        else list(a.intervals)
    )
    ib = (
        [(v, v, True, True) for v in b.values]
        if isinstance(b, NominalRange)
        else list(b.intervals)
    )
    return NumericRange(_merge_intervals(ia + ib), include_null=include_null)

