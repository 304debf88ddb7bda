"""Condition ranges for SPN evaluation (reference:
aqp_spn/aqp_spn.py::_parse_conditions -> NominalRange / NumericRange,
SURVEY.md §2 B1/B2).

A range describes the admissible set for one column; None means
unconstrained. NULL semantics follow the reference: NULL is excluded
unless include_null is set (IS NULL maps to a null-only range).
"""

from __future__ import annotations

from dataclasses import dataclass, field


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


@dataclass
class ConditionSet:
    """col name -> Range (conjunctive, as in the reference grammar)."""

    ranges: dict[str, Range] = field(default_factory=dict)

    def merged_with(self, col: str, rng: Range) -> "ConditionSet":
        out = dict(self.ranges)
        out[col] = rng
        return ConditionSet(out)
