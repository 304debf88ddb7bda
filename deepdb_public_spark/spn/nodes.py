"""SPN inner nodes + bottom-up evaluation (reference: SPN structure
from custom SPFlow; evaluation in aqp_spn/expectations.py — SURVEY.md
§2 B4-B7).

Evaluation contract: ``evaluate(node, cond, features)`` returns
E[ prod_j fn_j(x_{c_j}) * 1(conds) ] for per-column transform features
{col_index: fn}. With no features this is the probability of the
conditions; with identity features it is the expectation factors the
AQP plane needs. Product nodes multiply child results (independent
scopes); Sum nodes mix by cluster weights.
"""

from __future__ import annotations

import numpy as np

from .leaves import Leaf
from .ranges import Range


class Product:
    kind = "product"

    def __init__(self, children: list) -> None:
        self.children = children
        self.scope = sorted({s for c in children for s in c.scope})


class Sum:
    kind = "sum"

    def __init__(
        self,
        weights: list[float],
        children: list,
        cluster_centers: np.ndarray | None = None,
    ) -> None:
        self.weights = list(weights)
        self.children = children
        self.scope = children[0].scope if children else []
        # kept for incremental updates: new rows are routed to the
        # nearest center (reference D5: cluster centers on Sum nodes)
        self.cluster_centers = cluster_centers


Node = Leaf | Product | Sum


def evaluate(
    node: Node,
    cond: dict[int, Range],
    features: dict[int, object] | None = None,
) -> float:
    """Bottom-up pass. ``cond`` maps column index -> Range."""
    features = features or {}
    if isinstance(node, Leaf):
        col = node.scope[0]
        rng = cond.get(col)
        fn = features.get(col)
        if fn is None:
            return node.prob(rng)
        return node.expect(fn, rng)
    if isinstance(node, Product):
        out = 1.0
        for ch in node.children:
            out *= evaluate(ch, cond, features)
            if out == 0.0:
                return 0.0
        return out
    # Sum
    return float(
        sum(
            w * evaluate(ch, cond, features)
            for w, ch in zip(node.weights, node.children)
        )
    )


def iter_leaves(node: Node):
    if isinstance(node, Leaf):
        yield node
        return
    for ch in node.children:
        yield from iter_leaves(ch)


def distinct_values(node: Node, col: int) -> np.ndarray:
    """Distinct non-null values of a column across the tree with
    positive mass (reference B9: group_by_combination.py — the
    model-side DISTINCT used for group-by enumeration)."""
    vals: set[float] = set()
    for leaf in iter_leaves(node):
        if leaf.scope[0] == col:
            vals.update(leaf.values[leaf.probs > 0].tolist())
    return np.array(sorted(vals))


def validate(node: Node, n_cols: int | None = None) -> None:
    """Structural invariants (reference D10: custom_validity.py):
    sum weights normalize, product children partition scopes, sum
    children share scope."""
    if isinstance(node, Leaf):
        total = node.probs.sum() + node.null_prob
        assert abs(total - 1.0) < 1e-6, f"leaf mass {total} != 1"
        assert np.all(np.diff(node.values) > 0), "leaf values not sorted-unique"
        return
    if isinstance(node, Product):
        seen: set[int] = set()
        for ch in node.children:
            overlap = seen & set(ch.scope)
            assert not overlap, f"product children share scope {overlap}"
            seen |= set(ch.scope)
            validate(ch)
        return
    assert abs(sum(node.weights) - 1.0) < 1e-6, "sum weights != 1"
    scopes = {tuple(ch.scope) for ch in node.children}
    assert len(scopes) == 1, "sum children scopes differ"
    for ch in node.children:
        validate(ch)
