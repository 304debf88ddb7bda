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
        if len(weights) != len(children):
            # every evaluator zips weights with children — a surplus
            # child would silently vanish from all estimates
            raise ValueError(
                f"Sum needs one weight per child "
                f"({len(weights)} weights, {len(children)} children)"
            )
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


def evaluate_many(
    node: Node,
    conds: list[tuple[dict, dict]],
) -> np.ndarray:
    """ONE bottom-up pass evaluating MANY (cond, features) pairs at
    once — B8 applied to plan-time pricing (the join-order DP prices
    every connected subset its search round discovers; the sub-queries
    share the model, so one traversal returns the whole price vector).
    Each leaf contributes a length-B vector; Product/Sum combine
    vectors elementwise, so the tree is walked once instead of B
    times."""
    B = len(conds)
    if B == 0:
        return np.array([])

    def rec(n: Node) -> np.ndarray:
        if isinstance(n, Leaf):
            col = n.scope[0]
            out = np.empty(B)
            for b, (cond, feats) in enumerate(conds):
                fn = (feats or {}).get(col)
                rng = cond.get(col)
                out[b] = n.expect(fn, rng) if fn is not None else n.prob(rng)
            return out
        if isinstance(n, Product):
            out = None
            for ch in n.children:
                r = rec(ch)
                out = r if out is None else out * r
            return out
        acc = None  # Sum
        for w, ch in zip(n.weights, n.children):
            r = w * rec(ch)
            acc = r if acc is None else acc + r
        return acc

    return np.asarray(rec(node), dtype=np.float64).reshape(-1)


def evaluate_groupby(
    node: Node,
    cond: dict[int, Range],
    features: dict[int, object],
    gb_axes: dict[int, np.ndarray],
) -> np.ndarray:
    """ONE bottom-up pass evaluating every group-by combination at
    once (reference B8: aqp_spn.py::evaluate_indicator_expectation_
    batch). ``gb_axes`` maps group-by column -> its domain values;
    the result is an array over the cross-product grid (axis order =
    dict order). Leaves off the group-by columns contribute scalars;
    a leaf ON group-by column j contributes a vector along axis j —
    numpy broadcasting through Product/Sum nodes replaces the
    per-combination tree walks (a 10k-group query used to re-walk
    the tree ~30k times)."""
    k = len(gb_axes)
    axis_of = {col: a for a, col in enumerate(gb_axes)}
    features = features or {}

    def rec(n: Node) -> np.ndarray:
        if isinstance(n, Leaf):
            col = n.scope[0]
            fn = features.get(col)
            rng = cond.get(col)
            if col not in axis_of:
                val = n.expect(fn, rng) if fn is not None else n.prob(rng)
                return np.full([1] * k, val)
            vals = gb_axes[col]
            shape = [1] * k
            shape[axis_of[col]] = len(vals)
            if len(n.values) == 0 or len(vals) == 0:
                return np.zeros(shape)
            mask, _null = n._mask(rng)
            pos = np.searchsorted(n.values, vals)
            pos_c = np.clip(pos, 0, len(n.values) - 1)
            hit = (pos < len(n.values)) & (n.values[pos_c] == vals)
            w = n.probs[pos_c] * mask[pos_c]
            if fn is not None:
                w = w * fn(n.values[pos_c])
            return np.where(hit, w, 0.0).reshape(shape)
        if isinstance(n, Product):
            out = None
            for ch in n.children:
                r = rec(ch)
                out = r if out is None else out * r
            return out
        acc = None  # Sum
        for w, ch in zip(n.weights, n.children):
            r = w * rec(ch)
            acc = r if acc is None else acc + r
        return acc

    full_shape = tuple(len(v) for v in gb_axes.values())
    return np.broadcast_to(rec(node), full_shape).copy()


def evaluate_with_variance(
    node: Node,
    cond: dict[int, Range],
    features: dict[int, object] | None = None,
) -> tuple[float, float]:
    """(estimate, sampling variance) of E[prod fn_j(x) * 1(conds)],
    with the variance PROPAGATED per node (reference B10: aqp_spn.py
    variance methods) instead of the round-1 whole-factor CLT:

    - Leaf: moment-based variance of the fitted estimate over the
      leaf's own training count — p(1-p)/n for indicators,
      (E[f^2 1] - E[f 1]^2)/n for expectations.
    - Product: independent factors, Var(XY) = VxVy + VxEy^2 + VyEx^2.
    - Sum: mixture of child estimates plus multinomial weight
      uncertainty, Var = sum(w_c^2 Vc + Ec^2 w_c(1-w_c)/n)
      (weight covariances dropped, as in the reference).
    """
    features = features or {}

    def _cnt(n: Node) -> float:
        cnt = getattr(n, "n_rows", None)
        if cnt is None:
            # a silent n_rows=1 fallback inflated variance ~n-fold
            # (reproduced: 1300x too-wide CIs) for any tree assembled
            # without the trainer's n_rows bookkeeping — fail loudly
            raise ValueError(
                "evaluate_with_variance needs n_rows on every node "
                "(set by learn_spn/trainer); this tree was assembled "
                "without it"
            )
        return max(float(cnt), 1.0)

    def rec(n: Node) -> tuple[float, float]:
        if isinstance(n, Leaf):
            cnt = _cnt(n)
            col = n.scope[0]
            rng = cond.get(col)
            fn = features.get(col)
            if fn is None:
                p = n.prob(rng)
                return p, p * (1.0 - p) / cnt
            e1 = n.expect(fn, rng)
            e2 = n.expect(lambda x: fn(x) ** 2, rng)
            return e1, max(e2 - e1 * e1, 0.0) / cnt
        if isinstance(n, Product):
            e, v = 1.0, 0.0
            for ch in n.children:
                ce, cv = rec(ch)
                v = v * cv + v * ce * ce + cv * e * e
                e = e * ce
            return e, v
        cnt = _cnt(n)  # Sum
        e, v = 0.0, 0.0
        for w, ch in zip(n.weights, n.children):
            ce, cv = rec(ch)
            e += w * ce
            v += w * w * cv + ce * ce * w * (1.0 - w) / cnt
        return e, v

    return rec(node)


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
    children share scope; with ``n_cols``, every leaf scope index is
    inside [0, n_cols) (the parameter used to be accepted and
    ignored)."""
    if isinstance(node, Leaf):
        total = node.probs.sum() + node.null_prob
        assert abs(total - 1.0) < 1e-6, f"leaf mass {total} != 1"
        assert np.all(np.diff(node.values) > 0), "leaf values not sorted-unique"
        if n_cols is not None:
            assert 0 <= node.scope[0] < n_cols, (
                f"leaf scope {node.scope[0]} outside [0, {n_cols})"
            )
        return
    if isinstance(node, Product):
        seen: set[int] = set()
        for ch in node.children:
            overlap = seen & set(ch.scope)
            assert not overlap, f"product children share scope {overlap}"
            seen |= set(ch.scope)
            validate(ch, n_cols)
        return
    assert abs(sum(node.weights) - 1.0) < 1e-6, "sum weights != 1"
    scopes = {tuple(ch.scope) for ch in node.children}
    assert len(scopes) == 1, "sum children scopes differ"
    for ch in node.children:
        validate(ch, n_cols)
