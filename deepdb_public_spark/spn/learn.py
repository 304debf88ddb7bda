"""RSPN structure learning (reference:
aqp_spn/custom_spflow/custom_learning.py::learn_mspn, SURVEY.md §2
D1-D4 / §7.3).

Recursive learn-MSPN: try an RDC column split (Product node); else a
KMeans row split (Sum node with stored cluster centers for
incremental updates); below min_instances_slice fit leaves.

Distribution strategy (the Spark-first part): the driver recursion
runs over a bounded numpy sample pulled once per SPN via
``df.sample(...).toPandas()`` — exactly the reference's
samples-per-SPN design (10M default at TB scale; we default lower for
the fixture). The data-scale work (outer-join materialization, leaf
histograms for the FULL table, sizes) happens in Spark
(operators/prep.py + trainer.py); the in-memory recursion is O(sample)
and seed-deterministic. KMeans is hand-rolled Lloyd's in numpy (no
sklearn here); pyspark.ml.KMeans drops in for the top-level split
when a single SPN's sample exceeds driver memory.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .leaves import Leaf
from .nodes import Node, Product, Sum
from .rdc import independent_groups, rdc_matrix


@dataclass
class LearnParams:
    rdc_threshold: float = 0.3
    min_instances_slice: int = 512
    n_clusters: int = 2
    max_sampling_threshold_cols: int = 10_000
    seed: int = 42
    # leaf histogram compression after fitting (reference: maqp.py
    # --post_sampling_factor, default off here; >1 merges distinct
    # values into ~len/factor equal-mass bins, Leaf.compact)
    post_sampling_factor: float = 1.0
    # scope indices whose columns are dictionary-coded categoricals:
    # Leaf.compact must skip them (fractional bin means break exact
    # code matching); the trainer populates this from the table meta
    categorical_scopes: frozenset = frozenset()
    # round 6: tiny relations clamp min_instances_slice to rows//4 so
    # dimension models keep at least ~2 split levels (a pure
    # naive-independence product spreads joint mass over all value
    # cross-combinations and grouped grids prune to empty). Set False
    # to honor min_instances_slice literally — e.g. to force a
    # product-of-leaves model for the sum-free incremental path.
    adaptive_slice_floor: bool = True


def scale_minmax(
    data: np.ndarray,
    lo: np.ndarray | None = None,
    hi: np.ndarray | None = None,
    mean: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Min-max scale to [0,1] (NaN -> column mean). Returns
    (scaled, lo, hi, mean); pass stored lo/hi/mean to scale NEW rows
    identically (incremental-delta routing must impute NULLs with the
    TRAINING mean, not the delta batch's own mean — a NULL-skewed
    delta used to route to a different mixture component than the
    same row would have at training time)."""
    x = data.astype(np.float64).copy()
    d = x.shape[1]
    lo_out = np.zeros(d) if lo is None else lo
    hi_out = np.ones(d) if hi is None else hi
    mean_out = np.zeros(d) if mean is None else mean
    for j in range(d):
        col = x[:, j]
        nan = np.isnan(col)
        if mean is None:
            mean_out[j] = 0.0 if nan.all() else float(np.nanmean(col))
        col[nan] = mean_out[j]
        if lo is None and not nan.all():
            lo_out[j], hi_out[j] = col.min(), col.max()
        span = hi_out[j] - lo_out[j]
        x[:, j] = (col - lo_out[j]) / span if span > 0 else 0.0
    return x, lo_out, hi_out, mean_out


def _kmeans(
    data: np.ndarray, k: int, seed: int, iters: int = 25
):
    """Seeded Lloyd's on min-max-scaled data ->
    (labels, centers, scale_lo, scale_hi, scale_mean)."""
    rng = np.random.default_rng(seed)
    n = len(data)
    x, lo, hi, mean = scale_minmax(data)
    # init from DISTINCT points: two identical initial centers make
    # Lloyd's collapse into one cluster, and the caller would then
    # fall back to an independence product over a correlated slice
    # (e.g. low-cardinality copies: only 2 distinct rows)
    ux = np.unique(x, axis=0)
    centers = ux[rng.choice(len(ux), size=min(k, len(ux)), replace=False)]
    # -1 sentinel: a zeros init could equal a legitimate all-cluster-0
    # first assignment, breaking out before ANY center update (false
    # convergence to one cluster on skewed initializations)
    labels = np.full(n, -1, dtype=np.int64)
    for _ in range(iters):
        dists = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        new_labels = dists.argmin(axis=1)
        if (new_labels == labels).all():
            break
        labels = new_labels
        for c in range(len(centers)):
            mask = labels == c
            if mask.any():
                centers[c] = x[mask].mean(axis=0)
    return labels, centers, lo, hi, mean


def learn_spn(
    data: np.ndarray,
    scope: list[int],
    params: LearnParams | None = None,
    _depth: int = 0,
) -> Node:
    """``data``: (n, len(scope)) float matrix (NaN = NULL); ``scope``:
    global column indices for the matrix columns."""
    params = params or LearnParams()
    n, d = data.shape

    def leaves_product() -> Node:
        ls = [Leaf.fit(scope[j], data[:, j]) for j in range(d)]
        for leaf in ls:
            leaf.categorical = leaf.scope[0] in params.categorical_scopes
            leaf.compact(params.post_sampling_factor)
            leaf.n_rows = n
        if d == 1:
            return ls[0]
        p = Product(ls)
        p.n_rows = n
        return p

    if d == 1:
        leaf = Leaf.fit(scope[0], data[:, 0])
        leaf.categorical = scope[0] in params.categorical_scopes
        leaf.compact(params.post_sampling_factor)
        leaf.n_rows = n
        return leaf
    if n < params.min_instances_slice or _depth > 30:
        # naive factorization (reference: learn_mspn fallback)
        return leaves_product()

    # column split first (d == 1 returned above; the old
    # _last_was_rows gate was vacuously true and is gone — SPFlow's
    # learn_mspn re-attempts the column split after every row split)
    mat = rdc_matrix(
        data,
        seed=params.seed + _depth,
        max_rows=params.max_sampling_threshold_cols,
    )
    groups = independent_groups(mat, params.rdc_threshold)
    if len(groups) > 1:
        children = [
            learn_spn(
                data[:, g],
                [scope[j] for j in g],
                params,
                _depth + 1,
            )
            for g in groups
        ]
        p = Product(children)
        p.n_rows = n
        return p

    labels, centers, lo, hi, mean = _kmeans(
        data, params.n_clusters, params.seed + _depth
    )
    uniq = np.unique(labels)
    if len(uniq) < 2:
        return leaves_product()
    children, weights = [], []
    for c in uniq:
        mask = labels == c
        weights.append(mask.mean())
        children.append(
            learn_spn(data[mask], scope, params, _depth + 1)
        )
    s = Sum(weights, children, cluster_centers=centers[uniq])
    s.scale_lo, s.scale_hi = lo, hi
    s.scale_mean = mean
    s.n_rows = n
    return s
