"""Randomized Dependence Coefficient for column splits (reference:
aqp_spn/custom_spflow/custom_learning.py::get_split_cols_RDC_py,
SURVEY.md §2 D2; method from Lopez-Paz et al., "The Randomized
Dependence Coefficient", NIPS 2013).

Pipeline per column pair: empirical copula transform (ranks/n) ->
random Fourier features (sin/cos of random projections) -> largest
canonical correlation. Hand-rolled in numpy (no scipy/sklearn in this
environment): ranks via argsort, CCA via whitened cross-covariance
SVD with ridge regularization.

Scale note: RDC runs on the driver over a bounded sample (the
reference subsamples with max_sampling_threshold_cols=10k too); the
distributed part of training is sampling + leaf aggregation, not this
O(sample * k) kernel.
"""

from __future__ import annotations

import numpy as np


def _copula(x: np.ndarray) -> np.ndarray:
    """Empirical CDF transform (AVERAGE ranks / n), NaNs -> 0.5.

    Average ranks for ties are load-bearing, not cosmetic: ordinal
    (row-order) ranks turn every tie run into a shared row-index ramp,
    so two INDEPENDENT low-cardinality columns (skewed flags, nn_
    indicators, near-constant slices after row splits) presented
    near-identical ramps and scored RDC far above the dependence
    threshold — blocking Product splits and degrading structure to
    row-split-only SPNs. With average ranks a constant column maps to
    a constant 0.5+ and contributes no spurious correlation."""
    x = np.asarray(x, dtype=np.float64)
    out = np.full(len(x), 0.5)
    ok = ~np.isnan(x)
    n = int(ok.sum())
    if n == 0:
        return out
    xs = x[ok]
    order = np.argsort(xs, kind="mergesort")
    sorted_vals = xs[order]
    ranks = np.empty(n)
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        # average rank of the tie run [i, j] (1-based ranks)
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    out[ok] = ranks / n
    return out


def _rff(u: np.ndarray, k: int, s: float, rng: np.random.Generator) -> np.ndarray:
    """Random Fourier features of a 1-D copula column -> (n, 2k)."""
    w = rng.standard_normal((1, k)) * s
    b = rng.uniform(0, 2 * np.pi, size=k)
    proj = u[:, None] @ w + b
    return np.concatenate([np.sin(proj), np.cos(proj)], axis=1)


def _max_canonical_corr(fx: np.ndarray, fy: np.ndarray, ridge: float = 1e-6) -> float:
    """Largest canonical correlation via whitened cross-covariance."""
    fx = fx - fx.mean(axis=0)
    fy = fy - fy.mean(axis=0)
    n = len(fx)
    cxx = fx.T @ fx / n + ridge * np.eye(fx.shape[1])
    cyy = fy.T @ fy / n + ridge * np.eye(fy.shape[1])
    cxy = fx.T @ fy / n

    def inv_sqrt(m: np.ndarray) -> np.ndarray:
        vals, vecs = np.linalg.eigh(m)
        vals = np.clip(vals, 1e-12, None)
        return vecs @ np.diag(vals**-0.5) @ vecs.T

    m = inv_sqrt(cxx) @ cxy @ inv_sqrt(cyy)
    s = np.linalg.svd(m, compute_uv=False)
    return float(np.clip(s[0], 0.0, 1.0))


def rdc(
    x: np.ndarray, y: np.ndarray, k: int = 20, s: float = 1 / 6, seed: int = 42
) -> float:
    rng = np.random.default_rng(seed)
    return _max_canonical_corr(
        _rff(_copula(x), k, s, rng), _rff(_copula(y), k, s, rng)
    )


def rdc_matrix(
    data: np.ndarray, k: int = 20, s: float = 1 / 6, seed: int = 42,
    max_rows: int = 10_000,
) -> np.ndarray:
    """Pairwise RDC over the columns of (n, d) data, subsampled to
    max_rows (mirrors the reference's max_sampling_threshold_cols)."""
    n, d = data.shape
    rng = np.random.default_rng(seed)
    if n > max_rows:
        data = data[rng.choice(n, max_rows, replace=False)]
    feats = [
        _rff(_copula(data[:, j]), k, s, np.random.default_rng(seed + j))
        for j in range(d)
    ]
    out = np.eye(d)
    for i in range(d):
        for j in range(i + 1, d):
            out[i, j] = out[j, i] = _max_canonical_corr(feats[i], feats[j])
    return out


def independent_groups(rdc_mat: np.ndarray, threshold: float = 0.3) -> list[list[int]]:
    """Connected components of the column-dependency graph (edges where
    RDC >= threshold) — each component becomes a Product-node child."""
    d = rdc_mat.shape[0]
    seen = [False] * d
    groups = []
    for start in range(d):
        if seen[start]:
            continue
        comp, stack = [], [start]
        seen[start] = True
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in range(d):
                if not seen[v] and rdc_mat[u, v] >= threshold:
                    seen[v] = True
                    stack.append(v)
        groups.append(sorted(comp))
    return groups
