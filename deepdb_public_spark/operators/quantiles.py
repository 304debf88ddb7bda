"""Exact interpolated percentiles without a single-reducer value sort.

Spark's ``percentile`` aggregate buffers every (value, count) pair
into one per-partition map and merges ALL of them in the single final
reduce task — for a near-unique column (l_extendedprice: 583k
distinct of 600k rows) that is a corpus-sized single-threaded merge +
sort, measured 2.9-3.9s at sf0.1 where the scan itself costs 0.2s
(round 13, guide §1.1 first-principles / §2.5 "single giant key").
At 100 TB the final task is a scale-killer.

``exact_interpolated_percentiles`` computes the identical result with
the textbook two-phase distributed algorithm (sketch then refine):

1. ONE scan: per case, COUNT plus a deterministic-error
   ``approx_percentile`` sketch (Greenwald-Khanna variant, worst-case
   rank error n/accuracy) queried at p-delta / p / p+delta. The
   p+-delta values bracket the true quantile's value by construction
   when delta * n exceeds the sketch's rank error.
2. ONE scan: per case, count_if(x < lo), count_if(lo <= x <= hi) AND
   a ``band_cap``-sliced sort_array(collect_list) of the band values
   — the counts establish the band's exact global rank offset and
   VALIDATE the collected band in the same row (complete iff its
   count is under the cap and the needed ranks fall inside it).
3. Only for cases whose guard fails (sketch bound violated, or tie
   mass past ``band_cap``): one extra scan paying the classic
   ``percentile`` aggregate for those cases — exactness never
   depends on the sketch's error bound holding, and nothing larger
   than ``band_cap`` doubles ever reaches the driver.

The driver then reads the exact rank positions floor((n-1)p) /
ceil((n-1)p) out of the band and interpolates
``lower + (higher - lower) * ((n-1)p - floor((n-1)p))`` — the same
IEEE expression Spark's Percentile and DuckDB's quantile_cont
evaluate, so results are bit-identical to the single-aggregate form.

All scans are conditional-sum fused across cases (guide §1.2/§2.4),
so the cost is 3 linear scans regardless of case count, and nothing
corpus-sized ever reaches one task or the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def _filt(pred: str | None) -> str:
    return f" FILTER (WHERE {pred})" if pred else ""


def _guard(pred: str | None, cond: str) -> str:
    return f"({pred}) AND {cond}" if pred else cond


def exact_interpolated_percentiles(
    df: DataFrame,
    cases: list[tuple[str | None, str, float]],
    accuracy: int = 10000,
    band_delta: float = 0.002,
    band_cap: int = 2_000_000,
) -> list[dict]:
    """``cases``: (pred_sql | None, value_col, prob) per case, preds
    in ``df``'s column namespace. Returns one dict per case:
    ``{"n": int, "exact": float | None, "approx": float | None}``
    where ``exact`` equals ``percentile(col, prob) FILTER (WHERE
    pred)`` bit-for-bit and ``approx`` is the same-accuracy
    ``approx_percentile`` value (for sketch-vs-exact budget flags).
    """
    if not cases:
        return []
    # --- scan 1: counts + sketch bounds --------------------------------
    exprs1 = []
    for i, (pred, col, p) in enumerate(cases):
        plo = max(0.0, p - band_delta)
        phi = min(1.0, p + band_delta)
        exprs1.append(f"count({col}){_filt(pred)} AS n{i}")
        exprs1.append(
            f"approx_percentile({col}, array({plo!r}, {p!r}, {phi!r}), "
            f"{accuracy}){_filt(pred)} AS ap{i}"
        )
    row1 = df.selectExpr(*exprs1).collect()[0]
    meta = []
    for i, (pred, col, p) in enumerate(cases):
        n = int(row1[f"n{i}"] or 0)
        ap = row1[f"ap{i}"]
        if n == 0 or ap is None:
            meta.append(None)
            continue
        idx = (n - 1) * p
        meta.append(
            {
                "n": n,
                "idx": idx,
                "lo_i": math.floor(idx),
                "hi_i": math.ceil(idx),
                "vlo": float(ap[0]),
                "approx": float(ap[1]),
                "vhi": float(ap[2]),
            }
        )
    live = [i for i, m in enumerate(meta) if m is not None]
    if not live:
        return [
            {"n": 0, "exact": None, "approx": None} for _ in cases
        ]
    # --- scan 2: rank offsets + cap-sliced band values, one pass -------
    exprs2 = []
    for i in live:
        pred, col, _p = cases[i]
        m = meta[i]
        vlo, vhi = m["vlo"], m["vhi"]
        in_band = _guard(pred, f"{col} >= {vlo!r} AND {col} <= {vhi!r}")
        exprs2.append(
            f"count_if({_guard(pred, f'{col} < {vlo!r}')}) AS cb{i}"
        )
        exprs2.append(f"count_if({in_band}) AS nb{i}")
        # the slice bounds what reaches the driver; nb (same row, same
        # scan) tells us whether the sliced band is complete
        exprs2.append(
            f"slice(sort_array(collect_list(CASE WHEN {in_band} THEN {col} "
            f"END)), 1, {band_cap + 1}) AS b{i}"
        )
    row2 = df.selectExpr(*exprs2).collect()[0]
    resolved: dict[int, float] = {}
    fallback: list[int] = []
    for i in live:
        m = meta[i]
        cb, nb = int(row2[f"cb{i}"]), int(row2[f"nb{i}"])
        ok = cb <= m["lo_i"] and m["hi_i"] < cb + nb and nb <= band_cap
        if not ok:
            fallback.append(i)
            continue
        band = row2[f"b{i}"]
        vl = float(band[m["lo_i"] - cb])
        vh = float(band[m["hi_i"] - cb])
        resolved[i] = vl + (vh - vl) * (m["idx"] - m["lo_i"])
    if fallback:
        # sketch bound violated or degenerate tie mass: pay the
        # classic aggregate for just these cases, in one job
        row3 = df.selectExpr(
            *[
                f"percentile({cases[i][1]}, {cases[i][2]!r})"
                f"{_filt(cases[i][0])} AS f{i}"
                for i in fallback
            ]
        ).collect()[0]
        for i in fallback:
            resolved[i] = float(row3[f"f{i}"])
    out: list[dict] = []
    for i, _case in enumerate(cases):
        m = meta[i]
        if m is None:
            out.append({"n": 0, "exact": None, "approx": None})
            continue
        out.append(
            {"n": m["n"], "exact": resolved[i], "approx": m["approx"]}
        )
    return out
