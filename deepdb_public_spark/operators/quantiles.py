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
2. Populations no larger than ``band_cap`` keep the round-13 fused
   scan (exact counts + cap-sliced sorted band in ONE pass): even the
   all-ties worst case buffers at most n <= band_cap values in the
   final aggregate task, so the fused form is distribution-safe by
   construction there. Larger populations take a bounded refinement
   loop (round 14 — the round-13 form collected the band in the same
   pass as the counts for EVERY n, so the single final aggregate task
   buffered the ENTIRE ~2*delta*n-row band before the slice or the
   nb <= band_cap guard could apply; at 0.4% of 1e12 rows that is a
   multi-billion-value single-task sort). Each
   iteration is one fused scan of exact counts — count_if(x < lo)
   and count_if(lo <= x <= hi) — which VALIDATE the bracket and
   prove the band size. Cases whose band exceeds ``band_cap`` get
   one more fused scan: a band-restricted sketch (rank error
   nb/accuracy) that shrinks the bracket by ~accuracy/8 per round,
   so the loop needs O(log_accuracy n) rounds for ANY n; a bracket
   that stops shrinking (a single value with tie mass past
   ``band_cap``) exits to the fallback.
3. ONE scan: a fused sort_array(collect_list(...)) of the band
   values, run ONLY for cases whose band was PROVEN <= band_cap by
   the exact counts — the final aggregate task buffers at most
   band_cap doubles per case by construction, never by hope.
4. Only for cases whose guard fails (sketch bound violated, or tie
   mass past ``band_cap``): one extra scan paying the classic
   ``percentile`` aggregate for those cases — exactness never
   depends on the sketch's error bound holding, and nothing larger
   than ``band_cap`` doubles ever reaches one task or the driver.
   (The fallback's per-task state is the DISTINCT-value map, so the
   heavy-tie case that defeats banding is exactly the case the map
   stays small for.)

The driver then reads the exact rank positions floor((n-1)p) /
ceil((n-1)p) out of the band and interpolates
``lower + (higher - lower) * ((n-1)p - floor((n-1)p))`` — the same
IEEE expression Spark's Percentile and DuckDB's quantile_cont
evaluate, so results are bit-identical to the single-aggregate form.

All scans are conditional-sum fused across cases (guide §1.2/§2.4),
so the cost is 3 linear scans for any case count at bench scale
(plus O(log n) refinement scans only when a band overflows), and
nothing corpus-sized ever reaches one task or the driver.
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
    max_refine: int = 6,
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
    # --- small populations: counts + band fused in ONE scan ------------
    # When a case's whole population is <= band_cap, the fused
    # counts+collect aggregate (the round-13 shape) is already
    # distribution-safe: even the all-ties worst case buffers at most
    # n <= band_cap values in the final task. Only populations LARGER
    # than band_cap need the counts-first proof below — so the bench
    # shape stays two scans and the scale shape gets the guarantee.
    resolved: dict[int, float] = {}
    collectable: dict[int, tuple[int, int]] = {}
    fallback: list[int] = []
    small = [i for i in live if meta[i]["n"] <= band_cap]
    pending = [i for i in live if meta[i]["n"] > band_cap]
    if band_cap < 1:
        small, pending = [], []
        fallback.extend(live)
    if small:
        sexprs = []
        for i in small:
            pred, col, _p = cases[i]
            m = meta[i]
            vlo, vhi = m["vlo"], m["vhi"]
            in_band = _guard(
                pred, f"{col} >= {vlo!r} AND {col} <= {vhi!r}"
            )
            sexprs.append(
                f"count_if({_guard(pred, f'{col} < {vlo!r}')}) AS cb{i}"
            )
            sexprs.append(f"count_if({in_band}) AS nb{i}")
            sexprs.append(
                f"slice(sort_array(collect_list(CASE WHEN {in_band} "
                f"THEN {col} END)), 1, {band_cap + 1}) AS b{i}"
            )
        srow = df.selectExpr(*sexprs).collect()[0]
        for i in small:
            m = meta[i]
            cb, nb = int(srow[f"cb{i}"]), int(srow[f"nb{i}"])
            ok = (
                cb <= m["lo_i"]
                and m["hi_i"] < cb + nb
                and nb <= band_cap
            )
            if not ok:
                fallback.append(i)
                continue
            band = srow[f"b{i}"]
            vl = float(band[m["lo_i"] - cb])
            vh = float(band[m["hi_i"] - cb])
            resolved[i] = vl + (vh - vl) * (m["idx"] - m["lo_i"])
    # --- refinement loop (n > band_cap): counts prove the band ---------
    # pending cases carry a (vlo, vhi) bracket; each round one fused
    # scan computes cb = count below vlo and nb = count inside the
    # bracket. A bracket that holds the target ranks and nb <= band_cap
    # is ready to collect; one that holds the ranks but is oversized
    # gets a band-restricted sketch probe (second fused scan) to shrink
    # it ~accuracy/8-fold; a bracket that lost the ranks (sketch error)
    # or stopped shrinking (tie mass > band_cap at one value) falls
    # back to the classic aggregate.
    for _round in range(max_refine):
        if not pending:
            break
        cexprs = []
        for i in pending:
            pred, col, _p = cases[i]
            m = meta[i]
            vlo, vhi = m["vlo"], m["vhi"]
            in_band = _guard(
                pred, f"{col} >= {vlo!r} AND {col} <= {vhi!r}"
            )
            cexprs.append(
                f"count_if({_guard(pred, f'{col} < {vlo!r}')}) AS cb{i}"
            )
            cexprs.append(f"count_if({in_band}) AS nb{i}")
        crow = df.selectExpr(*cexprs).collect()[0]
        refine: list[int] = []
        for i in pending:
            m = meta[i]
            cb, nb = int(crow[f"cb{i}"]), int(crow[f"nb{i}"])
            ok = cb <= m["lo_i"] and m["hi_i"] < cb + nb
            if not ok:
                fallback.append(i)
            elif nb <= band_cap:
                collectable[i] = (cb, nb)
            else:
                m["cb"], m["nb"] = cb, nb
                refine.append(i)
        pending = []
        if not refine:
            break
        rexprs = []
        for i in refine:
            pred, col, _p = cases[i]
            m = meta[i]
            vlo, vhi = m["vlo"], m["vhi"]
            cb, nb = m["cb"], m["nb"]
            in_band = _guard(
                pred, f"{col} >= {vlo!r} AND {col} <= {vhi!r}"
            )
            # target ranks WITHIN the band, padded by 3x the band
            # sketch's worst-case rank error (nb/accuracy) — the next
            # round's exact counts re-validate, so a bad probe only
            # costs a round, never exactness
            pad = 3.0 * nb / accuracy
            qlo = max(0.0, (m["lo_i"] - cb - pad) / nb)
            qhi = min(1.0, (m["hi_i"] - cb + pad) / nb)
            rexprs.append(
                f"approx_percentile({col}, array({qlo!r}, {qhi!r}), "
                f"{accuracy}) FILTER (WHERE {in_band}) AS rp{i}"
            )
        rrow = df.selectExpr(*rexprs).collect()[0]
        for i in refine:
            m = meta[i]
            rp = rrow[f"rp{i}"]
            new_lo, new_hi = float(rp[0]), float(rp[1])
            if (new_lo, new_hi) == (m["vlo"], m["vhi"]):
                # no progress: the band is one value (or a flat run)
                # with tie mass past band_cap — banding cannot help
                fallback.append(i)
            else:
                m["vlo"], m["vhi"] = new_lo, new_hi
                pending.append(i)
    fallback.extend(pending)  # max_refine exhausted
    # --- band collect: fused, proven <= band_cap per case --------------
    if collectable:
        bexprs = []
        for i in collectable:
            pred, col, _p = cases[i]
            m = meta[i]
            in_band = _guard(
                pred, f"{col} >= {m['vlo']!r} AND {col} <= {m['vhi']!r}"
            )
            # the exact counts above proved nb <= band_cap, so the
            # final aggregate task buffers at most band_cap doubles
            # per case; the slice is belt-and-braces for the driver
            bexprs.append(
                f"slice(sort_array(collect_list(CASE WHEN {in_band} "
                f"THEN {col} END)), 1, {band_cap + 1}) AS b{i}"
            )
        brow = df.selectExpr(*bexprs).collect()[0]
        for i, (cb, _nb) in collectable.items():
            m = meta[i]
            band = brow[f"b{i}"]
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
