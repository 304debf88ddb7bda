"""Evaluation harnesses (reference: evaluation/
cardinality_evaluation.py::evaluate_cardinalities and
aqp_evaluation.py — SURVEY.md §5.1).

Same contract as the reference: a list of SQL queries (the JOB-light
shape), per-query latency + estimate vs ground truth, q-error /
relative-error summaries. Ground truth comes from the exact plane
(Spark) instead of Postgres.
"""

from __future__ import annotations

import csv
import time
from dataclasses import dataclass

import numpy as np

from .engine import Engine


@dataclass
class CardinalityResult:
    query: str
    estimate: float
    truth: int
    q_error: float
    latency_ms: float


def q_error(est: float, true: float) -> float:
    return float(max(est / max(true, 1.0), true / max(est, 1e-9)))


def evaluate_cardinalities(
    engine: Engine,
    queries: list[str],
    output_csv: str | None = None,
    max_variants: int = 1,
) -> dict:
    """Per-query model-plane estimate vs exact-plane truth. Returns
    summary stats; optionally writes the reference-style CSV
    (query, cardinality_predict, cardinality_true, latency_ms).
    ``max_variants`` averages several factorization variants for
    queries needing the multi-SPN path (reference --max_variants)."""
    results: list[CardinalityResult] = []
    for sql in queries:
        q = engine.parse(sql)
        t0 = time.perf_counter()
        est = float(engine.ensemble.cardinality(q, max_variants=max_variants))
        latency = (time.perf_counter() - t0) * 1000
        truth = int(engine.query(q).collect()[0][0])
        results.append(
            CardinalityResult(sql, est, truth, q_error(est, truth), latency)
        )
    if output_csv:
        with open(output_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["query", "cardinality_predict", "cardinality_true", "q_error", "latency_ms"]
            )
            for r in results:
                w.writerow([r.query, r.estimate, r.truth, r.q_error, r.latency_ms])
    qs = np.array([r.q_error for r in results])
    lat = np.array([r.latency_ms for r in results])
    return {
        "n": len(results),
        "median_q_error": float(np.median(qs)),
        "p95_q_error": float(np.percentile(qs, 95)),
        "max_q_error": float(qs.max()),
        "mean_latency_ms": float(lat.mean()),
        "results": results,
    }


def evaluate_aqp(
    engine: Engine, queries: list[str], output_csv: str | None = None
) -> dict:
    """Relative error of model-plane aggregates vs exact answers
    (reference: aqp_evaluation.py). Group-by queries compare per-group;
    missing/extra groups count as relative error 1. A query whose
    group-by grid exceeds the model plane's cell cap is recorded as
    skipped (``skipped_queries``) instead of aborting the run — the
    exact-plane fallback in Engine.estimate would make its error
    trivially 0, which is not a model-quality measurement."""
    from .spn.model import GroupByExplosion

    rows = []
    skipped: list[str] = []
    for sql in queries:
        q = engine.parse(sql)
        t0 = time.perf_counter()
        try:
            model_rows = engine.ensemble.aqp(q)
        except GroupByExplosion:
            skipped.append(sql)
            continue
        latency = (time.perf_counter() - t0) * 1000
        exact_rows = [r.asDict() for r in engine.query(q).collect()]
        gb = [c for _t, c in q.group_bys]

        def key(r: dict):
            return tuple(r[c] for c in gb) if gb else ()

        model_by = {key(r): r for r in model_rows}
        exact_by = {key(r): r for r in exact_rows}
        agg_cols = [c for c in (exact_rows[0] if exact_rows else {}) if c not in gb]
        for k in set(model_by) | set(exact_by):
            if k not in model_by or k not in exact_by:
                rows.append((sql, k, None, 1.0, latency))
                continue
            for c in agg_cols:
                t, m = exact_by[k][c], model_by[k][c]
                rel = abs(m - t) / max(abs(t), 1e-9)
                rows.append((sql, k, c, float(rel), latency))
    if output_csv:
        with open(output_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["query", "group", "aggregate", "relative_error", "latency_ms"])
            w.writerows(rows)
    errs = np.array([r[3] for r in rows]) if rows else np.array([0.0])
    return {
        "n_cells": len(rows),
        "mean_relative_error": float(errs.mean()),
        "p95_relative_error": float(np.percentile(errs, 95)),
        "max_relative_error": float(errs.max()),
        "skipped_queries": skipped,
    }
