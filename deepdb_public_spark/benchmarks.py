"""Benchmark corpus loader (reference: benchmarks/job-light — the 70
JOB-light queries + true-cardinality CSV that are the reference's
correctness yardstick, SURVEY.md §5.1).

`benchmarks/fixture-light/` plays that role for the fixture schema:
123 reference-grammar COUNT(*) queries (JOB-light-sized) over 1–5-way
FK joins — supplier/nation/region dimension chains, 4-table stars,
IN / <> / IS NOT NULL / BETWEEN / date predicates, a round-5
extension sweep (same- and cross-column OR incl. 3-disjunct groups,
LIKE / NOT LIKE on brands/types/priorities, NOT IN / NOT BETWEEN,
out-of-dictionary literals), and events-table queries (timestamp +
categorical + numeric predicates, events⋈customer⋈nation chains) —
with golden counts at sf0.01. The 3+-table queries have no dedicated
join model in the test ensemble, so they exercise multi-SPN
factorization.
"""

from __future__ import annotations

import csv
import os

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks")


def load_fixture_light() -> list[tuple[str, int]]:
    """[(sql, true_cardinality_at_sf0.01), ...]"""
    path = os.path.join(
        BENCH_DIR, "fixture-light", "fixture_light_true_cardinalities_sf0.01.csv"
    )
    out = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            out.append((row["query"], int(row["cardinality_true"])))
    return out


def load_fixture_ssb() -> list[tuple[str, int]]:
    """The Star Schema Benchmark flights adapted to the fixture schema
    (reference: the SSB corpus driven through maqp.py
    --evaluate_aqp_queries / aqp_evaluation.py — one of the three
    benchmark suites in the reference's evaluation, SURVEY.md §5.1;
    the raw SSB data itself is unavailable offline, so the 4 flights
    are re-derived against the TPC-H-ish fixture tables, which is how
    SSB itself was derived from TPC-H).

    Q1.x: orders⋈lineitem revenue-from-discount (date window +
    discount band + quantity cap). Q2.x: 5-way snowflake
    lineitem⋈part⋈supplier⋈nation⋈region grouped by brand/type.
    Q3.x: customer- and supplier-side nation rollups with date
    windows. Q4.x: 4/5-way star aggregates. Returns the COUNT(*)
    corpus: [(sql, true_cardinality_at_sf0.01), ...]; the AQP corpus
    with the SSB aggregates (SUM(price*discount), grouped SUM/AVG)
    lives in ssb_aqp_queries.sql next to it."""
    path = os.path.join(
        BENCH_DIR, "fixture-ssb", "ssb_true_cardinalities_sf0.01.csv"
    )
    out = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            out.append((row["query"], int(row["cardinality_true"])))
    return out


def load_fixture_ssb_aqp() -> list[str]:
    path = os.path.join(BENCH_DIR, "fixture-ssb", "ssb_aqp_queries.sql")
    return [l.strip() for l in open(path) if l.strip()]
