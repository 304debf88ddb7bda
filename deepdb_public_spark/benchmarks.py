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
