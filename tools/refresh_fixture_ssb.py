"""Refresh the committed fixture-ssb result CSVs (reference: the SSB
suite run through maqp.py --evaluate_aqp_queries /
--evaluate_cardinalities — SURVEY.md §5.1; SSB data is unavailable
offline so the flights are re-derived against the fixture schema,
see deepdb_public_spark/benchmarks.py::load_fixture_ssb).

Trains the snowflake ensemble tests/test_fixture_ssb.py uses
(singles + relationship pairs only — every 4/5-way SSB flight must
go through multi-SPN factorization, including the grouped
factorized-AQP path), then runs both corpora and writes
results_cardinality_sf0.01.csv / results_aqp_sf0.01.csv.

Usage: python tools/refresh_fixture_ssb.py [--sf-dir .../sf0.01]
Never run concurrently with bench.py / oracle_check.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BDIR = os.path.join(REPO, "benchmarks", "fixture-ssb")

SSB_ENSEMBLE_TABLE_SETS = [
    {"lineitem"}, {"orders"}, {"customer"}, {"part"}, {"supplier"},
    {"nation"}, {"region"},
    {"orders", "lineitem"}, {"customer", "orders"},
    {"part", "lineitem"}, {"supplier", "lineitem"},
    {"customer", "nation"}, {"supplier", "nation"}, {"nation", "region"},
]


def build_ssb_ensemble(eng, sample_budget: int = 60_000):
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    ens = SPNEnsemble(eng.schema)
    for ts in SSB_ENSEMBLE_TABLE_SETS:
        ens.add_model(train_spn_model(eng.catalog, eng.schema, ts, sample_budget))
    return ens


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("fixture-ssb-refresh")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from deepdb_public_spark.benchmarks import (
        load_fixture_ssb,
        load_fixture_ssb_aqp,
    )
    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.evaluation import (
        evaluate_aqp,
        evaluate_cardinalities,
    )

    eng = Engine(spark, args.sf_dir)
    eng.ensemble = build_ssb_ensemble(eng)

    card_queries = [sql for sql, _t in load_fixture_ssb()]
    card = evaluate_cardinalities(
        eng, card_queries,
        output_csv=os.path.join(BDIR, "results_cardinality_sf0.01.csv"),
    )
    card.pop("results", None)
    aqp = evaluate_aqp(
        eng, load_fixture_ssb_aqp(),
        output_csv=os.path.join(BDIR, "results_aqp_sf0.01.csv"),
    )
    print(json.dumps({"cardinality": card, "aqp": aqp}, default=str), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
