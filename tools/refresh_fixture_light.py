"""Refresh the committed fixture-light result CSVs (reference: the
--evaluate_cardinalities / AQP evaluation lifecycles over
benchmarks/job-light). Trains the same 13-model ensemble
tests/test_fixture_light.py uses (singles + relationship pairs, no
dedicated 3-table models, so the multi-SPN factorization path is
exercised), then runs both corpora and writes
results_cardinality_sf0.01.csv / results_aqp_sf0.01.csv.

Usage: python tools/refresh_fixture_light.py [--sf-dir .../sf0.01]
Never run concurrently with bench.py / oracle_check.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BDIR = os.path.join(REPO, "benchmarks", "fixture-light")


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
        .appName("fixture-light-refresh")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from deepdb_public_spark.benchmarks import load_fixture_light
    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.evaluation import (
        evaluate_aqp,
        evaluate_cardinalities,
    )
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, args.sf_dir)
    ens = SPNEnsemble(eng.schema)
    for ts in [
        {"lineitem"}, {"orders"}, {"customer"}, {"part"}, {"supplier"},
        {"nation"}, {"region"}, {"events"},
        {"orders", "lineitem"}, {"customer", "orders"},
        {"part", "lineitem"}, {"supplier", "lineitem"},
        {"customer", "nation"},
    ]:
        ens.add_model(train_spn_model(eng.catalog, eng.schema, ts, 60_000))
    eng.ensemble = ens

    card_queries = [sql for sql, _t in load_fixture_light()]
    card = evaluate_cardinalities(
        eng, card_queries,
        output_csv=os.path.join(BDIR, "results_cardinality_sf0.01.csv"),
    )
    aqp_queries = [
        l.strip()
        for l in open(os.path.join(BDIR, "aqp_queries.sql"))
        if l.strip()
    ]
    aqp = evaluate_aqp(
        eng, aqp_queries,
        output_csv=os.path.join(BDIR, "results_aqp_sf0.01.csv"),
    )
    print(json.dumps({"cardinality": card, "aqp": aqp}, default=str), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
