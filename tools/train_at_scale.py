"""North-star training proof (VERDICT r4 item 1): train one RSPN over
the {orders, lineitem} full-outer join with a >= 1M sample budget so
the MLlib data-parallel top split (spn/trainer.py::_mllib_top_split)
carries the first row split, then verify the m01-class q-error
budgets are unchanged vs the exact plane.

Reference scale anchor: deepdb-public's maqp.py defaults to 10M
samples per SPN; at sf0.1 the {orders, lineitem} join is ~600k rows,
so a 1M budget consumes the ENTIRE relation through the distributed
split — the honest maximum at this scale factor, and the same code
path a 10M-row sf1 run would take.

Usage:
    python tools/train_at_scale.py [--sf-dir /root/testdata/sf0.1]
        [--budget 1000000] [--out TRAIN_AT_SCALE.json] [--cpus 32]

Never run concurrently with bench.py / oracle_check.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--budget", type=int, default=1_000_000)
    ap.add_argument("--driver-row-limit", type=int, default=500_000)
    ap.add_argument("--out", default=os.path.join(REPO, "TRAIN_AT_SCALE.json"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("train-at-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, args.sf_dir)
    t0 = time.perf_counter()
    model = train_spn_model(
        eng.catalog,
        eng.schema,
        {"orders", "lineitem"},
        sample_budget=args.budget,
        driver_row_limit=args.driver_row_limit,
    )
    wall = round(time.perf_counter() - t0, 3)
    used_top_split = "kmeans_fit" in getattr(model, "train_timings", {})

    eng.ensemble = SPNEnsemble(eng.schema)
    eng.ensemble.add_model(model)

    # the m01 q-error battery, answered by THIS model only
    from __spark_entry__ import _M01_CASES, _M03_CASES, _MODEL_QERR_BUDGET

    qerrs = {}
    for qid, sql in _M01_CASES + [
        (qid, sql) for qid, sql in _M03_CASES if "customer" not in sql
    ]:
        q = eng.parse(sql)
        est = float(eng.ensemble.cardinality(q))
        true = int(eng.query(q).collect()[0][0])
        qerrs[qid] = round(max(est / max(true, 1), true / max(est, 1e-9)), 4)

    payload = {
        "sf_dir": args.sf_dir,
        "sample_budget": args.budget,
        "driver_row_limit": args.driver_row_limit,
        "used_mllib_top_split": used_top_split,
        "n_sample_rows": model.sample_size,
        "full_join_size": model.full_join_size,
        "train_wall_sec": wall,
        "phase_timings_sec": getattr(model, "train_timings", {}),
        "qerror_budget": _MODEL_QERR_BUDGET,
        "qerrors": qerrs,
        "all_within_budget": all(v < _MODEL_QERR_BUDGET for v in qerrs.values()),
    }
    line = json.dumps(payload)
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
