"""North-star training proof, v2 (VERDICT r5 item 1): train one RSPN
over the {orders, lineitem} full-outer join at TWO scales in one run —

1. the native sf0.1 relation (~600k join rows), where a 1M budget
   consumes everything through the MLlib top split (the round-5 run);
2. the relation REPLICATED ~10x with shifted keys (>=6M join rows),
   where the same 1M budget is SMALLER than the relation, so the
   distributed top split must SUBSAMPLE per cluster
   (`spn/trainer.py::_mllib_top_split`, fraction = budget/rows < 1) —
   the exact shape of the reference's 10M-samples-over-billions
   default (maqp.py defaults +
   join_data_preparation.py::generate_n_samples).

Each run records wall time, the per-phase breakdown, the sampling
fraction, and the m01-class q-error battery answered by the trained
model against the exact plane ON THE SAME (replicated) data.

Usage:
    python tools/train_at_scale.py [--sf-dir /root/testdata/sf0.1]
        [--budget 1000000] [--replicate 10] [--out TRAIN_AT_SCALE.json]
        [--cpus 32]

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

KEY_SHIFT = 100_000_000  # far above any sf0.1 key


def _replicate(df, key_cols: list[str], k: int, perturb=None):
    """k copies with join keys shifted per replica (FK pairs shift
    consistently, so the join graph is preserved) and an optional
    value perturbation so replicas aren't bit-identical rows."""
    from pyspark.sql import functions as F

    parts = [df]
    for r in range(1, k):
        rep = df
        for c in key_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(r * KEY_SHIFT))
        if perturb is not None:
            rep = perturb(rep, r)
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _run(eng, spark, budget: int, driver_row_limit: int, cases) -> dict:
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    t0 = time.perf_counter()
    model = train_spn_model(
        eng.catalog,
        eng.schema,
        {"orders", "lineitem"},
        sample_budget=budget,
        driver_row_limit=driver_row_limit,
    )
    wall = round(time.perf_counter() - t0, 3)

    eng.ensemble = SPNEnsemble(eng.schema)
    eng.ensemble.add_model(model)

    qerrs = {}
    for qid, sql in cases:
        q = eng.parse(sql)
        est = float(eng.ensemble.cardinality(q))
        true = int(eng.query(q).collect()[0][0])
        qerrs[qid] = round(max(est / max(true, 1), true / max(est, 1e-9)), 4)

    return {
        "used_mllib_top_split": "kmeans_fit" in getattr(model, "train_timings", {}),
        "n_join_rows": model.full_join_size,
        "n_sample_rows": model.sample_size,
        "sample_fraction": round(
            model.sample_size / max(model.full_join_size, 1.0), 4
        ),
        "subsampled": model.sample_size < 0.999 * model.full_join_size,
        "train_wall_sec": wall,
        "phase_timings_sec": getattr(model, "train_timings", {}),
        "qerrors": qerrs,
    }


def _run_on_demand_joint(eng, spark, budget: int) -> dict:
    """m22 at scale (VERDICT r10 item 6): the ensemble starts with
    ONLY a {customer} model; the grouped query's {orders, lineitem}
    anchor has no covering model, so SPNEnsemble._train_on_demand
    trains the budgeted JOINT 2-table RSPN lazily AT QUERY TIME
    against the (replicated) catalog — proving the on-demand path's
    outer-join sample obeys the same budget discipline at the >=6M-row
    join as the eager D1 path above. Gates mirror the m22 entry:
    per-group COUNT rel-error < 0.25 and AVG rel-error < 0.15."""
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    cust = train_spn_model(eng.catalog, eng.schema, {"customer"}, 60_000)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(cust)
    ens.enable_on_demand_training(eng.catalog, sample_budget=budget)
    sql = (
        "SELECT orders.o_orderpriority, COUNT(*) AS cnt, "
        "AVG(lineitem.l_extendedprice) AS ap "
        "FROM customer, orders, lineitem "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND orders.o_orderkey = lineitem.l_orderkey "
        "AND lineitem.l_discount <= 0.06 "
        "GROUP BY orders.o_orderpriority"
    )
    q = eng.parse(sql)
    t0 = time.perf_counter()
    est = {r["o_orderpriority"]: r for r in ens.aqp(q)}
    wall = round(time.perf_counter() - t0, 3)
    joint = next(
        (m for m in ens.models if m.table_set == {"orders", "lineitem"}), None
    )
    assert joint is not None, "on-demand joint model was not trained"
    exact = {r["o_orderpriority"]: r for r in eng.query(q).collect()}
    rel = lambda a, b: abs(a - b) / max(abs(b), 1e-9)  # noqa: E731
    groups = {
        str(k): {
            "cnt_rel": round(rel(est[k]["cnt"], exact[k]["cnt"]), 4),
            "avg_rel": round(rel(est[k]["ap"], exact[k]["ap"]), 4),
        }
        for k in sorted(exact)
    }
    return {
        "od_trained": True,
        "aqp_wall_sec_incl_lazy_train": wall,
        "n_join_rows": joint.full_join_size,
        "n_sample_rows": joint.sample_size,
        "sample_fraction": round(
            joint.sample_size / max(joint.full_join_size, 1.0), 4
        ),
        "subsampled": joint.sample_size < 0.999 * joint.full_join_size,
        "groups": groups,
        "all_ok": all(
            g["cnt_rel"] < 0.25 and g["avg_rel"] < 0.15
            for g in groups.values()
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--budget", type=int, default=1_000_000)
    ap.add_argument("--replicate", type=int, default=10)
    ap.add_argument("--driver-row-limit", type=int, default=500_000)
    ap.add_argument("--out", default=os.path.join(REPO, "TRAIN_AT_SCALE.json"))
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

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
    from __spark_entry__ import _M01_CASES, _M03_CASES, _MODEL_QERR_BUDGET

    cases = _M01_CASES + [
        (qid, sql) for qid, sql in _M03_CASES if "customer" not in sql
    ]

    eng = Engine(spark, args.sf_dir)
    runs = {"1x": _run(eng, spark, args.budget, args.driver_row_limit, cases)}

    if args.replicate > 1:
        k = args.replicate
        # replicate with consistent key shifts; perturb one value
        # column per table so replicas aren't bit-identical
        eng.catalog["orders"] = _replicate(
            eng.catalog["orders"],
            ["o_orderkey", "o_custkey"],
            k,
            perturb=lambda d, r: d.withColumn(
                "o_totalprice", F.col("o_totalprice") + F.lit(float(r))
            ),
        )
        eng.catalog["lineitem"] = _replicate(
            eng.catalog["lineitem"],
            ["l_orderkey", "l_partkey", "l_suppkey"],
            k,
            perturb=lambda d, r: d.withColumn(
                "l_extendedprice", F.col("l_extendedprice") + F.lit(float(r))
            ),
        )
        # customer keys must shift too for the boundary-fanout join
        # (customer -> orders) to stay 1:many instead of 1:(k*many)
        eng.catalog["customer"] = _replicate(
            eng.catalog["customer"], ["c_custkey"], k
        )
        runs[f"{k}x"] = _run(eng, spark, args.budget, args.driver_row_limit, cases)
        runs[f"{k}x_on_demand_joint"] = _run_on_demand_joint(
            eng, spark, args.budget
        )

    budget = _MODEL_QERR_BUDGET
    payload = {
        "sf_dir": args.sf_dir,
        "sample_budget": args.budget,
        "driver_row_limit": args.driver_row_limit,
        "replicate": args.replicate,
        "qerror_budget": budget,
        "runs": runs,
        "all_within_budget": all(
            v < budget
            for r in runs.values()
            for v in r.get("qerrors", {}).values()
        ),
        "subsample_path_proven": any(r["subsampled"] for r in runs.values()),
        "on_demand_joint_ok": all(
            r["all_ok"] for n, r in runs.items() if n.endswith("on_demand_joint")
        ),
    }
    line = json.dumps(payload)
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
