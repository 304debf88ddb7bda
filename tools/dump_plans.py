"""Dump .explain("formatted") for named entries to plans/r14/
(override with SPARK_GRAFT_PLANS_DIR).

Usage:
    python tools/dump_plans.py before x66 x67 x68
    python tools/dump_plans.py after x66_pq_encode

Writes plans/<round>/<entry>_<suffix>.txt for every registry entry whose
name starts with one of the given prefixes. Runs at the bench SF
(sf0.1) and bench-like session settings so the captured plan is the
one the bench executes. Entries whose runner performs eager driver
work (Lloyd fits, index builds) pay that work once here — the dumped
plan is the final returned DataFrame's, the same object bench.py
collects.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    prefixes = sys.argv[2:]
    assert suffix in ("before", "after"), "suffix must be before|after"
    assert prefixes, "give at least one entry prefix"

    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("deepdb_dump_plans")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = [n for n in queries if any(n.startswith(p) for p in prefixes)]
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", os.path.join(REPO, "plans", "r14")
    )
    os.makedirs(out_dir, exist_ok=True)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = queries[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
