"""maqp-style command line (reference: maqp.py — the repo's primary
user interface; SURVEY.md §3 lifecycles 3.1-3.3).

The reference drives everything through one script with action flags:

    python maqp.py --generate_hdf ...
    python maqp.py --generate_ensemble --ensemble_strategy rdc_based ...
    python maqp.py --evaluate_cardinalities --ensemble_location ... \
        --query_file_location benchmarks/job-light/sql/queries.sql
    python maqp.py --evaluate_aqp_queries ... [--confidence_intervals]

This module mirrors that surface Spark-first, with the same action
and knob names wherever a counterpart exists. What changes is the
substrate, not the lifecycle: staging is parquet instead of HDF5
(`spark.read.parquet` replaces `--generate_hdf` entirely — there is
no conversion step to run), training samples come from distributed
outer joins instead of pandas, and ground truth comes from the exact
Spark plane instead of Postgres.

    python -m deepdb_public_spark --data_dir /data/sf0.01 \
        --generate_ensemble --ensemble_strategy relationship \
        --samples_per_spn 60000 --ensemble_path /tmp/ens.pkl

    python -m deepdb_public_spark --data_dir /data/sf0.01 \
        --evaluate_cardinalities --ensemble_path /tmp/ens.pkl \
        --query_file_location queries.sql --target_path out.csv

    python -m deepdb_public_spark --data_dir /data/sf0.01 \
        --execute_query "SELECT COUNT(*) FROM orders" --plane exact
"""

from __future__ import annotations

import argparse
import sys

from .engine import Engine, default_session
from .evaluation import evaluate_aqp, evaluate_cardinalities


def load_query_file(path: str) -> list[str]:
    """One SQL query per line (the reference's job-light file format);
    blank lines and #-comments are skipped."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip().rstrip(";")
            if line and not line.startswith("#"):
                out.append(line)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="deepdb_public_spark",
        description="PySpark-native DeepDB: train RSPN ensembles, "
        "estimate cardinalities/aggregates, execute exact SQL.",
    )
    p.add_argument("--data_dir", required=True, help="directory of <table>.parquet files")
    p.add_argument("--cpus", default="*", help="local[] core count for a new session")
    p.add_argument("--schema_json",
                   help="dataset declaration (tables, PKs, FK edges, "
                        "irrelevant attributes) as JSON — the reference's "
                        "per-dataset schemas/<dataset>/schema.py, declared "
                        "instead of coded; default: the fixture schema")

    act = p.add_argument_group("actions (exactly one)")
    act.add_argument("--generate_ensemble", action="store_true")
    act.add_argument("--evaluate_cardinalities", action="store_true")
    act.add_argument("--evaluate_aqp_queries", action="store_true")
    act.add_argument("--evaluate_confidence_intervals", action="store_true")
    act.add_argument("--generate_sampled_parquet", action="store_true",
                     help="stage seeded table samples + sample-rate schema (C6; "
                     "the reference's --generate_sampled_hdfs)")
    act.add_argument("--execute_query", metavar="SQL")
    act.add_argument("--generate_ground_truth", action="store_true",
                     help="run the query file ONCE on the exact plane "
                     "and pickle {sql: rows} to --target_path "
                     "(reference --aqp_ground_truth / "
                     "--cardinalities_ground_truth lifecycles)")
    act.add_argument("--update_ensemble", action="store_true",
                     help="absorb an insert/delete delta into the "
                     "pickled ensemble's single-table models without "
                     "retraining (D5 + delete extension)")

    t = p.add_argument_group("training (--generate_ensemble)")
    t.add_argument("--ensemble_strategy", default="single",
                   choices=["single", "relationship", "rdc_based"])
    t.add_argument("--samples_per_spn", type=int, default=100_000)
    t.add_argument("--ensemble_path", help="pickle path to write/read the ensemble")
    t.add_argument("--tables", help="comma list; default = all schema tables")
    t.add_argument("--ensemble_max_no_joins", type=int, default=2,
                   help="rdc_based: max FK edges per join model")
    t.add_argument("--ensemble_budget_factor", type=float, default=2.0,
                   help="rdc_based: join-model table slots / base tables")
    t.add_argument("--rdc_threshold", type=float, default=0.3)
    t.add_argument("--post_sampling_factor", type=float, default=1.0,
                   help="compress leaf histograms ~len/factor after "
                        "learning (reference maqp.py knob; 1 = off)")
    t.add_argument("--seed", type=int, default=42)
    t.add_argument("--pairwise_rdc_path",
                   help="with --generate_ensemble: also compute pairwise "
                   "RDC over non-key columns and persist it with the "
                   "ensemble (reference artifact for rdc_spn_selection)")

    e = p.add_argument_group("evaluation (--evaluate_*)")
    e.add_argument("--query_file_location", help="SQL file, one query per line")
    e.add_argument("--target_path", help="output CSV path")
    e.add_argument("--confidence", type=float, default=0.95)
    e.add_argument("--max_variants", type=int, default=1,
                   help="average up to N factorization variants for "
                   "multi-SPN cardinality estimates (reference flag)")
    e.add_argument("--ground_truth_path",
                   help="pickled truths from --generate_ground_truth; "
                   "evaluations then skip the exact plane")
    e.add_argument("--rdc_spn_selection", action="store_true",
                   help="rank factorization anchors by pairwise RDC of "
                   "jointly-covered condition columns (needs an ensemble "
                   "trained with --pairwise_rdc_path, or a sidecar pickle "
                   "passed as the flag's companion artifact)")

    s = p.add_argument_group("sampled staging (--generate_sampled_parquet)")
    s.add_argument("--staged_dir", help="output directory for staged parquet")
    s.add_argument("--sample_fraction", type=float, default=0.1)

    u = p.add_argument_group("incremental updates (--update_ensemble)")
    u.add_argument("--update_table", help="table the delta belongs to")
    u.add_argument("--delta_filter",
                   help="SQL boolean expression selecting the delta "
                   "rows inside <data_dir>/<table>.parquet, e.g. "
                   "\"l_orderkey %% 10 < 3\"; or pass --delta_dir")
    u.add_argument("--delta_dir",
                   help="directory holding <table>.parquet with ONLY "
                   "the delta rows (alternative to --delta_filter)")
    u.add_argument("--delete", action="store_true",
                   help="remove the delta instead of absorbing it")

    q = p.add_argument_group("query execution (--execute_query)")
    q.add_argument("--plane", default="exact", choices=["exact", "model"],
                   help="exact: Spark SQL on the data; model: RSPN estimate "
                   "(needs --ensemble_path)")
    q.add_argument("--explain", action="store_true",
                   help="model plane: print the factor decomposition "
                   "(anchor + per-edge factors whose product is the "
                   "estimate; reference verbose output). exact plane: "
                   "print the formatted physical plan")
    return p


def _require(args, flag: str, value) -> None:
    if value is None:
        raise SystemExit(f"--{flag} is required for this action")


def _load_ensemble(eng: Engine, path: str, rdc_spn_selection: bool = False):
    from .spn.ensemble import SPNEnsemble

    eng.ensemble = SPNEnsemble.load(path, eng.schema)
    if rdc_spn_selection and eng.ensemble.pairwise_rdc is None:
        raise SystemExit(
            "--rdc_spn_selection needs an ensemble trained with "
            "--pairwise_rdc_path (no pairwise-RDC artifact in the pickle)"
        )
    if not rdc_spn_selection:
        # the stored artifact is opt-in at query time (reference flag)
        eng.ensemble.pairwise_rdc = None
    return eng.ensemble


def _cmd_generate_ensemble(eng: Engine, args) -> int:
    from .spn.ensemble import (
        create_rdc_ensemble,
        create_relationship_ensemble,
        create_single_table_ensemble,
    )

    tables = (
        args.tables.split(",") if args.tables else sorted(eng.schema.tables)
    )
    if args.ensemble_strategy == "single":
        ens = create_single_table_ensemble(
            eng.catalog, eng.schema, tables, args.samples_per_spn, seed=args.seed
        )
    elif args.ensemble_strategy == "relationship":
        rids = sorted(
            r.identifier
            for r in eng.schema.relationships.values()
            if r.start in tables and r.end in tables
        )
        ens = create_relationship_ensemble(
            eng.catalog, eng.schema, rids, args.samples_per_spn, seed=args.seed
        )
    else:
        ens = create_rdc_ensemble(
            eng.catalog,
            eng.schema,
            tables,
            max_no_joins=args.ensemble_max_no_joins,
            rdc_threshold=args.rdc_threshold,
            budget_factor=args.ensemble_budget_factor,
            sample_budget=args.samples_per_spn,
            seed=args.seed,
        )
    if args.post_sampling_factor > 1:
        # post-learning leaf compression, exactly where the reference
        # applies post_sampling_factor (after structure learning)
        from .spn.nodes import iter_leaves

        for model in ens.models:
            for leaf in iter_leaves(model.root):
                # dictionary-coded leaves must never compact: merged
                # bin means break exact code matching (the reference
                # compresses only IdentityNumericLeaf)
                cm = model.meta.columns.get(
                    model.column_names[leaf.scope[0]]
                )
                leaf.categorical = cm is not None and cm.kind == "categorical"
                leaf.compact(args.post_sampling_factor)
    if args.pairwise_rdc_path:
        import pickle as _pickle

        from .spn.ensemble import compute_pairwise_rdc

        pairwise = compute_pairwise_rdc(
            eng.catalog, eng.schema, tables, seed=args.seed
        )
        ens.enable_rdc_selection(pairwise)
        with open(args.pairwise_rdc_path, "wb") as f:
            _pickle.dump(pairwise, f)
        print(f"pairwise RDC: {len(pairwise)} column pairs -> {args.pairwise_rdc_path}")
    eng.ensemble = ens
    if args.ensemble_path:
        ens.save(args.ensemble_path)
    for m in ens.models:
        print(
            f"model {sorted(m.table_set)}: full_join_size={m.full_join_size:.0f} "
            f"sample={m.sample_size} cols={len(m.column_names)}"
        )
    s = ens.stats()
    print(
        f"ensemble: {len(ens.models)} models, "
        f"{s['total_bytes'] / 1e6:.2f} MB pickled"
        + (f" -> {args.ensemble_path}" if args.ensemble_path else "")
    )
    return 0


def _ground_truth(args):
    if not args.ground_truth_path:
        return None
    from .evaluation import load_ground_truth

    return load_ground_truth(args.ground_truth_path)


def _cmd_generate_ground_truth(eng: Engine, args) -> int:
    from .evaluation import generate_ground_truth

    _require(args, "query_file_location", args.query_file_location)
    _require(args, "target_path", args.target_path)
    truth = generate_ground_truth(
        eng, load_query_file(args.query_file_location), args.target_path
    )
    print(f"{len(truth)} ground truths -> {args.target_path}")
    return 0


def _cmd_evaluate_cardinalities(eng: Engine, args) -> int:
    _require(args, "ensemble_path", args.ensemble_path)
    _require(args, "query_file_location", args.query_file_location)
    _load_ensemble(eng, args.ensemble_path, args.rdc_spn_selection)
    summary = evaluate_cardinalities(
        eng,
        load_query_file(args.query_file_location),
        args.target_path,
        max_variants=args.max_variants,
        ground_truth=_ground_truth(args),
    )
    print(
        f"n={summary['n']} median_q_error={summary['median_q_error']:.3f} "
        f"p95_q_error={summary['p95_q_error']:.3f} "
        f"max_q_error={summary['max_q_error']:.3f} "
        f"mean_latency_ms={summary['mean_latency_ms']:.1f}"
    )
    return 0


def _cmd_evaluate_aqp(eng: Engine, args) -> int:
    _require(args, "ensemble_path", args.ensemble_path)
    _require(args, "query_file_location", args.query_file_location)
    _load_ensemble(eng, args.ensemble_path, args.rdc_spn_selection)
    summary = evaluate_aqp(
        eng,
        load_query_file(args.query_file_location),
        args.target_path,
        ground_truth=_ground_truth(args),
    )
    print(
        f"n_cells={summary['n_cells']} "
        f"mean_relative_error={summary['mean_relative_error']:.4f} "
        f"p95_relative_error={summary['p95_relative_error']:.4f}"
    )
    return 0


def _cmd_evaluate_cis(eng: Engine, args) -> int:
    from .evaluation import evaluate_confidence_intervals

    _require(args, "ensemble_path", args.ensemble_path)
    _require(args, "query_file_location", args.query_file_location)
    eng.ensemble = _load_ensemble(eng, args.ensemble_path, args.rdc_spn_selection)
    summary = evaluate_confidence_intervals(
        eng,
        load_query_file(args.query_file_location),
        confidence=args.confidence,
        output_csv=args.target_path,
        ground_truth=_ground_truth(args),
    )
    print(
        f"n={summary['n_cells']} confidence={args.confidence} "
        f"coverage={summary['coverage']:.3f} "
        f"mean_rel_halfwidth={summary['mean_rel_halfwidth']:.4f}"
    )
    return 0


def _cmd_generate_sampled(eng: Engine, args) -> int:
    from .operators.prep import stage_sampled_tables

    _require(args, "staged_dir", args.staged_dir)
    fractions = {t: args.sample_fraction for t in eng.schema.tables}
    staged, staged_schema = stage_sampled_tables(
        eng.catalog, eng.schema, args.staged_dir, fractions, seed=args.seed
    )
    for t in sorted(staged):
        rate = staged_schema.tables[t].sample_rate
        print(f"staged {t}: sample_rate={rate:.4f}")
    print(f"staged {len(staged)} tables -> {args.staged_dir} "
          "(train on this dir; sample_rate scaling is applied at estimate time)")
    return 0


def _cmd_execute_query(eng: Engine, args) -> int:
    if args.plane == "model":
        _require(args, "ensemble_path", args.ensemble_path)
        _load_ensemble(eng, args.ensemble_path, args.rdc_spn_selection)
        if args.explain:
            q = eng.parse(args.execute_query)
            for f in eng.ensemble.explain_factors(q, max_variants=args.max_variants):
                print(f)
        print(eng.estimate(args.execute_query))
        return 0
    df = eng.query(args.execute_query)
    if args.explain:
        # formatted physical plan (the exact-plane twin of the model
        # plane's factor trace): shows PushedFilters / join strategy
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        print(df._jdf.queryExecution().explainString(mode))
    for row in df.collect():
        print(row)
    return 0


def _cmd_update_ensemble(eng: Engine, args) -> int:
    """Incremental insert/delete lifecycle: load the pickled ensemble,
    apply the delta to every SINGLE-TABLE model of --update_table
    (join models need the delta expressed in their joined relation —
    retrain those), save back. (D5 absorb_delta + the delete
    extension remove_delta; the reference has no update CLI — its
    add_dataset is API-only and deletes are future work.)"""
    from .spn.incremental import absorb_delta, remove_delta

    _require(args, "ensemble_path", args.ensemble_path)
    _require(args, "update_table", args.update_table)
    if (args.delta_filter is None) == (args.delta_dir is None):
        raise SystemExit(
            "exactly one of --delta_filter / --delta_dir is required"
        )
    ens = _load_ensemble(eng, args.ensemble_path)
    if args.update_table not in eng.catalog:
        raise SystemExit(f"unknown table {args.update_table!r}")
    if args.delta_filter:
        delta = eng.catalog[args.update_table].filter(args.delta_filter)
    else:
        delta = eng.spark.read.parquet(
            f"{args.delta_dir}/{args.update_table}.parquet"
        )
    targets = [
        m for m in ens.models if m.table_set == {args.update_table}
    ]
    skipped = [
        sorted(m.table_set)
        for m in ens.models
        if args.update_table in m.table_set and m.table_set != {args.update_table}
    ]
    if not targets:
        raise SystemExit(
            f"no single-table model for {args.update_table!r} in the ensemble"
        )
    apply_fn = remove_delta if args.delete else absorb_delta
    for m in targets:
        n = apply_fn(m, delta, sample_budget=args.samples_per_spn)
        verb = "removed from" if args.delete else "absorbed into"
        print(
            f"{n} rows {verb} model {sorted(m.table_set)} "
            f"(full_join_size now {m.full_join_size:.0f})"
        )
    for ts in skipped:
        print(f"skipped join model {ts}: delta is table-local; retrain it")
    ens.save(args.ensemble_path)
    print(f"ensemble saved -> {args.ensemble_path}")
    return 0


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    actions = [
        ("generate_ensemble", _cmd_generate_ensemble),
        ("evaluate_cardinalities", _cmd_evaluate_cardinalities),
        ("evaluate_aqp_queries", _cmd_evaluate_aqp),
        ("evaluate_confidence_intervals", _cmd_evaluate_cis),
        ("generate_sampled_parquet", _cmd_generate_sampled),
        ("generate_ground_truth", _cmd_generate_ground_truth),
        ("execute_query", _cmd_execute_query),
        ("update_ensemble", _cmd_update_ensemble),
    ]
    chosen = [(n, fn) for n, fn in actions if getattr(args, n)]
    if len(chosen) != 1:
        raise SystemExit(
            "exactly one action flag is required: "
            + ", ".join(f"--{n}" for n, _ in actions)
        )
    spark = spark or default_session(cpus=args.cpus)
    schema = None
    if args.schema_json:
        from .plans.schema import load_schema_json

        schema = load_schema_json(args.schema_json)
    eng = Engine(spark, args.data_dir, schema=schema)
    return chosen[0][1](eng, args)


if __name__ == "__main__":
    sys.exit(main())
