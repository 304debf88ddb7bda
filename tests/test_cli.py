"""The maqp-style CLI (reference: maqp.py lifecycles 3.1-3.3):
train -> persist -> evaluate cardinalities/AQP/CIs -> execute, all
through `main(argv)` exactly as `python -m deepdb_public_spark`
would run it (a pre-built SparkSession is injected so the test
shares the suite's JVM)."""

from __future__ import annotations

import csv

import pytest

from deepdb_public_spark.cli import load_query_file, main
from tests.conftest import SF_SMOKE

QUERIES = [
    "SELECT COUNT(*) FROM lineitem WHERE lineitem.l_quantity < 25",
    "SELECT COUNT(*) FROM orders WHERE orders.o_totalprice > 100000",
]


@pytest.fixture(scope="module")
def ensemble_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "ens.pkl")
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--generate_ensemble",
            "--ensemble_strategy", "single",
            "--tables", "lineitem,orders",
            "--samples_per_spn", "20000",
            "--ensemble_path", path,
        ],
        spark=spark,
    )
    assert rc == 0
    return path


def _write_queries(tmp_path) -> str:
    qf = tmp_path / "queries.sql"
    qf.write_text("# job-light-style file\n" + ";\n".join(QUERIES) + ";\n")
    return str(qf)


def test_query_file_format(tmp_path):
    assert load_query_file(_write_queries(tmp_path)) == QUERIES


def test_evaluate_cardinalities_csv(spark, ensemble_path, tmp_path, capsys):
    out = str(tmp_path / "card.csv")
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--evaluate_cardinalities",
            "--ensemble_path", ensemble_path,
            "--query_file_location", _write_queries(tmp_path),
            "--target_path", out,
        ],
        spark=spark,
    )
    assert rc == 0
    assert "median_q_error" in capsys.readouterr().out
    with open(out) as f:
        lines = f.readlines()
    # round 10: the reference-style summary is '#' COMMENT lines, so
    # the data section parses as pure floats for any consumer
    comments = [ln for ln in lines if ln.startswith("#")]
    assert len(comments) == 2  # summary + percentiles
    assert any("median_q_error=" in ln for ln in comments)
    rows = list(csv.DictReader(ln for ln in lines if not ln.startswith("#")))
    assert [r["query"] for r in rows] == QUERIES
    for r in rows:
        assert float(r["q_error"]) < 3.0  # sanity budget at sf0.001


def test_evaluate_aqp_csv(spark, ensemble_path, tmp_path, capsys):
    qf = tmp_path / "aqp.sql"
    qf.write_text(
        "SELECT lineitem.l_returnflag, COUNT(*) FROM lineitem "
        "GROUP BY lineitem.l_returnflag\n"
    )
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--evaluate_aqp_queries",
            "--ensemble_path", ensemble_path,
            "--query_file_location", str(qf),
        ],
        spark=spark,
    )
    assert rc == 0
    assert "mean_relative_error" in capsys.readouterr().out


def test_evaluate_confidence_intervals(spark, ensemble_path, tmp_path, capsys):
    out = str(tmp_path / "ci.csv")
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--evaluate_confidence_intervals",
            "--ensemble_path", ensemble_path,
            "--query_file_location", _write_queries(tmp_path),
            "--confidence", "0.99",
            "--target_path", out,
        ],
        spark=spark,
    )
    assert rc == 0
    assert "coverage=" in capsys.readouterr().out
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(QUERIES)
    for r in rows:
        assert float(r["ci_lo"]) <= float(r["ci_hi"])


def test_execute_query_exact(spark, capsys):
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--execute_query",
            "SELECT COUNT(*) FROM orders WHERE orders.o_totalprice > 100000",
        ],
        spark=spark,
    )
    assert rc == 0
    assert "Row(" in capsys.readouterr().out


def test_execute_query_model_plane(spark, ensemble_path, capsys):
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--execute_query", QUERIES[0],
            "--plane", "model",
            "--ensemble_path", ensemble_path,
        ],
        spark=spark,
    )
    assert rc == 0
    assert float(capsys.readouterr().out.strip()) > 0


def test_exactly_one_action_required(spark):
    with pytest.raises(SystemExit):
        main(["--data_dir", SF_SMOKE], spark=spark)
    with pytest.raises(SystemExit):
        main(
            ["--data_dir", SF_SMOKE, "--generate_ensemble", "--execute_query", "x"],
            spark=spark,
        )


def test_generate_sampled_parquet(spark, tmp_path, capsys):
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--generate_sampled_parquet",
            "--staged_dir", str(tmp_path / "staged"),
            "--sample_fraction", "0.5",
        ],
        spark=spark,
    )
    assert rc == 0
    assert "sample_rate=" in capsys.readouterr().out


def test_pairwise_rdc_train_and_rdc_selection(spark, tmp_path, capsys):
    """--pairwise_rdc_path persists the RDC artifact with the ensemble;
    --rdc_spn_selection requires it and evaluation still runs green."""
    ens_path = str(tmp_path / "ens_rdc.pkl")
    rdc_path = str(tmp_path / "pairwise.pkl")
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--generate_ensemble",
            "--ensemble_strategy", "single",
            "--tables", "lineitem,orders",
            "--samples_per_spn", "20000",
            "--ensemble_path", ens_path,
            "--pairwise_rdc_path", rdc_path,
        ],
        spark=spark,
    )
    assert rc == 0
    assert "pairwise RDC" in capsys.readouterr().out

    qf = _write_queries(tmp_path)
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--evaluate_cardinalities",
            "--ensemble_path", ens_path,
            "--query_file_location", qf,
            "--rdc_spn_selection",
        ],
        spark=spark,
    )
    assert rc == 0
    assert "median_q_error" in capsys.readouterr().out


def test_rdc_selection_without_artifact_errors(spark, ensemble_path, tmp_path):
    with pytest.raises(SystemExit, match="pairwise_rdc_path"):
        main(
            [
                "--data_dir", SF_SMOKE,
                "--evaluate_cardinalities",
                "--ensemble_path", ensemble_path,
                "--query_file_location", _write_queries(tmp_path),
                "--rdc_spn_selection",
            ],
            spark=spark,
        )


def test_evaluate_grouped_confidence_intervals(spark, ensemble_path, tmp_path, capsys):
    qf = tmp_path / "gq.sql"
    qf.write_text(
        "SELECT lineitem.l_returnflag, COUNT(*) AS c, AVG(lineitem.l_quantity) AS a "
        "FROM lineitem GROUP BY lineitem.l_returnflag;\n"
    )
    out = str(tmp_path / "gci.csv")
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--evaluate_confidence_intervals",
            "--ensemble_path", ensemble_path,
            "--query_file_location", str(qf),
            "--confidence", "0.99",
            "--target_path", out,
        ],
        spark=spark,
    )
    assert rc == 0
    assert "coverage=" in capsys.readouterr().out
    with open(out) as f:
        rows = list(csv.DictReader(f))
    # 3 return flags x 2 aggregates
    assert len(rows) == 6
    assert {r["aggregate"] for r in rows} == {"c", "a"}
    hit_rate = sum(int(r["hit"]) for r in rows) / len(rows)
    assert hit_rate >= 0.5  # full-data model: CIs should mostly cover


def test_execute_query_model_explain(spark, ensemble_path, capsys):
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--execute_query",
            "SELECT COUNT(*) AS c FROM lineitem WHERE lineitem.l_quantity < 25",
            "--plane", "model",
            "--ensemble_path", ensemble_path,
            "--explain",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "single_model" in out and "'value'" in out


def test_update_ensemble_insert_then_delete(spark, tmp_path, capsys):
    """--update_ensemble lifecycle: absorb a delta into the pickled
    single-table model, then delete the same delta; estimates must
    track grown/original table counts (D5 + delete extension)."""
    import shutil

    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.ensemble import SPNEnsemble

    path = str(tmp_path / "upd.pkl")
    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--generate_ensemble",
            "--ensemble_strategy", "single",
            "--tables", "lineitem",
            "--samples_per_spn", "20000",
            "--ensemble_path", path,
        ],
        spark=spark,
    )
    assert rc == 0
    eng = Engine(spark, SF_SMOKE)
    base_n = eng.catalog["lineitem"].count()
    delta_n = eng.catalog["lineitem"].filter("l_orderkey % 10 < 3").count()

    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--update_ensemble",
            "--update_table", "lineitem",
            "--delta_filter", "l_orderkey % 10 < 3",
            "--ensemble_path", path,
            "--samples_per_spn", "20000",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert f"{delta_n} rows absorbed" in out
    ens = SPNEnsemble.load(path, eng.schema)
    assert ens.models[0].full_join_size == pytest.approx(base_n + delta_n)

    rc = main(
        [
            "--data_dir", SF_SMOKE,
            "--update_ensemble",
            "--update_table", "lineitem",
            "--delta_filter", "l_orderkey % 10 < 3",
            "--ensemble_path", path,
            "--samples_per_spn", "20000",
            "--delete",
        ],
        spark=spark,
    )
    assert rc == 0
    assert "rows removed" in capsys.readouterr().out
    ens = SPNEnsemble.load(path, eng.schema)
    assert ens.models[0].full_join_size == pytest.approx(base_n)


def test_update_ensemble_requires_one_delta_source(spark, tmp_path):
    with pytest.raises(SystemExit, match="delta_filter"):
        main(
            [
                "--data_dir", SF_SMOKE,
                "--update_ensemble",
                "--update_table", "lineitem",
                "--ensemble_path", str(tmp_path / "nope.pkl"),
            ],
            spark=spark,
        )


def test_ground_truth_lifecycle(spark, ensemble_path, tmp_path, capsys):
    """--generate_ground_truth pickles exact answers once; the
    evaluations then run with --ground_truth_path and produce the
    SAME summary as the inline-truth path (reference's separate
    ground-truth lifecycle)."""
    qf = _write_queries(tmp_path)
    gt = str(tmp_path / "truth.pkl")
    rc = main(
        ["--data_dir", SF_SMOKE, "--generate_ground_truth",
         "--query_file_location", qf, "--target_path", gt],
        spark=spark,
    )
    assert rc == 0
    assert "2 ground truths" in capsys.readouterr().out

    args = [
        "--data_dir", SF_SMOKE, "--evaluate_cardinalities",
        "--ensemble_path", ensemble_path,
        "--query_file_location", qf,
        "--target_path", str(tmp_path / "card.csv"),
    ]
    assert main(args, spark=spark) == 0
    inline = capsys.readouterr().out
    assert main(args + ["--ground_truth_path", gt], spark=spark) == 0
    cached = capsys.readouterr().out
    # identical q-error stats; latency line differs
    assert inline.split("mean_latency")[0] == cached.split("mean_latency")[0]
