"""Round-4 operators: TF-IDF top terms, chunk windows, semantic dedup.

Each new driver entry is hash-checked against DuckDB by
oracle_check.py; these tests cover the operator properties the oracle
cannot see (LSH-vs-brute equivalence, chunk coverage invariants,
score semantics on a hand-built corpus).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


# ---------------------------------------------------------------- tfidf


def test_tfidf_matches_hand_computation(spark):
    from deepdb_public_spark.operators.textstats import tfidf_top_terms

    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry durian"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        (r["id"], r["token"]): r["tfidf"]
        for r in tfidf_top_terms(df, "text", "id", k=10).collect()
    }
    n = 3
    # apple: tf 2 in doc 1, df 1
    assert out[(1, "apple")] == round(2 * math.log(n / 1), 6)
    # banana: df 2
    assert out[(1, "banana")] == round(1 * math.log(n / 2), 6)
    # cherry in doc 3: tf 2, df 2
    assert out[(3, "cherry")] == round(2 * math.log(n / 2), 6)
    # durian: unique to doc 3
    assert out[(3, "durian")] == round(1 * math.log(n / 1), 6)


def test_tfidf_topk_bound_and_order(spark):
    from deepdb_public_spark.operators.textstats import tfidf_top_terms

    out = tfidf_top_terms(_docs(spark), "text", "doc_id", k=3).toPandas()
    per_doc = out.groupby("doc_id")
    assert (per_doc.size() <= 3).all()
    for _, g in per_doc:
        g = g.sort_values("rnk")
        # rnk is 1..k and scores are non-increasing in rnk
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert (g["tfidf"].diff().dropna() <= 1e-9).all()


# ------------------------------------------------------------- chunking


def test_chunks_cover_and_reconstruct(spark):
    from deepdb_public_spark.operators.chunking import chunk_documents

    docs = _docs(spark).limit(50)
    size, stride = 100, 70
    chunks = chunk_documents(docs, "text", "doc_id", size=size, stride=stride)
    joined = chunks.join(docs, "doc_id").select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        "chunk_len",
        "chunk_md5",
        F.length("text").alias("n"),
        F.md5(F.substring(F.col("text"), F.col("chunk_start"), size)).alias(
            "md5_again"
        ),
    )
    pdf = joined.toPandas()
    assert len(pdf) > 0
    # md5 recomputes identically (chunk content == substring slice)
    assert (pdf["chunk_md5"] == pdf["md5_again"]).all()
    # starts advance by exactly stride, 1-based, first chunk at 1
    for _, g in pdf.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        starts = list(g["chunk_start"])
        assert starts[0] == 1
        assert all(b - a == stride for a, b in zip(starts, starts[1:]))
        n = g["n"].iloc[0]
        # last start still inside the doc; one more stride would not be
        assert starts[-1] <= n < starts[-1] + stride
        # every char position is covered (overlap >= 0 since stride<size)
        assert all(ln == min(size, n - st + 1) for st, ln in zip(g["chunk_start"], g["chunk_len"]))


def test_chunks_skip_empty_docs(spark):
    from deepdb_public_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, None)], "id long, text string"
    )
    out = chunk_documents(df, "text", "id", size=2, stride=1).collect()
    assert {r["id"] for r in out} == {1}


# ------------------------------------------------------- semantic dedup


def test_semdedup_lsh_matches_brute(spark):
    from deepdb_public_spark.operators.dedup import semantic_dedup

    emb = _emb(spark)
    brute = semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.8, brute_force=True
    )
    lsh = semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.8, n_planes=4
    )
    b = {tuple(r) for r in brute.collect()}
    l = {tuple(r) for r in lsh.collect()}
    # multi-plane LSH at 4 bits on this corpus reaches recall 1 at
    # cosine >= 0.8 (same property x08 relies on); decisions must agree
    assert b == l


def test_semdedup_keep_rule(spark):
    from deepdb_public_spark.operators.dedup import semantic_dedup

    emb = _emb(spark)
    out = semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.8, brute_force=True
    ).toPandas()
    assert len(out) == emb.count()  # one decision per input row
    kept = out[out["kept"]]
    pruned = out[~out["kept"]]
    # survivors are their own representative
    assert (kept["rep_id"] == kept["vec_id"]).all()
    # pruned rows point at an EARLIER kept-or-pruned item
    assert (pruned["rep_id"] < pruned["vec_id"]).all()
    # representatives are real ids
    assert set(pruned["rep_id"]).issubset(set(out["vec_id"]))
    # resolve_reps (default): every representative is a KEPT survivor
    assert set(pruned["rep_id"]).issubset(set(kept["vec_id"]))


def test_semdedup_rep_chain_resolves_to_kept_root(spark):
    """Chain a~b, b~c, !a~c: c's raw pointer is b (pruned); the
    resolved representative must be the kept root a."""
    from deepdb_public_spark.operators.dedup import semantic_dedup

    # 2-d unit vectors at angles 0deg, 30deg, 60deg with threshold
    # cos(37deg)=0.8: a~b (cos30=.866), b~c (cos30), a!~c (cos60=.5)
    rows = [
        (0, [1.0, 0.0]),
        (1, [math.cos(math.pi / 6), math.sin(math.pi / 6)]),
        (2, [math.cos(math.pi / 3), math.sin(math.pi / 3)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    resolved = {
        r["vec_id"]: (r["kept"], r["rep_id"])
        for r in semantic_dedup(
            df, "embedding", "vec_id", threshold=0.8, brute_force=True
        ).collect()
    }
    assert resolved == {0: (True, 0), 1: (False, 0), 2: (False, 0)}
    raw = {
        r["vec_id"]: (r["kept"], r["rep_id"])
        for r in semantic_dedup(
            df, "embedding", "vec_id", threshold=0.8, brute_force=True,
            resolve_reps=False,
        ).collect()
    }
    assert raw == {0: (True, 0), 1: (False, 0), 2: (False, 1)}


# ------------------------------------------------------ model plane r4


def test_update_in_place_tracks_distribution_shift(spark):
    import copy

    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.incremental import absorb_delta, remove_delta
    from deepdb_public_spark.spn.nodes import validate
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(eng.catalog, eng.schema, {"lineitem"}, 20_000)
    base = eng.catalog["lineitem"]
    old = base.filter((F.col("l_orderkey") % 10) < 2)
    new = old.withColumn("l_quantity", F.col("l_quantity") + 25)
    updated = copy.deepcopy(model)
    remove_delta(updated, old, sample_budget=20_000)
    absorb_delta(updated, new, sample_budget=20_000)
    validate(updated.root)
    truth_df = base.filter((F.col("l_orderkey") % 10) >= 2).unionByName(new)
    for pred, sql_pred in [
        ("l_quantity < 25", "lineitem.l_quantity < 25"),
        ("l_quantity >= 50", "lineitem.l_quantity >= 50"),
    ]:
        q = eng.parse(f"SELECT COUNT(*) AS cnt FROM lineitem WHERE {sql_pred}")
        est = float(updated.cardinality(q))
        true = truth_df.filter(pred).count()
        qerr = max(est / max(true, 1), true / max(est, 1e-9))
        assert qerr < 3.0, (pred, est, true)
    # the un-updated model must NOT see the shifted region (>= 51 was
    # outside the original quantity domain entirely)
    q = eng.parse("SELECT COUNT(*) AS cnt FROM lineitem WHERE lineitem.l_quantity >= 51")
    assert float(model.cardinality(q)) == 0.0
    assert float(updated.cardinality(q)) > 0.0


def test_events_model_budget(spark):
    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, SF_SMOKE)
    model = train_spn_model(
        eng.catalog, eng.schema, {"events"}, 20_000, exclude_columns={"props"}
    )
    assert set(model.column_names) >= {"ts", "event_type", "value"}
    assert "props" not in model.column_names
    for sql in [
        "SELECT COUNT(*) AS cnt FROM events WHERE events.value <= 50",
        "SELECT COUNT(*) AS cnt FROM events WHERE events.event_type = 'click'",
        "SELECT COUNT(*) AS cnt FROM events WHERE events.ts >= DATE '2024-01-15'",
    ]:
        q = eng.parse(sql)
        est = float(model.cardinality(q))
        true = int(eng.query(q).collect()[0][0])
        qerr = max(est / max(true, 1), true / max(est, 1e-9))
        assert qerr < 2.0, (sql, est, true)


# ----------------------------------------------------- IVF persistence


def test_ivf_saved_probe_prunes(spark, tmp_path):
    """A probe against the SAVED index reads only the probed cells'
    parquet partitions (partition pruning on the cell directory
    layout) and returns the same top-k as the in-memory index."""
    from deepdb_public_spark.operators.similarity import IvfIndex

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    idx = IvfIndex.build(emb, "embedding", "vec_id", n_cells=8)
    path = str(tmp_path / "ivf")
    idx.save(path)
    loaded = IvfIndex.load(spark, path)

    qv = [float(x) for x in emb.first()["embedding"]]
    mem = [(r["id"], round(r["cos"], 6)) for r in idx.topk(qv, k=5, nprobe=3).collect()]
    disk_df = loaded.topk(qv, k=5, nprobe=3)
    disk = [(r["id"], round(r["cos"], 6)) for r in disk_df.collect()]
    idx.release()
    assert mem == disk
    # pruning evidence: the probe's parquet scan node carries the cell
    # membership as a PARTITION filter (cell is a directory column, so
    # Spark prunes whole directories; inputFiles() can't show this —
    # it reports pre-pruning metadata)
    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_lines and any("cell" in l and "IN (" in l for l in scan_lines), plan


# ------------------------------------------------------ z-order layout


def test_zorder_stats_selective_on_both_columns(spark, tmp_path):
    """write_zordered_parquet: per-file min/max spans on BOTH z-order
    columns must be materially narrower than the global range (that
    narrowness IS multi-column data skipping — parquet prunes files
    whose stats exclude the filter), and a single-column sorted layout
    must NOT have that property on its scattered column."""
    import glob

    import pyarrow.parquet as pq

    from deepdb_public_spark.sources.writers import (
        write_sorted_parquet,
        write_zordered_parquet,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )

    def mean_span_fraction(path, col):
        lo_g, hi_g = None, None
        spans = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            lo, hi = min(los), max(his)
            spans.append(hi - lo)
            lo_g = lo if lo_g is None else min(lo_g, lo)
            hi_g = hi if hi_g is None else max(hi_g, hi)
        return (sum(spans) / len(spans)) / max(hi_g - lo_g, 1)

    z_out = str(tmp_path / "z")
    s_out = str(tmp_path / "s")
    write_zordered_parquet(df, z_out, ["l_orderkey", "l_partkey"], n_files=16)
    write_sorted_parquet(df, s_out, ["l_orderkey"], n_files=16)

    # z-order: BOTH columns' per-file spans shrink well below the
    # global range (16 files -> ideal ~1/4 per axis on a 2-D curve)
    assert mean_span_fraction(z_out, "l_orderkey") < 0.5
    assert mean_span_fraction(z_out, "l_partkey") < 0.5
    # single-key sort: the second column's spans stay ~global
    assert mean_span_fraction(s_out, "l_orderkey") < 0.2
    assert mean_span_fraction(s_out, "l_partkey") > 0.8

    # row fidelity: layout changes nothing about the data
    back = spark.read.parquet(z_out)
    assert back.count() == df.count()
    a = back.agg(F.sum("l_extendedprice")).first()[0]
    b = df.agg(F.sum("l_extendedprice")).first()[0]
    assert abs(a - b) < 1e-6 * max(abs(b), 1)


def test_zorder_rejects_too_many_columns(spark):
    from deepdb_public_spark.sources.writers import write_zordered_parquet

    df = spark.range(10)
    with pytest.raises(ValueError):
        write_zordered_parquet(df, "/tmp/unused", ["id"] * 5, bits=16)


# ---------------------------------------------------------------- bm25


def test_bm25_ranking_properties(spark):
    from deepdb_public_spark.operators.textstats import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark join hash join"),          # 2 query terms, tf(join)=2
            (2, "spark join"),                    # 2 query terms
            (3, "spark only here"),               # 1 query term
            (4, "nothing relevant at all"),       # 0 query terms
            (5, "join join join join join join"), # high tf, longer doc
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "spark join")], "qid int, qtext string")
    out = bm25_topk(docs, q, "text", "doc_id", k=10).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rnk"])]
    # docs with no query term never appear
    assert 4 not in ranked
    # both-terms docs beat the single-term doc
    assert ranked.index(1) < ranked.index(3)
    assert ranked.index(2) < ranked.index(3)
    # scores strictly ordered with rnk
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rnk"])]
    assert scores == sorted(scores, reverse=True)


def test_bm25_query_batch_independent(spark):
    """Each query's result is independent of what else is in the
    batch (the corpus statistics are query-independent)."""
    from deepdb_public_spark.operators.textstats import bm25_topk

    docs = _docs(spark)
    one = spark.createDataFrame([(7, "hash join")], "qid int, qtext string")
    two = spark.createDataFrame(
        [(7, "hash join"), (8, "window stream")], "qid int, qtext string"
    )
    a = {(r["qid"], r["doc_id"], r["rnk"]) for r in bm25_topk(docs, one, "text", "doc_id").collect()}
    b = {
        (r["qid"], r["doc_id"], r["rnk"])
        for r in bm25_topk(docs, two, "text", "doc_id").collect()
        if r["qid"] == 7
    }
    assert a == b


def test_ivf_append_to_saved(spark, tmp_path):
    """IVF ingestion loop: new vectors route to their nearest existing
    centroid (numpy-verified), land in the saved cell layout, and are
    immediately findable by a probe — no rebuild."""
    import numpy as np

    from deepdb_public_spark.operators.similarity import IvfIndex

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    idx = IvfIndex.build(old, "embedding", "vec_id", n_cells=8)
    path = str(tmp_path / "ivf")
    idx.save(path)

    # assignments match brute-force nearest centroid
    assigned = idx.assign(new, "embedding", "vec_id").collect()
    for r in assigned:
        d = ((idx.centroids - np.array(r["v"], dtype=float)) ** 2).sum(axis=1)
        assert int(np.argmin(d)) == r["cell"], r["id"]

    idx.append_to_saved(path, new, "embedding", "vec_id")
    idx.release()
    loaded = IvfIndex.load(spark, path)
    assert loaded.assigned.count() == emb.count()
    # an appended vector is its own nearest neighbor under a probe
    probe = new.first()
    got = loaded.topk([float(x) for x in probe["embedding"]], k=1, nprobe=2)
    assert got.first()["id"] == probe["vec_id"]


# ----------------------------------------------- similarity selectivity


def test_similarity_selectivity_methods(spark):
    """Similarity-predicate cardinality (the learned-similarity-
    cardinality problem, served with honest estimators): exact matches
    numpy brute force; sampling is HT-unbiased with a CI that covers;
    the sketch scan lands within its documented budget and is
    monotone in the threshold."""
    import numpy as np

    from deepdb_public_spark.operators.similarity import (
        build_sim_sketches,
        similarity_selectivity,
    )

    emb = _emb(spark)
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    V = np.array([r["embedding"] for r in rows], dtype=float)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sk, planes = build_sim_sketches(emb, "embedding", "vec_id", n_bits=256)
    sk = sk.persist()
    sk.count()

    t = 0.3
    qerrs = []
    covered = 0
    queries = [0, 7, 31]
    for qi in queries:
        q = [float(x) for x in rows[qi]["embedding"]]
        true = int((Vn @ (np.array(q) / np.linalg.norm(q)) >= t).sum())

        exact = similarity_selectivity(emb, "embedding", "vec_id", q, t)
        assert exact["estimate"] == true

        samp = similarity_selectivity(
            emb, "embedding", "vec_id", q, t,
            method="sample", sample_fraction=0.5, confidence=0.99,
        )
        covered += int(samp["lo"] <= true <= samp["hi"])

        sketch = similarity_selectivity(
            emb, "embedding", "vec_id", q, t,
            method="sketch", sketches=sk, planes=planes,
        )
        est = max(sketch["estimate"], 1e-9)
        qerrs.append(max(est / max(true, 1), true / est))
    sk.unpersist()
    # 0.99 CIs on 3 seeded queries: all should cover
    assert covered == len(queries)
    # documented sketch budget at 256 bits on the spread fixture
    assert float(np.median(qerrs)) <= 8.0, qerrs

    # monotone: higher threshold never admits more mass
    q = [float(x) for x in rows[0]["embedding"]]
    sk2, planes2 = build_sim_sketches(emb, "embedding", "vec_id", n_bits=128)
    lo_t = similarity_selectivity(
        emb, "embedding", "vec_id", q, 0.2, method="sketch",
        sketches=sk2, planes=planes2,
    )["estimate"]
    hi_t = similarity_selectivity(
        emb, "embedding", "vec_id", q, 0.6, method="sketch",
        sketches=sk2, planes=planes2,
    )["estimate"]
    assert hi_t <= lo_t


def test_sketch_selectivity_guards(spark):
    """Sketch-path guard rails: NULL vectors are dropped at build (not
    crashed on), an empty-corpus index estimates 0, and mixing
    sketches/planes from different n_bits fails loudly."""
    import pytest as _pytest

    from deepdb_public_spark.operators.similarity import (
        build_sim_sketches,
        similarity_selectivity,
    )

    with_null = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    sk, planes = build_sim_sketches(with_null, "embedding", "vec_id", n_bits=64)
    assert sk.count() == 2  # NULL row dropped, no crash

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    sk0, planes0 = build_sim_sketches(empty, "embedding", "vec_id", n_bits=64)
    out = similarity_selectivity(
        empty, "embedding", "vec_id", [1.0, 0.0], 0.5,
        method="sketch", sketches=sk0, planes=planes0,
    )
    assert out["estimate"] == 0.0

    sk128, planes128 = build_sim_sketches(
        with_null, "embedding", "vec_id", n_bits=128
    )
    with _pytest.raises(ValueError, match="bits"):
        similarity_selectivity(
            with_null, "embedding", "vec_id", [1.0, 0.0], 0.5,
            method="sketch", sketches=sk, planes=planes128,
        )
    with _pytest.raises(ValueError, match="multiple of 64"):
        build_sim_sketches(with_null, "embedding", "vec_id", n_bits=100)
