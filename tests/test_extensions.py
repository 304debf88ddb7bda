"""Quality gates for the approximate extension operators: the exact
variants are oracle-checked in test_oracle_parity; here we check the
scale-path variants (LSH/IVF/SimHash/streaming) against them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.operators.dedup import (
    embedding_neardup_pairs,
    jaccard_pairs_exact,
    minhash_lsh_pairs,
    simhash_pairs,
)
from deepdb_public_spark.operators.similarity import (
    IvfIndex,
    brute_force_topk,
    lsh_topk,
)
from deepdb_public_spark.sources.catalog import load_tables
from deepdb_public_spark.streaming.windows import (
    run_streaming_batch,
    stream_events,
    tumbling_counts,
)
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def tabs(spark):
    return load_tables(spark, SF_CORRECT, ["documents", "embeddings", "events"])


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_recall_vs_exact(spark, tabs):
    docs = tabs["documents"]
    exact = _pair_set(
        jaccard_pairs_exact(docs, "text", "doc_id", 0.5, use_char_ngrams=True)
    )
    lsh = _pair_set(
        minhash_lsh_pairs(
            docs, "text", "doc_id", 0.5, n_hashes=64, n_bands=8, use_char_ngrams=True
        )
    )
    assert exact, "fixture should contain near-duplicate pairs"
    # verified candidates => no false positives; banding => high recall
    assert lsh <= exact
    assert len(lsh) / len(exact) >= 0.9, f"LSH recall {len(lsh)}/{len(exact)}"


def test_simhash_finds_neardups(spark, tabs):
    docs = tabs["documents"]
    pairs = simhash_pairs(docs, "text", "doc_id", max_hamming=10).collect()
    # near-dup fixture pairs share nearly all tokens => small hamming
    assert len(pairs) >= 5
    for r in pairs:
        assert 0 <= r["hamming"] <= 10


def test_embedding_lsh_vs_bruteforce_neardup(spark, tabs):
    emb = tabs["embeddings"]
    bf = _pair_set(
        embedding_neardup_pairs(emb, "embedding", "vec_id", 0.9, brute_force=True)
    )
    lsh = _pair_set(
        embedding_neardup_pairs(
            emb, "embedding", "vec_id", 0.9, n_planes=6, brute_force=False
        )
    )
    assert lsh <= bf
    if bf:
        assert len(lsh) / len(bf) >= 0.5, f"hyperplane recall {len(lsh)}/{len(bf)}"


def test_ivf_and_lsh_topk_recall(spark, tabs):
    emb = tabs["embeddings"]
    q = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    truth = [r["id"] for r in brute_force_topk(emb, "embedding", "vec_id", q, 10).collect()]
    ivf = IvfIndex.build(emb, "embedding", "vec_id", n_cells=8)
    ivf_ids = [r["id"] for r in ivf.topk(q, 10, nprobe=4).collect()]
    lsh_ids = [
        r["id"]
        for r in lsh_topk(
            emb, "embedding", "vec_id", q, 10, n_planes=6, multiprobe_hamming=2
        ).collect()
    ]
    assert truth[0] == 7  # self is nearest
    assert len(set(truth) & set(ivf_ids)) >= 7, f"IVF recall@10 {ivf_ids} vs {truth}"
    assert len(set(truth) & set(lsh_ids)) >= 5, f"LSH recall@10 {lsh_ids} vs {truth}"


def test_streaming_tumbling_matches_batch(spark, tabs):
    batch = tumbling_counts(tabs["events"], "1 day").toPandas()
    stream = stream_events(spark, f"{SF_CORRECT}/events.parquet", watermark="2 days")
    out = run_streaming_batch(
        stream, lambda df: tumbling_counts(df, "1 day"), "t_tumble_sink"
    ).toPandas()
    key = ["win_start", "event_type"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = out.sort_values(key).reset_index(drop=True)
    assert b[key + ["cnt"]].equals(s[key + ["cnt"]])


def test_dedup_paragraphs_first_occurrence(spark):
    """C4-style paragraph dedup: repeated paragraphs survive only at
    their first (doc_id, pos) occurrence; docs reassemble in order;
    fully-duplicated docs drop (or stay empty with keep_empty_docs)."""
    from deepdb_public_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared boilerplate\n\ngamma"),
            (2, "shared boilerplate\n\ndelta"),
            (3, "shared boilerplate"),
            (4, "alpha beta\n\nshared boilerplate"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in dedup_paragraphs(docs, "text", "doc_id").collect()}
    assert out[1] == "alpha beta\n\nshared boilerplate\n\ngamma"
    assert out[2] == "delta"
    assert 3 not in out and 4 not in out  # nothing survived
    kept = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(docs, "text", "doc_id", keep_empty_docs=True).collect()
    }
    assert kept[3] == "" and kept[4] == ""
    assert len(kept) == 4
