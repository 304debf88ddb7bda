"""Degenerate-input sweep: every pipeline operator must return an
EMPTY (or well-defined) result — never crash — on (a) an empty corpus,
(b) an all-NULL text column, (c) empty embeddings. At 100 TB these
shapes appear constantly (empty partitions, freshly-created tables,
columns nulled by upstream filters), and a crash in one operator kills
a whole pipeline run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def null_docs(spark):
    return spark.createDataFrame(
        [(1, None, "en"), (2, None, "de"), (3, "", "en")],
        "doc_id long, text string, lang string",
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_dedup_family_on_empty(empty_docs):
    from deepdb_public_spark.operators.dedup import (
        exact_duplicate_groups,
        jaccard_pairs_exact,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    assert exact_duplicate_groups(empty_docs, "text", "doc_id").count() == 0
    assert jaccard_pairs_exact(empty_docs, "text", "doc_id").count() == 0
    assert minhash_lsh_pairs(empty_docs, "text", "doc_id").count() == 0
    assert simhash_pairs(empty_docs, "text", "doc_id").count() == 0


def test_dedup_family_on_all_null_text(null_docs):
    from deepdb_public_spark.operators.dedup import (
        jaccard_pairs_exact,
        minhash_lsh_pairs,
    )

    # NULL/empty texts have no shingles: zero pairs, not a crash
    assert jaccard_pairs_exact(null_docs, "text", "doc_id").count() == 0
    assert minhash_lsh_pairs(null_docs, "text", "doc_id").count() == 0


def test_text_ops_on_empty_and_null(empty_docs, null_docs):
    from deepdb_public_spark.operators.chunking import chunk_documents
    from deepdb_public_spark.operators.textstats import (
        doc_profile,
        term_frequencies,
        tfidf_top_terms,
    )

    assert term_frequencies(empty_docs, "text").count() == 0
    assert tfidf_top_terms(empty_docs, "text", "doc_id").count() == 0
    assert chunk_documents(empty_docs, "text", "doc_id").count() == 0
    assert chunk_documents(null_docs, "text", "doc_id").count() == 0
    # profile rows exist for null docs (that's the point of a profile)
    rows = doc_profile(null_docs, "text", "doc_id").collect()
    assert len(rows) == 3
    assert tfidf_top_terms(null_docs, "text", "doc_id").count() == 0


def test_embedding_ops_on_empty(empty_emb):
    from deepdb_public_spark.operators.dedup import (
        embedding_neardup_pairs,
        semantic_dedup,
    )

    assert embedding_neardup_pairs(empty_emb, "embedding", "vec_id").count() == 0
    out = semantic_dedup(empty_emb, "embedding", "vec_id")
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "kept", "rep_id"}


def test_clusters_and_index_on_empty(spark, empty_docs):
    from deepdb_public_spark.operators.dedup import (
        build_minhash_index,
        dedup_against_index,
        duplicate_clusters,
    )

    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert duplicate_clusters(empty_pairs).count() == 0
    bands, sets = build_minhash_index(empty_docs, "text", "doc_id")
    assert bands.count() == 0 and sets.count() == 0
    # a real batch probing an EMPTY index: zero matches, not a crash
    batch = spark.createDataFrame(
        [(10, "some fresh crawl content")], "doc_id long, text string"
    )
    assert (
        dedup_against_index(batch, "text", "doc_id", bands, sets).count() == 0
    )


def test_model_plane_empty_table_set_rejected(spark):
    from deepdb_public_spark.engine import Engine
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, "/root/testdata/sf0.001")
    with pytest.raises((ValueError, KeyError)):
        train_spn_model(eng.catalog, eng.schema, set(), 1000)
