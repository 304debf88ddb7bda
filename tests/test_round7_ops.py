"""Round 7 pipeline operators: batched cosine top-k, hybrid BM25 +
vector retrieval with reciprocal-rank fusion, and token-n-gram overlap
decontamination — planted micro-corpora with hand-computable truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_batch_cosine_topk_matches_brute_force(spark):
    from deepdb_public_spark.operators.similarity import (
        batch_cosine_topk,
        brute_force_topk,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i == j) + 0.1 * j for j in range(4)]) for i in range(8)],
        "vec_id int, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.1, 0.2, 0.3]), (2, [0.1, 1.1, 0.2, 0.3])],
        "qid int, qvec array<double>",
    )
    batch = batch_cosine_topk(vecs, "embedding", "vec_id", queries, k=3)
    got = {
        (r["qid"], r["rnk"]): r["id"] for r in batch.collect()
    }
    for qid, qv in [(1, [1.0, 0.1, 0.2, 0.3]), (2, [0.1, 1.1, 0.2, 0.3])]:
        single = brute_force_topk(vecs, "embedding", "vec_id", qv, k=3).collect()
        for rnk, row in enumerate(single, start=1):
            assert got[(qid, rnk)] == row["id"], (qid, rnk, row)


def test_hybrid_rrf_fuses_both_channels(spark):
    from deepdb_public_spark.operators.similarity import hybrid_rrf_topk

    # doc 1: lexical-only match; doc 2: vector-only match; doc 3: both
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle partition join"),
            (2, "unrelated text about nothing"),
            (3, "spark shuffle and more spark shuffle"),
        ],
        "doc_id int, text string",
    )
    vecs = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),
            (3, [0.9, 0.1, 0.0]),
        ],
        "vec_id int, embedding array<double>",
    )
    qtext = spark.createDataFrame(
        [(1, "spark shuffle")], "qid int, qtext string"
    )
    qvec = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0])], "qid int, qvec array<double>"
    )
    rows = hybrid_rrf_topk(
        docs, qtext, vecs, qvec, k=3, k_lex=3, k_vec=3
    ).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    # doc 3 appears in BOTH top lists -> two reciprocal terms -> wins
    assert rows[0]["doc_id"] == 3
    assert by_doc[3]["rnk"] == 1
    # RRF score = sum of 1/(60 + rank_channel); doc 3 is lex rank <=2
    # and vec rank 2 (behind the exact-match doc 2)
    assert by_doc[3]["rrf_score"] == pytest.approx(
        1.0 / (60 + by_doc[3]["rrf_score"] * 0 + 1) + 1.0 / 62, abs=0.02
    )
    # single-channel docs carry exactly one term
    assert by_doc[2]["rrf_score"] == pytest.approx(1.0 / 61, abs=1e-6)


def test_ngram_contamination_counts(spark):
    from deepdb_public_spark.operators.textstats import ngram_contamination

    t = "aa bb cc dd ee ff gg hh"  # 8 tokens -> exactly one 8-gram
    rows = spark.createDataFrame(
        [
            ("train", 1, t + " zz yy"),          # contains the gram
            ("test", 2, t + " qq"),              # 9 tokens -> 2 grams, 1 hit
            ("test", 3, "uu vv ww xx"),          # <8 tokens -> no grams
            ("test", 4, "k1 k2 k3 k4 k5 k6 k7 k8"),  # 1 gram, 0 hits
        ],
        "split string, doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(rows, "text", "doc_id", "split").collect()
    }
    assert set(out) == {2, 4}  # doc 3 has no 8-grams
    assert out[2]["n_grams"] == 2 and out[2]["n_hit"] == 1
    assert out[2]["frac"] == pytest.approx(0.5)
    assert out[4]["n_grams"] == 1 and out[4]["n_hit"] == 0
    assert out[4]["frac"] == 0.0


def test_ngram_contamination_distinct_grams(spark):
    """Repeated n-grams inside one doc count ONCE (set semantics)."""
    from deepdb_public_spark.operators.textstats import ngram_contamination

    t = "aa bb cc dd ee ff gg hh"
    rows = spark.createDataFrame(
        [
            ("train", 1, t),
            ("test", 2, t + " " + t),  # the shared gram repeats
        ],
        "split string, doc_id int, text string",
    )
    (r,) = ngram_contamination(rows, "text", "doc_id", "split").collect()
    # 16 tokens -> 9 start positions; windows 1 and 9 are the same
    # gram ('aa..hh'), so 8 DISTINCT grams survive
    assert r["n_grams"] == 8
    assert r["n_hit"] == 1  # only the pure 'aa..hh' window exists in train
    assert r["frac"] == pytest.approx(1.0 / 8, abs=1e-6)


def test_deduplicate_corpus_keep_best_score(spark):
    """score_col keeps the HIGHEST-score member per cluster (ties:
    min id); default keeps min id; untouched rows pass through."""
    from deepdb_public_spark.operators.dedup import deduplicate_corpus

    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 50), (9, 7)],
        "doc_id int, score int",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a int, id_b int"
    )  # cluster {1,2,3}; 4 and 9 untouched
    default_kept = sorted(
        r["doc_id"] for r in deduplicate_corpus(df, "doc_id", pairs).collect()
    )
    assert default_kept == [1, 4, 9]  # min id wins
    best_kept = sorted(
        r["doc_id"]
        for r in deduplicate_corpus(df, "doc_id", pairs, score_col="score").collect()
    )
    assert best_kept == [2, 4, 9]  # highest score, tie broken by min id


def test_dedup_blank_doc_and_zero_norm_guards(spark):
    """Round-7 review fixes: blank/NULL texts never form bogus
    jaccard-1.0 or hamming-0 clusters (char_ngrams('') yields ['']);
    zero-norm embeddings are excluded instead of crashing ANSI
    division; simhash max_hamming past the pigeonhole bound raises;
    duplicate_clusters(max_iter=0) raises; dedup_paragraphs treats
    the separator literally, not as a regex."""
    import pytest as _pt

    from deepdb_public_spark.operators.dedup import (
        dedup_paragraphs,
        duplicate_clusters,
        embedding_neardup_pairs,
        jaccard_pairs_exact,
        simhash_pairs,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real text one"), (5, "real text one")],
        "doc_id int, text string",
    )
    jp = jaccard_pairs_exact(
        docs, "text", "doc_id", threshold=0.8, use_char_ngrams=True, ngram=5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in jp} == {(4, 5)}
    sp = simhash_pairs(docs, "text", "doc_id").collect()
    assert {(r["id_a"], r["id_b"]) for r in sp} == {(4, 5)}
    # radius 4 now supported (5 pigeonhole blocks); only the
    # degenerate region past 31 still raises
    sp4 = simhash_pairs(docs, "text", "doc_id", max_hamming=4).collect()
    assert {(r["id_a"], r["id_b"]) for r in sp4} == {(4, 5)}
    with _pt.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, "text", "doc_id", max_hamming=32)

    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.001])],
        "vec_id int, embedding array<double>",
    )
    ep = embedding_neardup_pairs(
        vecs, "embedding", "vec_id", threshold=0.99, brute_force=True
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in ep} == {(2, 3)}

    with _pt.raises(ValueError, match="max_iter"):
        duplicate_clusters(
            spark.createDataFrame([(1, 2)], "id_a int, id_b int"), max_iter=0
        )

    # '.' as separator must split on LITERAL dots, not every char
    d2 = spark.createDataFrame(
        [(1, "alpha.beta.alpha"), (2, "beta.gamma")], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(d2, "text", "doc_id", sep=".").collect()
    }
    assert out[1] == "alpha.beta"   # second 'alpha' deduped
    assert out[2] == "gamma"        # 'beta' seen in doc 1


def test_similarity_zero_norm_and_null_guards(spark):
    """Round-7 review fixes: NULL / zero-norm vectors are excluded
    from every cosine operator (ANSI division crash, KMeans NPE,
    deterministic junk LSH bucket), and knn_join_lsh's empty-left
    fallback keeps the INPUT id types."""
    from deepdb_public_spark.operators.similarity import (
        IvfIndex,
        batch_cosine_topk,
        brute_force_topk,
        knn_join_lsh,
        lsh_topk,
    )

    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [1.0, 0.0]), (4, [0.9, 0.1])],
        "vec_id int, embedding array<double>",
    )
    ids = {r["id"] for r in brute_force_topk(vecs, "embedding", "vec_id", [1.0, 0.0], k=4).collect()}
    assert ids == {3, 4}
    q = spark.createDataFrame([(1, [1.0, 0.0])], "qid int, qvec array<double>")
    ids2 = {r["id"] for r in batch_cosine_topk(vecs, "embedding", "vec_id", q, k=4).collect()}
    assert ids2 == {3, 4}
    ids3 = {r["id"] for r in lsh_topk(vecs, "embedding", "vec_id", [1.0, 0.0], k=4, n_planes=2).collect()}
    assert ids3 <= {3, 4} and 3 in ids3
    idx = IvfIndex.build(vecs, "embedding", "vec_id", n_cells=2)
    assert {r["id"] for r in idx.assigned.collect()} == {3, 4}
    idx.release()

    empty_left = spark.createDataFrame([], "sid string, embedding array<double>")
    right = spark.createDataFrame([("r1", [1.0, 0.0])], "rid string, embedding array<double>")
    out = knn_join_lsh(empty_left, right, "embedding", "sid", "rid")
    assert out.count() == 0
    assert dict(out.dtypes)["lid"] == "string"  # not hardcoded bigint


def test_split_threshold_hex_full_fraction():
    """fraction >= 1 yields a threshold above every 4-hex bucket so
    the portable SQL keeps ALL rows (was 'ffff', silently dropping
    the 1/65536 of ids hashing there)."""
    from deepdb_public_spark.operators.sampling import split_threshold_hex

    assert split_threshold_hex(1.0) == "g000"
    assert format(0xFFFF, "04x") < "g000"  # string compare admits ffff
    assert split_threshold_hex(0.9) == "e666"


def test_weighted_mixture_empty_sources_raises(spark):
    from deepdb_public_spark.operators.sampling import weighted_mixture

    with pytest.raises(ValueError, match="at least one source"):
        weighted_mixture({}, "doc_id")


def test_joins_null_key_and_ts_guards(spark):
    """Round-7 review fixes: a hot NULL key must not poison the cold
    path (isin with None made ~is_hot NULL for every cold key); a
    NULL-timestamp right row must not carry values into left rows
    with no true preceding right row."""
    from deepdb_public_spark.operators.joins import asof_join, skew_tolerant_join

    left = spark.createDataFrame(
        [(None, 1)] * 50 + [("k1", 2), ("k2", 3)], "k string, lv int"
    )
    right = spark.createDataFrame([("k1", 10), ("k2", 20)], "k string, rv int")
    inner = skew_tolerant_join(
        left, right, "k", how="inner", hot_key_threshold=5, sample_fraction=1.0
    )
    assert inner.count() == 2
    lft = skew_tolerant_join(
        left, right, "k", how="left", hot_key_threshold=5, sample_fraction=1.0
    )
    assert lft.count() == 52

    l2 = spark.createDataFrame([("k", 10)], "k string, ts long")
    r2 = spark.createDataFrame([("k", None, 99)], "k string, ts long, val int")
    (row,) = asof_join(l2, r2, "k", "ts", "ts").collect()
    assert row["ts_right"] is None and row["val_right"] is None


def test_unigram_logprob_keeps_degenerate_docs(spark):
    """Empty/NULL-text docs surface with n_tokens=0 instead of
    vanishing — the rows a perplexity filter most needs to flag."""
    from deepdb_public_spark.operators.filters import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "   "), (3, None)], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_tokens"] == 0 and out[2]["mean_logprob"] is None
    assert out[1]["n_tokens"] == 3


def test_join_sample_rejects_cycle_edge(spark):
    """A relationship set with a cycle-closing/parallel edge raises
    instead of silently materializing a sample violating the edge."""
    from deepdb_public_spark.operators.prep import generate_join_sample
    from deepdb_public_spark.plans.schema import SchemaGraph, Table

    a = spark.createDataFrame([(1, 1, 1)], "a_id int, fk1 int, fk2 int")
    b = spark.createDataFrame([(1,)], "b_id int")
    g = SchemaGraph()
    g.add_table(Table("ta", ["a_id"]))
    g.add_table(Table("tb", ["b_id"]))
    r1 = g.add_relationship("ta", "fk1", "tb", "b_id")
    r2 = g.add_relationship("ta", "fk2", "tb", "b_id")
    with pytest.raises(ValueError, match="cycle"):
        generate_join_sample(
            {"ta": a, "tb": b}, g, {"ta", "tb"},
            {r1.identifier, r2.identifier},
        ).collect()
