"""Unit tests for corpus-filtering operators (filters.py) and the new
sampling ops (stratified_sample, pack_sequences)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdb_public_spark.operators.filters import (
    gopher_filter,
    gopher_quality_flags,
    redact_pii,
    repetition_stats,
)
from deepdb_public_spark.operators.sampling import pack_sequences, stratified_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back home to "
    "rest with a friend that will have some food and water before they both "
    "take a long nap in the warm afternoon sun near the old oak tree today "
    "while birds sing softly and a gentle breeze moves through the tall grass"
)


class TestGopher:
    def test_good_doc_passes(self, spark):
        df = _docs(spark, [(1, GOOD)])
        row = gopher_quality_flags(df, "text", "doc_id").collect()[0]
        assert row.keep, row.asDict()

    def test_short_doc_fails_word_count(self, spark):
        df = _docs(spark, [(1, "too short to keep")])
        row = gopher_quality_flags(df, "text", "doc_id").collect()[0]
        assert not row.word_count_ok and not row.keep

    def test_symbol_heavy_fails(self, spark):
        noisy = GOOD + " " + "# " * 20
        df = _docs(spark, [(1, noisy)])
        row = gopher_quality_flags(df, "text", "doc_id").collect()[0]
        assert not row.symbol_ratio_ok

    def test_no_stopwords_fails(self, spark):
        text = " ".join(["lorem ipsum dolor sit amet"] * 15)
        df = _docs(spark, [(1, text)])
        row = gopher_quality_flags(df, "text", "doc_id").collect()[0]
        assert not row.stopwords_ok

    def test_non_alpha_fails(self, spark):
        text = " ".join(str(i) for i in range(60)) + " the and of"
        df = _docs(spark, [(1, text)])
        row = gopher_quality_flags(df, "text", "doc_id").collect()[0]
        assert not row.alpha_fraction_ok

    def test_filter_keeps_only_passing(self, spark):
        df = _docs(spark, [(1, GOOD), (2, "nope")])
        kept = gopher_filter(df, "text", "doc_id").select("doc_id").collect()
        assert [r.doc_id for r in kept] == [1]


class TestRepetition:
    def test_all_unique(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        r = repetition_stats(df, "text", "doc_id").collect()[0]
        assert r.n_words == 4 and r.n_distinct_words == 4
        assert r.dup_word_frac == 0.0
        assert r.n_bigrams == 3 and r.n_distinct_bigrams == 3

    def test_degenerate_repetition(self, spark):
        df = _docs(spark, [(1, "spam spam spam spam")])
        r = repetition_stats(df, "text", "doc_id").collect()[0]
        assert r.n_distinct_words == 1
        assert r.dup_word_frac == 0.75
        assert r.top_word_frac == 1.0
        assert r.dup_bigram_frac == round(2 / 3, 6)

    def test_case_folding(self, spark):
        df = _docs(spark, [(1, "The the THE")])
        r = repetition_stats(df, "text", "doc_id").collect()[0]
        assert r.n_distinct_words == 1 and r.top_word_cnt == 3

    def test_single_word_doc(self, spark):
        df = _docs(spark, [(1, "alone")])
        r = repetition_stats(df, "text", "doc_id").collect()[0]
        assert r.n_bigrams == 0 and r.dup_bigram_frac == 0.0

    def test_empty_doc_not_dropped(self, spark):
        """Empty / whitespace-only docs must still get an audit row
        (zeros), not silently vanish from the output."""
        df = _docs(spark, [(1, ""), (2, "   "), (3, "ok words here")])
        rows = {r.doc_id: r for r in repetition_stats(df, "text", "doc_id").collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1].n_words == 0 and rows[1].dup_word_frac == 0.0
        assert rows[2].n_words == 0


class TestRedactPII:
    def test_email_and_phone(self, spark):
        df = _docs(spark, [(1, "mail a.b-c_d@ex-ample.co.uk or call +1-555-0199 now")])
        r = redact_pii(df, "text", "doc_id").collect()[0]
        assert r.n_emails == 1 and r.n_phones == 1
        assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted
        assert "@" not in r.redacted and "555" not in r.redacted

    def test_clean_text_untouched(self, spark):
        df = _docs(spark, [(1, GOOD)])
        r = redact_pii(df, "text", "doc_id").collect()[0]
        assert r.n_emails == 0 and r.n_phones == 0 and r.redacted == GOOD

    def test_multiple_matches(self, spark):
        df = _docs(spark, [(1, "x@y.com then z@w.org and +44-123-4567")])
        r = redact_pii(df, "text", "doc_id").collect()[0]
        assert r.n_emails == 2 and r.n_phones == 1


class TestFiltersStreamingLegal:
    def test_gopher_flags_under_structured_streaming(self, spark, tmp_path):
        """The quality flags are stateless projections, so the SAME
        operator definition runs under Structured Streaming unchanged;
        streamed output must equal the batch output."""
        from deepdb_public_spark.streaming.windows import run_streaming_batch

        rows = [(i, GOOD if i % 2 else "too short") for i in range(10)]
        batch = _docs(spark, rows)
        src = str(tmp_path / "docs")
        batch.repartition(2).write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        got = run_streaming_batch(
            stream,
            lambda d: gopher_quality_flags(d, "text", "doc_id"),
            "gopher_stream",
            output_mode="append",
        )
        want = sorted(
            (r.doc_id, r.keep)
            for r in gopher_quality_flags(batch, "text", "doc_id").collect()
        )
        assert sorted((r.doc_id, r.keep) for r in got.collect()) == want


class TestUnigramLogprob:
    def test_matches_hand_math(self, spark):
        import math

        from deepdb_public_spark.operators.filters import unigram_logprob

        df = _docs(spark, [(1, "a a b"), (2, "c")])
        rows = {r.doc_id: r for r in unigram_logprob(df, "text", "doc_id").collect()}
        # model: a->2, b->1, c->1; total=4, vocab=3; denom = 4 + 1*(3+1) = 8
        pa, pb, pc = 3 / 8, 2 / 8, 2 / 8
        want1 = (2 * math.log(pa) + math.log(pb)) / 3
        assert rows[1].n_tokens == 3
        assert abs(rows[1].mean_logprob - round(want1, 6)) < 1e-9
        assert abs(rows[2].mean_logprob - round(math.log(pc), 6)) < 1e-9

    def test_external_model_unseen_tokens(self, spark):
        from deepdb_public_spark.operators.filters import unigram_logprob

        docs = _docs(spark, [(1, "common common"), (2, "weird unseen junk")])
        model = spark.createDataFrame([("common", 98)], ["token", "cnt"])
        rows = {
            r.doc_id: r.mean_logprob
            for r in unigram_logprob(docs, "text", "doc_id", model_df=model).collect()
        }
        # rare-vocab doc scores strictly lower under the reference model
        assert rows[2] < rows[1]


class TestSamplingOps:
    def test_stratified_sample_deterministic(self, spark):
        rows = [(i, "s%d" % (i % 3)) for i in range(90)]
        df = spark.createDataFrame(rows, ["doc_id", "stratum"])
        a = stratified_sample(df, "stratum", "doc_id", 5)
        b = stratified_sample(df.repartition(7), "stratum", "doc_id", 5)
        ra = sorted((r.stratum, r.doc_id) for r in a.collect())
        rb = sorted((r.stratum, r.doc_id) for r in b.collect())
        assert ra == rb
        per = {}
        for s, _ in ra:
            per[s] = per.get(s, 0) + 1
        assert per == {"s0": 5, "s1": 5, "s2": 5}

    def test_stratified_sample_small_stratum(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], ["doc_id", "stratum"])
        out = stratified_sample(df, "stratum", "doc_id", 5)
        assert out.count() == 3  # k larger than stratum keeps all

    def test_pack_sequences_budget(self, spark):
        rows = [(i, "src", 100) for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
        out = pack_sequences(df, "doc_id", F.col("n_tokens"), 250, "source")
        packs = {r.doc_id: r.pack_id for r in out.collect()}
        # prefix sums 0,100,...,900 -> floor(prev/250): 0,0,0,1,1,2,2,2,3,3
        assert [packs[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]

    def test_pack_sequences_per_partition(self, spark):
        rows = [(i, "a" if i % 2 == 0 else "b", 200) for i in range(8)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
        out = pack_sequences(df, "doc_id", F.col("n_tokens"), 300, "source")
        for r in out.collect():
            # each source has its own prefix sum: 0,200,400,600
            rank = r.doc_id // 2
            assert r.pack_id == (rank * 200) // 300
