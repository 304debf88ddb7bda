"""Round-11 scale-shape fixes, asserted on executed plans and planted
pathologies:

- dsir_select now collapses the raw token explode to (doc, token, cnt)
  in a MAP-SIDE partial aggregate BEFORE the unigram-model join (the
  round-10 review's one "weak" finding: the old per-OCCURRENCE join
  concentrated every copy of "the" on one reducer at 100 TB), with an
  x52-style salt option for residual cross-doc hot tokens. Same math,
  so the x53 oracle hash is unchanged — verified by oracle_check; here
  we pin the plan shape and salted/unsalted result identity.
- cluster_balanced_sample now takes its per-cluster quota in TWO
  phases (salted sub-window over (cluster, hash(id) % salt), then a
  merge window over the bounded survivors) instead of shuffling the
  whole corpus into k cluster-partitions (the round-10 ADVICE medium).
  The fixed md5 total order makes the two plans select identical sets.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.operators.sampling import dsir_select
from deepdb_public_spark.operators.similarity import cluster_balanced_sample
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def skew_docs(spark):
    """100 docs; half carry a 2000-occurrence intra-doc run of one
    token (the hot-key pathology: the old plan shuffled 2000 join-input
    rows per doc for it, the collapsed plan exactly one)."""
    return spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") < 30).alias("tgt"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("the " * 2000)).otherwise(
                F.lit("")
            ),
            F.lit("alpha beta doc"),
            F.col("id").cast("string"),
        ).alias("text"),
    )


def test_dsir_model_join_is_aggregate_fed(skew_docs):
    """The doc side of the token->model join must arrive from a
    (doc, __tgt, token) partial aggregate — one row per (doc, token),
    regardless of occurrence count — so intra-doc token runs never
    reach a shuffle unreduced."""
    out = dsir_select(skew_docs, "text", "doc_id", F.col("tgt"), top_k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"HashAggregate\(keys=\[doc_id#\d+L?, __tgt#\d+, t#", plan
    ), plan[:3000]
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_dsir_salted_identical_and_salts_the_join_key(spark, skew_docs):
    """salt>0 spreads each token over salt sub-keys: identical scores
    and selection, and the executed join partitioning is (t, __salt).
    Broadcast is disabled for the assertion — at 100 TB the model side
    of a hot vocabulary may not broadcast, and the salted SHUFFLE key
    is what the defense is for."""
    base = dsir_select(skew_docs, "text", "doc_id", F.col("tgt"), top_k=10)
    rows = {r["doc_id"]: (r["n_tokens"], r["log_weight"], r["selected"])
            for r in base.collect()}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = dsir_select(
            skew_docs, "text", "doc_id", F.col("tgt"), top_k=10, salt=8
        )
        srows = {r["doc_id"]: (r["n_tokens"], r["log_weight"], r["selected"])
                 for r in salted.collect()}
        assert srows == rows
        splan = salted._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"hashpartitioning\(t#\d+, __salt", splan), (
            splan[:3000]
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dsir_rejects_negative_salt(skew_docs):
    with pytest.raises(ValueError, match="salt"):
        dsir_select(
            skew_docs, "text", "doc_id", F.col("tgt"), top_k=5, salt=-1
        )


def test_cluster_sample_two_phase_matches_single_window(emb):
    """The salted two-phase quota selects the IDENTICAL set as the
    single per-cluster window (global top-N under a fixed total order
    is contained in the union of per-salt top-Ns)."""
    single = cluster_balanced_sample(
        emb, "embedding", "vec_id", per_cluster=25, k=8, iters=2, salt=0
    ).collect()
    two = cluster_balanced_sample(
        emb, "embedding", "vec_id", per_cluster=25, k=8, iters=2, salt=16
    ).collect()
    as_map = lambda rows: {r["id"]: (r["cluster"], r["selected"]) for r in rows}
    assert as_map(two) == as_map(single)
    # the balancing guarantee holds on the two-phase path
    by_cluster: dict[int, int] = {}
    tot: dict[int, int] = {}
    for r in two:
        tot[r["cluster"]] = tot.get(r["cluster"], 0) + 1
        if r["selected"]:
            by_cluster[r["cluster"]] = by_cluster.get(r["cluster"], 0) + 1
    for c, n in tot.items():
        assert by_cluster.get(c, 0) == min(25, n), f"cluster {c} quota"


def test_cluster_sample_two_phase_plan_shape(emb):
    """Phase 1 windows over (cluster, pmod(hash(id), salt)) — k*salt
    balanced partitions — and the bounded winner set broadcasts back;
    no window in the executed plan partitions the full corpus by bare
    cluster."""
    out = cluster_balanced_sample(
        emb, "embedding", "vec_id", per_cluster=10, k=8, iters=1, salt=16
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan, plan[:3000]
    assert plan.count("Window") >= 2
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the only full-corpus window partitioning must include the salt:
    # phase 2's bare-cluster window sees only k*salt*per_cluster rows
    assert "CartesianProduct" not in plan


def test_cluster_sample_rejects_negative_salt(emb):
    with pytest.raises(ValueError, match="salt"):
        cluster_balanced_sample(
            emb, "embedding", "vec_id", per_cluster=5, salt=-2
        )


# ------------------------------------------------------ bigram LM (x56)


def test_bigram_logprob_semantics(spark):
    """Hand-checkable corpus: p(b|a) add-one smoothed over the corpus
    bigram/context counts; short docs anchor with n_bigrams=0."""
    import math

    from deepdb_public_spark.operators.filters import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo"), (4, None)],
        "id long, text string",
    )
    rows = {r["id"]: r for r in bigram_logprob(df, "text", "id").collect()}
    assert len(rows) == 4
    # corpus bigrams: doc1 {ab:2, ba:1}, doc2 {ab:1} -> c(ab)=3, c(ba)=1
    # contexts: c(a)=3, c(b)=1; V = distinct unigrams = {a,b,solo} = 3
    p_ab = (3 + 1) / (3 + 1 * (3 + 1))
    p_ba = (1 + 1) / (1 + 1 * (3 + 1))
    d1 = (2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["mean_logprob"] == round(d1, 6)
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["mean_logprob"] == round(math.log(p_ab), 6)
    for i in (3, 4):  # one-token and NULL docs anchor, never vanish
        assert rows[i]["n_bigrams"] == 0
        assert rows[i]["mean_logprob"] is None and rows[i]["ppl"] is None
    assert rows[1]["ppl"] == round(math.exp(-rows[1]["mean_logprob"]), 6)


def test_bigram_logprob_plan_and_salt(spark, skew_docs):
    """The model joins are fed by the (doc, a, b) map-side collapse —
    no positional self-join, no cartesian — and salt>0 yields
    identical scores with a salted join key."""
    from deepdb_public_spark.operators.filters import bigram_logprob

    base = bigram_logprob(skew_docs, "text", "doc_id")
    plan = base._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert re.search(r"HashAggregate\(keys=\[doc_id#\d+L?, a#\d+, b#", plan), (
        plan[:3000]
    )
    rows = {r["doc_id"]: (r["n_bigrams"], r["mean_logprob"], r["ppl"])
            for r in base.collect()}
    salted = bigram_logprob(skew_docs, "text", "doc_id", salt=4)
    srows = {r["doc_id"]: (r["n_bigrams"], r["mean_logprob"], r["ppl"])
             for r in salted.collect()}
    assert srows == rows
    with pytest.raises(ValueError, match="salt"):
        bigram_logprob(skew_docs, "text", "doc_id", salt=-1)


def test_bigram_logprob_deterministic_under_repartition(spark, skew_docs):
    from deepdb_public_spark.operators.filters import bigram_logprob

    a = {r["doc_id"]: r["mean_logprob"]
         for r in bigram_logprob(skew_docs, "text", "doc_id").collect()}
    b = {r["doc_id"]: r["mean_logprob"]
         for r in bigram_logprob(
             skew_docs.repartition(13), "text", "doc_id").collect()}
    assert a == b


def test_unigram_logprob_collapse_plan(spark, skew_docs):
    """Round 11: unigram_logprob's model join is aggregate-fed too
    (same fix as dsir_select) — one row per (doc, token)."""
    from deepdb_public_spark.operators.filters import unigram_logprob

    out = unigram_logprob(skew_docs, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"HashAggregate\(keys=\[doc_id#\d+L?, t#", plan), (
        plan[:3000]
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # the planted 2000-occurrence run still counts per-OCCURRENCE
    assert rows[0]["n_tokens"] >= 2000


# ------------------------------------------------- curation pipeline (x57)


@pytest.fixture(scope="module")
def curate_docs(spark):
    """60 docs in 2 strata with planted failures for every stage:
    ids 0-4 fail quality (short), ids 10/11 duplicate id 12's text
    (case-insensitively), the rest compete for a per-stratum quota."""
    return spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("de"))
            .alias("lang"),
        F.when(F.col("id") < 5, F.lit("tiny"))
        .when(F.col("id") == 10, F.lit("Shared Body Text A"))
        .when(F.col("id") == 11, F.lit("SHARED BODY TEXT A"))
        .when(F.col("id") == 12, F.lit("shared body text a"))
        .otherwise(F.concat(F.lit("unique body text "), F.col("id")))
        .alias("text"),
    )


def _curate(df, per_stratum, salt=16):
    from deepdb_public_spark.operators.curation import curate_corpus

    return curate_corpus(
        df, "text", "doc_id", "lang", per_stratum,
        quality=F.length("text") > 4, salt=salt,
    )


def test_curate_stage_precedence_and_keep_first(curate_docs):
    rows = {r["doc_id"]: r for r in _curate(curate_docs, 100).collect()}
    assert len(rows) == 60
    for i in range(5):
        assert rows[i]["stage"] == "quality" and not rows[i]["kept"]
    # keep-first among case-normalized duplicates: lowest id (10) wins
    assert rows[10]["stage"] == "kept"
    assert rows[11]["stage"] == "duplicate" and not rows[11]["kept"]
    assert rows[12]["stage"] == "duplicate" and not rows[12]["kept"]
    assert all(r["stage"] in {"quality", "duplicate", "quota", "kept"}
               for r in rows.values())


def test_curate_quota_is_balanced_and_two_phase_matches(curate_docs):
    single = {r["doc_id"]: (r["stage"], r["kept"])
              for r in _curate(curate_docs, 10, salt=0).collect()}
    two = {r["doc_id"]: (r["stage"], r["kept"])
           for r in _curate(curate_docs, 10, salt=8).collect()}
    assert two == single
    kept_by = {}
    for r in _curate(curate_docs, 10).collect():
        if r["kept"]:
            kept_by[r["stratum"]] = kept_by.get(r["stratum"], 0) + 1
    assert kept_by == {"en": 10, "de": 10}


def test_curate_deterministic_under_repartition(curate_docs):
    a = {r["doc_id"]: (r["stage"], r["kept"])
         for r in _curate(curate_docs, 7).collect()}
    b = {r["doc_id"]: (r["stage"], r["kept"])
         for r in _curate(curate_docs.repartition(11), 7).collect()}
    assert a == b


def test_curate_plan_shape(curate_docs):
    out = _curate(curate_docs, 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "pmod" in plan  # two-phase quota sub-window
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    with pytest.raises(ValueError, match="salt"):
        _curate(curate_docs, 10, salt=-1)


# --------------------------------------------------- mixture plan (x58)


def test_mixture_plan_math(spark):
    """Floor allocation never overshoots the budget; unlisted sources
    take the default weight; fraction > 1 marks the repeat-epochs
    case; weight 0 drops a source from the budget."""
    from deepdb_public_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("web", "a b c d e f g h"), ("web", "i j k l"),
         ("code", "x y"), ("books", "m n o"), ("junk", "z z z")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in mixture_plan(
        df, "text", "source",
        weights={"web": 2.0, "code": 1.0, "junk": 0.0},
        token_budget=120, default_weight=1.0,
    ).collect()}
    # wsum = 2 + 1 + 0 + 1(default for books) = 4
    assert rows["web"]["n_tokens"] == 12
    assert rows["web"]["target_tokens"] == 60      # 120*2/4
    assert rows["code"]["target_tokens"] == 30     # 120*1/4
    assert rows["books"]["target_tokens"] == 30    # default weight
    assert rows["junk"]["target_tokens"] == 0      # zero weight
    assert sum(r["target_tokens"] for r in rows.values()) <= 120
    assert rows["code"]["fraction"] == 15.0        # 30 tokens / 2 = epochs
    assert rows["web"]["fraction"] == 5.0
    assert rows["junk"]["fraction"] == 0.0


def test_mixture_plan_is_two_aggregates(spark):
    """The plan is aggregate + broadcast of a 1-row frame — no window,
    no join keyed on data rows, no cartesian over data."""
    from deepdb_public_spark.operators.sampling import mixture_plan

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = mixture_plan(docs, "text", "source", {"src0": 2.0}, 10_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2


# -------------------------------------- curation invariants (hypothesis)


def test_curate_invariants_random_corpora(spark):
    """Property-style sweep over randomized corpora: every input row
    verdicts exactly once; kept implies quality-pass; per-stratum kept
    counts never exceed the quota; dedup keeps exactly one doc per
    duplicated fingerprint among quality passers."""
    import random

    from deepdb_public_spark.operators.curation import curate_corpus

    rnd = random.Random(7)
    for trial in range(3):
        n = rnd.randint(20, 60)
        quota = rnd.randint(1, 6)
        rows = []
        for i in range(n):
            text = rnd.choice(
                ["dup body one", "dup body two", f"unique {i}", "x"]
            )
            rows.append((i, rnd.choice(["a", "b", "c"]), text))
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = curate_corpus(
            df, "text", "doc_id", "lang", quota,
            quality=F.length("text") > 2, salt=rnd.choice([0, 4]),
        ).collect()
        assert len(out) == n and len({r["doc_id"] for r in out}) == n
        kept_by: dict[str, int] = {}
        for r in out:
            if r["kept"]:
                assert r["stage"] == "kept"
                kept_by[r["stratum"]] = kept_by.get(r["stratum"], 0) + 1
        for c, k in kept_by.items():
            assert k <= quota, (trial, c, k, quota)
        # keep-first: among quality passers sharing a fingerprint,
        # exactly one is NOT stage='duplicate'
        by_fp: dict[str, list] = {}
        for i, lang, text in rows:
            if len(text) > 2:
                by_fp.setdefault(text.lower(), []).append(i)
        verdict = {r["doc_id"]: r["stage"] for r in out}
        for fp, ids in by_fp.items():
            non_dup = [i for i in ids if verdict[i] != "duplicate"]
            assert len(non_dup) == 1 and non_dup[0] == min(ids), (fp, ids)
