"""Deduplication operators for document corpora (extension surface).

Five dedup families, each with an explicit scale story:

- exact:      hash-groupBy on a normalized fingerprint. One shuffle on
              the fingerprint key; linear in corpus size.
- n-gram Jaccard (exact pairs): the *baseline/oracle* path — all-pairs
              join. Quadratic; only for candidate verification or
              small corpora. At scale, use MinHash-LSH to generate
              candidates and THIS verifier only on the candidates.
- MinHash+LSH: shingle -> signature (per-row, JVM) -> band keys ->
              explode -> groupBy band bucket -> pairs within buckets
              -> exact-Jaccard verify. The only shuffle is on band
              keys; candidate count ~ true-duplicate count, not N².
- SimHash:    64-bit signature; block-pigeonhole banding gives a
              COMPLETE candidate filter for Hamming distance <= 3.
- Embedding near-dup: cosine >= threshold pairs via random-hyperplane
              LSH buckets (or brute force as baseline).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    band_keys,
    hamming64,
    minhash_signature,
    simhash64,
    simhash_block_keys,
)
from ..functions.text import char_ngrams, fingerprint_md5, word_tokens
from ..functions.vectors import cosine, hyperplane_sign_bits


def exact_duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical (normalized) documents:
    (fingerprint, n_docs, doc_ids). One shuffle on the md5 key."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


def jaccard_pairs_exact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    use_char_ngrams: bool = False,
    ngram: int = 5,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold. BASELINE path: O(N²)
    cross join — correct on anything, affordable only on small N or on
    LSH candidate sets. Columns: id_a < id_b, jaccard."""
    shingle = (
        char_ngrams(F.col(text_col), ngram)
        if use_char_ngrams
        else F.array_distinct(word_tokens(F.col(text_col)))
    )
    s = df.select(F.col(id_col).alias("id"), shingle.alias("sh"))
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    n_hashes: int = 32,
    n_bands: int = 8,
    use_char_ngrams: bool = False,
    ngram: int = 5,
) -> DataFrame:
    """Scale path: MinHash signatures -> LSH band buckets -> candidate
    pairs -> exact-Jaccard verification. Returns (id_a, id_b, jaccard)
    with jaccard >= threshold (verified exactly, so no false
    positives; recall is the standard LSH S-curve in n_bands/rows).

    Shuffle profile: one explode+groupBy on band keys (candidate
    generation) and one join back for verification — never O(N²).
    """
    rows_per_band = n_hashes // n_bands
    shingle = (
        char_ngrams(F.col(text_col), ngram)
        if use_char_ngrams
        else F.array_distinct(word_tokens(F.col(text_col)))
    )
    sigs = (
        df.select(F.col(id_col).alias("id"), shingle.alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
    )
    banded = sigs.select(
        "id", F.explode(band_keys(F.col("sig"), n_bands, rows_per_band)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sh = sigs.select("id", "sh")
    return (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select("id_a", "id_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= max_hamming.
    Complete (no false negatives) for max_hamming <= 3 via the 4-block
    pigeonhole filter; returns (id_a, id_b, hamming)."""
    sigs = df.select(
        F.col(id_col).alias("id"),
        simhash64(word_tokens(F.col(text_col))).alias("sig"),
    )
    blocked = sigs.select(
        "id", "sig", F.explode(simhash_block_keys(F.col("sig"), 4)).alias("bk")
    ).select("id", "sig", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))
    return (
        blocked.alias("x")
        .join(blocked.alias("y"), ["block", "key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            hamming64(F.col("x.sig"), F.col("y.sig")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    brute_force: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold).

    Scale path: random-hyperplane LSH bucket key (n_planes sign bits),
    pairs generated within buckets only, cosine verified exactly.
    ``brute_force=True`` switches to the all-pairs baseline (for
    recall measurement / tiny inputs)."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if brute_force:
        pairs = base.alias("a").join(base.alias("b"), F.col("a.id") < F.col("b.id"))
    else:
        dim = len(base.select("v").first()["v"])
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_planes, dim)).tolist()
        bucketed = base.withColumn(
            "bucket", hyperplane_sign_bits(F.col("v"), planes)
        )
        pairs = (
            bucketed.alias("a")
            .join(bucketed.alias("b"), ["bucket"])
            .filter(F.col("a.id") < F.col("b.id"))
        )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .distinct()
        .filter(F.col("cos") >= threshold)
    )
