"""Text-analysis column functions (extension surface, SURVEY.md §7.6).

All JVM-side built-ins (`pyspark.sql.functions`) — no Python UDFs in
the hot path, so they stay inside whole-stage codegen and scale
per-row with zero shuffle. These are the building blocks for the
training-data pipeline operators (language-ID, quality scoring, token
counting, fingerprinting) the engine exposes over `documents`-like
corpora at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_tokens(text: Column) -> Column:
    """Whitespace tokenization -> array<string> (empty strings dropped)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(word_tokens(text))


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish subword proxy: letter runs, digit runs, and individual
    punctuation marks each become tokens (vectorized JVM regex). A
    stand-in for a real tokenizer with the same Spark-side shape."""
    return F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles -> array<string> (distinct); the
    shingle set for MinHash / Jaccard dedup.

    The normalized text is bound as a lambda variable (transform over
    a 1-element array) before the per-index transform: higher-order
    lambdas re-evaluate captured expressions PER ELEMENT, so inlining
    the lower+regexp normalization would run the regex once per ngram
    (~500x per document) instead of once per row."""
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.flatten(
        F.transform(
            F.array(norm),
            lambda nm: F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.lit(1), F.length(nm) - F.lit(n - 1))
                    ),
                    lambda i: nm.substr(i, F.lit(n)),
                )
            ),
        )
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic document-quality signals (length, punctuation ratio,
    mean word length, stopword ratio) — the classic pre-training
    corpus filters, computed as pure column expressions."""
    toks = word_tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)),
        "mean_word_len": (n_chars - n_tokens + 1).cast("double")
        / F.greatest(n_tokens, F.lit(1)),
        "stopword_ratio": n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)),
    }


_EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this",
]

# Tiny per-language marker profiles for the n-gram/stopword heuristic
# language ID. Real deployments would ship fastText-style profiles;
# the *operator shape* (score = marker hits, argmax over languages,
# all JVM-side) is what matters at scale.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "zh": [],  # handled by CJK codepoint detection below
}


def language_id(text: Column) -> Column:
    """Heuristic language ID: CJK codepoint share first, else argmax of
    per-language stopword hit counts; 'und' when nothing matches."""
    toks = F.transform(word_tokens(text), lambda t: F.lower(t))
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    scores = []
    for lang, markers in LANG_PROFILES.items():
        if not markers:
            continue
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return (
        F.when(cjk * 2 > F.length(text), F.lit("zh"))
        .when(best["score"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    (exact-dedup key; identical function exists in DuckDB for oracle
    checks)."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))


def rolling_hash64(text: Column, base: int = 1000003, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over characters -> bigint, expressed
    with aggregate() so it runs vectorized in the JVM.

    The modulus must satisfy mod * base + 255 < 2^63 or the fold's
    multiply overflows LongType — a hard ARITHMETIC_OVERFLOW under
    ANSI mode (Spark 4 default), silent wraparound otherwise. The
    Mersenne-31 default keeps the accumulator safely inside 64 bits
    with the ~10^6 base (same overflow discipline as simhash64's
    split fold)."""
    if mod * base + 255 >= (1 << 63):
        raise ValueError(
            f"mod ({mod}) * base ({base}) overflows 64-bit long — "
            "shrink one of them"
        )
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * F.lit(base) + F.coalesce(F.ascii(ch), F.lit(0)), F.lit(mod)),
    )
