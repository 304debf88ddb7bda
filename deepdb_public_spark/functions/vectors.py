"""Vector column functions over array<float>/array<double> embeddings.

JVM-side (`zip_with` + `aggregate`) — no UDF, no Python round-trip.
Each op is per-row, so it parallelizes trivially; the only shuffles in
similarity workloads come from the bucketing/top-k operators that use
these (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def hyperplane_sign_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH: sign of <vec, plane_i> per plane, folded
    into one bigint bucket key. Vectors with high cosine similarity
    collide with high probability (SimHash for embeddings). ``planes``
    are driver-generated (seeded numpy) and inlined as literals —
    a few KB of plan, broadcast implicitly with the plan itself."""
    key = F.lit(0).cast("long")
    for plane in planes:
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        key = key * 2 + bit
    return key


def sketch_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two multi-word sketches."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
