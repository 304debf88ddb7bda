"""Multimodal (image/audio/video) column plumbing (extension surface).

Media are opaque ``binary`` columns + typed metadata structs. The
Spark-side plumbing — schema, partition-friendly batch iteration,
Arrow-batched Pandas transforms via mapInPandas — is real and tested;
the codec step itself is STUBBED (no PIL/ffmpeg in this container):
``decode_fn=None`` uses a deterministic fake decoder so the pipeline
shape (bytes -> features) runs end-to-end; pass a real decoder on a
cluster with the codec libraries installed.

At 100 TB: mapInPandas streams Arrow batches executor-side, so memory
is bounded by batch size, not partition size; binary payloads never
visit the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta_width", LongType(), True),
        StructField("meta_height", LongType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a codec: md5-derived pseudo-features.
    Feature i is the i-th 16-bit big-endian slice of md5(payload),
    scaled to [0, 1] and rounded to 6 decimals — ENGINE-PORTABLE, so
    a SQL oracle reproduces the whole bytes -> features -> stats
    pipeline bit-for-bit (the x07/x23 md5 determinism trick; round 10
    used an RNG seed here, which DuckDB could not replay). dim > 8
    cycles the hash with a counter suffix. Replace with
    PIL/torchaudio/ffmpeg frame sampling in production — raise until
    then so misuse is loud."""
    if payload is None:
        raise NotImplementedError("real media decode requires codec libs")
    import hashlib

    hexes = ""
    block = 0
    while len(hexes) < dim * 4:
        suffix = b"" if block == 0 else b"#%d" % block
        hexes += hashlib.md5(payload + suffix).hexdigest()
        block += 1
    return np.array(
        [round(int(hexes[4 * i : 4 * i + 4], 16) / 65535.0, 6) for i in range(dim)],
        dtype=np.float32,
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """bytes -> feature vectors with mapInPandas (Arrow-batched; the
    only sane shape for per-row Python over binary columns)."""
    if decode_fn is None:
        # closure-local default: a module-level function would pickle
        # by reference and require the package on the worker's path
        # (same md5-derived portable features as fake_decode)
        def decode_fn(payload: bytes, dim: int = 8) -> np.ndarray:
            if payload is None:
                raise NotImplementedError("real media decode requires codec libs")
            import hashlib

            # cycle the hash with a counter suffix for dim > 8 exactly
            # like fake_decode (one md5 yields only 8 four-char
            # slices; the round-11 closure raised on dim >= 9)
            hexes = ""
            block = 0
            while len(hexes) < dim * 4:
                suffix = b"" if block == 0 else b"#%d" % block
                hexes += hashlib.md5(payload + suffix).hexdigest()
                block += 1
            return np.array(
                [
                    round(int(hexes[4 * i : 4 * i + 4], 16) / 65535.0, 6)
                    for i in range(dim)
                ],
                dtype=np.float32,
            )

    fn = decode_fn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if p is None else fn(bytes(p)).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [None if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (test
    fixture; payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = [
        (
            i,
            kinds[i % 3],
            bytes(rng.integers(0, 256, size=32, dtype=np.uint8).tobytes()),
            int(rng.integers(16, 512)),
            int(rng.integers(16, 512)),
            int(rng.integers(100, 10_000)),
        )
        for i in range(n)
    ]
    # few rows -> few partitions: otherwise every core spawns an Arrow
    # python worker for a 2-row slice and startup dominates
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id,
    frame_ts) — the explode is pure Spark (sequence over duration);
    only the per-frame decode (stubbed) needs Python."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("meta_duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_images(
    media: DataFrame,
    target_width: int,
    resample_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Aspect-preserving image resize: images get target_width and a
    height scaled by the original aspect ratio; non-image rows pass
    through untouched.

    The dimension arithmetic is pure JVM column math (no Python); only
    the pixel resample itself crosses into Arrow-batched mapInPandas.
    The resample is STUBBED (no PIL in this container) with a
    deterministic md5-derived payload so the full pipeline —
    schema, metadata update, batch iteration — runs and is testable;
    pass ``resample_fn(payload, w, h) -> bytes`` (PIL/opencv) in
    production. A None payload raises loudly, same policy as decode.
    """
    is_img = F.col("kind") == "image"
    tw = F.when(is_img, F.lit(int(target_width))).otherwise(F.col("meta_width"))
    th = F.when(
        is_img,
        F.greatest(
            F.lit(1),
            F.round(
                F.lit(int(target_width))
                * F.col("meta_height")
                / F.greatest(F.col("meta_width"), F.lit(1))
            ).cast("long"),
        ),
    ).otherwise(F.col("meta_height"))
    sized = media.select(
        "media_id", "kind", "payload",
        tw.alias("meta_width"), th.alias("meta_height"), "meta_duration_ms",
    )

    if resample_fn is None:

        def resample_fn(payload: bytes, w: int, h: int) -> bytes:
            if payload is None:
                raise NotImplementedError("real image resample requires PIL/opencv")
            import hashlib

            seed = hashlib.md5(payload + b"%dx%d" % (w, h)).digest()
            need = max(16, (w * h) // 64)  # stand-in for the resized size
            return (seed * (need // len(seed) + 1))[:need]

    fn = resample_fn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, kind, w, h in zip(
                pdf["payload"], pdf["kind"], pdf["meta_width"], pdf["meta_height"]
            ):
                if kind != "image" or p is None:
                    out.append(p)
                else:
                    out.append(fn(bytes(p), int(w), int(h)))
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return sized.mapInPandas(run, MEDIA_SCHEMA)
