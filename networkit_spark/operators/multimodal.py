"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas. The image/audio codec
libraries are NOT in this container, so the decode kernels are STUBBED:
`decode_fn=None` uses a deterministic fake (byte-level features) and a
real codec drops in as a one-argument callable — the Spark-side plumbing
(schema, batching, partitioning, UDF signature) is the real, tested part.

Scale notes:
- media bytes never pass through a shuffle: all kernels are mapInPandas
  (narrow, partition-local); only extracted features (small, fixed-width)
  flow into joins/aggregations downstream.
- `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory for
  wide binary rows; metadata-only queries prune the binary column at the
  parquet scan (columnar projection — verified in tests via .explain).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: byte-histogram features.
    Replace with a real decoder (PIL/av/soundfile) in deployment."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return hist / arr.size


def extract_features(media: DataFrame,
                     decode_fn: Callable[[bytes], np.ndarray] | None = None) -> DataFrame:
    """(media_id, features: array<double>) — Arrow-batched feature
    extraction; vectorized over each pandas batch."""
    fn = decode_fn or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fn(bytes(p)).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(
        batches, schema="media_id long, features array<double>"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_id, frame_index) — which frames a video sampler would
    decode; pure metadata arithmetic, no payload access (the binary
    column is pruned from the scan)."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_index"),
    )


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """(media_id, scale) — resize factors from metadata only."""
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        (F.lit(target) / F.greatest("meta.width", "meta.height")).alias("scale"),
    )


def pil_decode(payload: bytes) -> np.ndarray:
    """Real image decode: mean RGB + normalized size features via PIL,
    padded/truncated to FEATURE_DIM. Import-guarded — PIL is optional in
    this container; deployments with Pillow installed get true pixel
    features, others raise with a clear message (use _fake_decode / a
    custom decode_fn instead)."""
    try:
        import io

        from PIL import Image  # optional dependency
    except ImportError as exc:  # pragma: no cover - container lacks PIL
        raise NotImplementedError(
            "Pillow is not installed in this environment; pass decode_fn="
            "None for the deterministic fake or supply a custom decoder"
        ) from exc
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    arr = np.asarray(img, dtype=np.float64) / 255.0
    feats = np.concatenate(
        [arr.mean(axis=(0, 1)), [img.width / 4096.0, img.height / 4096.0]]
    )
    out = np.zeros(FEATURE_DIM)
    out[: min(FEATURE_DIM, feats.size)] = feats[:FEATURE_DIM]
    return out


def have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_stub(media: DataFrame) -> DataFrame:
    """Explicit NotImplementedError boundary for real decoding in this
    container — call sites that need true pixels/samples fail loudly."""
    raise NotImplementedError(
        "media codecs are not available in this environment; pass a real "
        "decode_fn to extract_features() in deployment"
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    rows = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        meta = (64 + i % 128, 64 + (i * 7) % 128, (i % 30) + 1, 16000)
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
