"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: binary payload columns,
a metadata struct (modality, codec, dims, duration), Arrow-batched
``mapInPandas`` feature extraction with explicit schemas and bounded
batch sizes. The actual media *decode* (JPEG/PNG/ffmpeg) is stubbed —
the decode libraries aren't in this container — behind
``NotImplementedError`` with a deterministic fake available for tests,
so pipelines exercise partitioning/batching/schema exactly as they
would with a real codec.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

from pandas_spark.frame import DataFrame

# Imaging extras probe: when Pillow is installed (cluster deployments),
# decode_image / real_decode_features activate; this container ships
# without it, so the deterministic fake is the tested default.
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None

HAS_IMAGING = _PIL_Image is not None

METADATA_SCHEMA = (
    "struct<modality:string,codec:string,width:int,height:int,"
    "duration_ms:int,sample_rate:int>"
)


def attach_binary_payload(
    frame: DataFrame,
    source_col: str,
    modality: str = "image",
    codec: str = "raw",
    duration_ms=None,
) -> DataFrame:
    """Materialize a binary payload column + metadata struct.

    In production the payload comes off object storage; here it is
    derived from an existing column so the downstream plumbing
    (binary type, metadata pruning, batch shapes) is identical.
    ``duration_ms`` (a Column) populates the metadata for time-based
    media so frame-sampling plans have a real horizon.
    """
    dur = F.lit(None).cast("int") if duration_ms is None else duration_ms.cast("int")
    sdf = frame.spark.withColumns(
        {
            "payload": F.encode(F.col(source_col).cast("string"), "utf-8"),
            "media_meta": F.struct(
                F.lit(modality).alias("modality"),
                F.lit(codec).alias("codec"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                dur.alias("duration_ms"),
                F.lit(None).cast("int").alias("sample_rate"),
            ),
        }
    )
    return DataFrame(sdf)


def decode_image(payload: bytes) -> "object":
    """Decode JPEG/PNG bytes → HxWxC uint8 array via Pillow when the
    imaging extra is installed (``HAS_IMAGING``); raises otherwise.

    The container has no imaging libraries, so the fake path is what
    tests exercise; a cluster deployment only needs `pip install
    pillow` — no plan changes.
    """
    if _PIL_Image is None:
        raise NotImplementedError(
            "image decode requires an imaging library (pillow) — "
            "not available in this environment; use fake_decode_features"
        )
    import io

    import numpy as np

    with _PIL_Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"))


def real_decode_features(payload: bytes) -> dict:
    """Pillow-backed drop-in for ``fake_decode_features``: same output
    schema (FEATURE_SCHEMA), real dimensions."""
    h = hashlib.sha256(payload).digest()
    arr = decode_image(payload)
    return {
        "byte_len": len(payload),
        "digest": h.hex()[:16],
        "pseudo_width": int(arr.shape[1]),
        "pseudo_height": int(arr.shape[0]),
    }


def fake_decode_features(payload: bytes) -> dict:
    """Deterministic stand-in for decode+feature-extract: stable
    pseudo-dimensions and a content digest, derived only from bytes."""
    h = hashlib.sha256(payload).digest()
    return {
        "byte_len": len(payload),
        "digest": h.hex()[:16],
        "pseudo_width": 64 + h[0] % 64,
        "pseudo_height": 64 + h[1] % 64,
    }


FEATURE_SCHEMA = (
    "id long, byte_len int, digest string, pseudo_width int, pseudo_height int"
)


def extract_features(
    frame: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    batch_size_hint: int = 1024,
    features_fn=None,
) -> DataFrame:
    """Arrow-batched per-partition feature extraction (mapInPandas).

    Only (id, payload) flow into Python — column pruning keeps the rest
    JVM-side. ``features_fn`` (payload bytes → FEATURE_SCHEMA dict)
    defaults to the deterministic fake; pass
    ``real_decode_features`` on a cluster with the imaging extra —
    the plan shape is identical either way.
    """
    fn = features_fn or fake_decode_features
    src = frame.spark.select(F.col(id_col).alias("id"), F.col(payload_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "id", pdf["id"].values)
            yield out

    return DataFrame(src.mapInPandas(run, FEATURE_SCHEMA))


def resize_plan(
    features: DataFrame,
    max_w: int,
    max_h: int,
    w_col: str = "pseudo_width",
    h_col: str = "pseudo_height",
) -> DataFrame:
    """Image-resize *plan*: aspect-preserving fit into (max_w, max_h),
    never upscaling — the metadata arithmetic every thumbnail pipeline
    runs, as pure Catalyst expressions (map-only, zero shuffle). The
    pixel resample itself is the stubbed decode step (``decode_image``);
    a cluster deployment swaps it in without touching this plan."""
    w = F.col(w_col).cast("double")
    h = F.col(h_col).cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    sdf = features.spark.withColumns(
        {
            "new_width": F.floor(w * scale).cast("long"),
            "new_height": F.floor(h * scale).cast("long"),
        }
    )
    return DataFrame(sdf)


def frame_sample_plan(
    frame: DataFrame,
    id_col: str = "doc_id",
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (sequence+explode — distributed row generation); the frame decode
    itself is the stubbed step."""
    sdf = frame.spark.withColumn(
        "sample_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("media_meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ),
    ).select(id_col, "sample_ts_ms")
    return DataFrame(sdf)
