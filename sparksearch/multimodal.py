"""Multimodal (image/audio/video) column handling for training-data pipelines.

Media travel as opaque ``binary`` payload columns with a typed metadata
struct — the same pattern as a 100 TB multimodal pretraining table: parquet
stores the bytes inline (or a reference URI for >row-group-size blobs), all
filtering/routing happens on the cheap metadata columns so Catalyst can
prune/push down without touching payloads, and per-item decode work runs in
Arrow-batched ``mapInPandas`` where a batch of payloads crosses to Python
once.

The actual codec calls (PIL/ffmpeg/soundfile) are NOT available in this
environment, so the decode kernels are STUBBED behind
:data:`DECODE_BACKEND`:

* ``"fake"`` (default) — a deterministic pure-numpy fake decoder: payload
  bytes are hashed into pixel/sample arrays of the metadata-declared shape.
  Everything around it (schemas, batching, partitioning, UDF signatures,
  output shapes) is real and tested; swapping in a real backend changes
  only the inner ``_decode_*_real`` functions.
* ``"real"`` — raises ``NotImplementedError`` with the dependency it needs.

Operators:
  media_table        build/validate the canonical media schema
  decode_features    payload -> fixed-size feature vector (image/audio)
  resize_image       payload -> resized pixel tensor stats (stub decode)
  sample_frames      video payload -> N frame features (frame-sampling)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_BACKEND = "fake"  # "real" once PIL/soundfile/ffmpeg exist

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("meta", MEDIA_META_TYPE, False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
    ]
)


def _fake_pixels(payload: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic stand-in for image decode: expand the payload hash
    into an (h, w, c) uint8 tensor.  Pure function of (payload, shape)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**63)
    rng = np.random.Generator(np.random.Philox(key=[seed, h * 131 + w * 17 + c]))
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def _fake_samples(payload: bytes, n: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[8:16], "big") % (2**63)
    rng = np.random.Generator(np.random.Philox(key=[seed, n]))
    return (rng.random(n, dtype=np.float64) * 2 - 1).astype(np.float32)


def _require_real_backend(kind: str) -> None:
    raise NotImplementedError(
        f"real {kind} decoding needs PIL/soundfile/ffmpeg, which are not "
        "installed in this environment; set multimodal.DECODE_BACKEND='fake' "
        "or install the codec libraries and implement _decode_*_real"
    )


def synthetic_media(spark, n_items: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Deterministic media table: payload bytes + honest metadata.  Round-
    robin image/audio/video; payload is seeded random bytes (opaque blob —
    exactly how real encoded media looks to the engine)."""
    base = spark.range(0, n_items, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                i = int(i)
                rng = np.random.Generator(np.random.Philox(key=[seed, i]))
                kind = ("image", "audio", "video")[i % 3]
                payload = rng.bytes(256 + int(rng.integers(0, 512)))
                meta = {
                    "kind": kind,
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": int(rng.integers(16, 65)) if kind != "audio" else None,
                    "height": int(rng.integers(16, 65)) if kind != "audio" else None,
                    "channels": 3 if kind != "audio" else 1,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": int(rng.integers(500, 10_000)) if kind != "image" else None,
                    "n_frames": int(rng.integers(8, 33)) if kind == "video" else None,
                }
                rows.append(
                    (i, i % 97, meta, payload, hashlib.sha256(payload).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "doc_id", "meta", "payload", "payload_sha256"]
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("payload_sha256", T.StringType(), False),
    ]
)


def decode_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """payload -> fixed-size feature vector (channel-mean pyramid for
    images/video first-frame, banded sample energy for audio).

    Plan shape: metadata filter happens BEFORE this narrow mapInPandas, so
    payload bytes of filtered-out rows never cross to Python (column
    pruning keeps them in parquet).  Real decode would replace the _fake_*
    kernels only.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for r in pdf.itertuples(index=False):
                m = r.meta
                if DECODE_BACKEND == "real":
                    _require_real_backend(m["kind"])
                if m["kind"] in ("image", "video"):
                    # nullable struct ints arrive as floats in Arrow batches
                    px = _fake_pixels(
                        bytes(r.payload), int(m["height"]), int(m["width"]), int(m["channels"])
                    )
                    # pooled channel-mean pyramid, padded/truncated to feat_dim
                    pools = [px.mean()] + [px[..., c].mean() for c in range(px.shape[-1])]
                    grid = px.reshape(4, px.shape[0] // 4, 4, px.shape[1] // 4, -1).mean(
                        axis=(1, 3, 4)
                    ).ravel() if px.shape[0] % 4 == 0 and px.shape[1] % 4 == 0 else np.array([])
                    v = np.concatenate([np.array(pools), grid])
                else:
                    s = _fake_samples(bytes(r.payload), 1024)
                    bands = s.reshape(16, 64)
                    v = np.sqrt((bands**2).mean(axis=1))
                v = np.resize(v.astype(np.float32), feat_dim)
                feats.append(v.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "feature": feats,
                    "payload_sha256": pdf["payload_sha256"],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("mean_px", T.DoubleType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
    ]
)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize (stub decode, real nearest-neighbor resampling math and
    real plumbing).  Only kind='image' rows are decoded — the filter is a
    metadata predicate pushed to the scan."""
    imgs = media.filter(F.col("meta.kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            means = []
            for r in pdf.itertuples(index=False):
                m = r.meta
                if DECODE_BACKEND == "real":
                    _require_real_backend("image")
                mh, mw, mc = int(m["height"]), int(m["width"]), int(m["channels"])
                px = _fake_pixels(bytes(r.payload), mh, mw, mc)
                yi = (np.arange(height) * mh // height).astype(int)
                xi = (np.arange(width) * mw // width).astype(int)
                out = px[np.ix_(yi, xi)]
                means.append(float(out.mean()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": np.int32(width),
                    "out_height": np.int32(height),
                    "mean_px": means,
                    "payload_sha256": pdf["payload_sha256"],
                }
            )

    return imgs.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 8, feat_dim: int = 8) -> DataFrame:
    """Video frame sampling: emit a feature row per sampled frame (1-in-N
    uniform).  One input row fans out to n_frames/every_n rows — the
    classic video-expansion shape; partitioning stays by input splits."""
    vids = media.filter(F.col("meta.kind") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_fi, out_feat = [], [], []
            for r in pdf.itertuples(index=False):
                m = r.meta
                if DECODE_BACKEND == "real":
                    _require_real_backend("video")
                for fi in range(0, int(m["n_frames"]), every_n):
                    px = _fake_pixels(
                        bytes(r.payload) + fi.to_bytes(4, "big"),
                        int(m["height"]), int(m["width"]), int(m["channels"]),
                    )
                    v = np.resize(
                        np.array([px.mean(), px.std()] + [px[..., c].mean() for c in range(px.shape[-1])]),
                        feat_dim,
                    ).astype(np.float32)
                    out_id.append(r.media_id)
                    out_fi.append(fi)
                    out_feat.append(v.tolist())
            if out_id:
                yield pd.DataFrame(
                    {"media_id": out_id, "frame_idx": np.int32(out_fi), "feature": out_feat}
                )

    return vids.mapInPandas(run, schema=FRAME_SCHEMA)
