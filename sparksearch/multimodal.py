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

* ``"fake"`` (default) — a deterministic md5-chain decoder: the payload
  bytes expand into a byte tensor of the metadata-declared shape
  (``_fake_bytes``).  Everything around it (schemas, batching,
  partitioning, UDF signatures, output shapes) is real and tested, and the
  kernel is a pure function of the payload bytes that an ANSI-SQL oracle
  can reproduce exactly (md5 + substr — see the media entries in
  entry_queries.py), so the whole distributed pipeline is hard-checkable
  against DuckDB.  Swapping in a real backend changes only ``_fake_bytes``
  call sites.
* ``"real"`` — raises ``NotImplementedError`` with the dependency it needs.

Operators:
  synthetic_media    deterministic media table (payload + honest metadata)
  decode_features    payload -> segment-mean feature rows (image/audio/video)
  resize_image       payload -> nearest-neighbor resampled tensor stats
  sample_frames      video payload -> per-sampled-frame feature rows
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

# audio decode length: fake "samples" per audio payload (one byte = one sample)
AUDIO_N_VALS = 1024
FEATURE_SEGMENTS = 8

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

_KINDS = ("image", "audio", "video")
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def _h60(s: str) -> int:
    """Portable 60-bit string hash (first 15 md5 hex chars) — the Python
    twin of analysis.md5_hash60 / DuckDB ('0x'||substr(md5(x),1,15))::BIGINT."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _fake_bytes(payload: bytes, n_vals: int, stream: str = "") -> np.ndarray:
    """Deterministic stand-in for codec decode: expand payload bytes into
    ``n_vals`` uint8 values via an md5 chain — block j (16 bytes) is
    md5(payload || stream || ':' || j).  Pure function of (payload, stream,
    n_vals); exactly reproducible in SQL from the payload string."""
    n_blocks = (n_vals + 15) // 16
    out = np.empty(n_blocks * 16, np.uint8)
    for j in range(n_blocks):
        h = hashlib.md5(payload + f"{stream}:{j}".encode()).digest()
        out[j * 16 : (j + 1) * 16] = np.frombuffer(h, np.uint8)
    return out[:n_vals]


def _require_real_backend(kind: str) -> None:
    raise NotImplementedError(
        f"real {kind} decoding needs PIL/soundfile/ffmpeg, which are not "
        "installed in this environment; set multimodal.DECODE_BACKEND='fake' "
        "or install the codec libraries and implement the real decode kernels"
    )


def media_meta_py(media_id: int, seed: int) -> dict:
    """Metadata for one media item — pure function of (seed, media_id) over
    the md5-60 family, so a SQL oracle regenerates it bit-identically."""
    i = int(media_id)
    kind = _KINDS[i % 3]
    return {
        "kind": kind,
        "mime": _MIMES[kind],
        "width": 16 + _h60(f"{seed}:w:{i}") % 48 if kind != "audio" else None,
        "height": 16 + _h60(f"{seed}:h:{i}") % 48 if kind != "audio" else None,
        "channels": 3 if kind != "audio" else 1,
        "sample_rate": 16000 if kind == "audio" else None,
        "duration_ms": 500 + _h60(f"{seed}:d:{i}") % 9500 if kind != "image" else None,
        "n_frames": 8 + _h60(f"{seed}:n:{i}") % 25 if kind == "video" else None,
    }


def media_payload_py(media_id: int, seed: int) -> bytes:
    """Payload for one media item: an opaque deterministic blob (md5 hex of
    the id, repeated a pseudo-random 8..31 times -> 256..992 bytes).  ASCII
    by construction so the SQL twin is repeat(md5(...), reps)."""
    i = int(media_id)
    reps = 8 + _h60(f"{seed}:r:{i}") % 24
    return (hashlib.md5(f"{seed}:p:{i}".encode()).hexdigest() * reps).encode()


def synthetic_media(spark, n_items: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Deterministic media table: payload bytes + honest metadata.  Round-
    robin image/audio/video; the payload is an opaque blob — exactly how
    real encoded media looks to the engine.  Counter-based generation: the
    table is a pure function of (seed, media_id), independent of
    partitioning."""
    base = spark.range(0, n_items, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                i = int(i)
                payload = media_payload_py(i, seed)
                rows.append(
                    (
                        i,
                        i % 97,
                        media_meta_py(i, seed),
                        payload,
                        hashlib.sha256(payload).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "doc_id", "meta", "payload", "payload_sha256"]
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_n_vals(meta: dict) -> int:
    if meta["kind"] == "audio":
        return AUDIO_N_VALS
    return int(meta["height"]) * int(meta["width"]) * int(meta["channels"])


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("dim", T.IntegerType(), False),
        T.StructField("value_micro", T.LongType(), False),
    ]
)


def _micro(v: np.ndarray | float):
    """Half-away-from-zero micro rounding (values here are >= 0) — matches
    DuckDB's round() and the repo-wide *_micro convention."""
    return np.floor(np.asarray(v, np.float64) * 1_000_000 + 0.5).astype(np.int64)


def decode_features(media: DataFrame, n_segments: int = FEATURE_SEGMENTS) -> DataFrame:
    """payload -> segment-mean feature rows (media_id, kind, dim, value_micro).

    dim 0 is the global mean of the decoded byte tensor (pixels for
    image/video, samples for audio); dims 1..n_segments are means of equal
    contiguous segments — a tiny interpretable feature pyramid.  One input
    row fans out to n_segments+1 scalar rows, which keeps the output free
    of array columns (drivers/oracles canonicalize scalars only).

    Plan shape: metadata filters happen BEFORE this narrow mapInPandas, so
    payload bytes of filtered-out rows never cross to Python (column
    pruning keeps them in parquet).  Real decode would replace the
    ``_fake_bytes`` call only.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_kind, out_dim, out_val = [], [], [], []
            for r in pdf.itertuples(index=False):
                m = r.meta
                if DECODE_BACKEND == "real":
                    _require_real_backend(m["kind"])
                n_vals = _decode_n_vals(m)
                vals = _fake_bytes(bytes(r.payload), n_vals).astype(np.float64)
                s = n_vals // n_segments
                means = [vals.mean()] + [
                    vals[d * s : (d + 1) * s].mean() for d in range(n_segments)
                ]
                out_id.extend([r.media_id] * (n_segments + 1))
                out_kind.extend([m["kind"]] * (n_segments + 1))
                out_dim.extend(range(n_segments + 1))
                out_val.extend(_micro(np.array(means)).tolist())
            if out_id:
                yield pd.DataFrame(
                    {
                        "media_id": out_id,
                        "kind": out_kind,
                        "dim": np.asarray(out_dim, np.int32),
                        "value_micro": np.asarray(out_val, np.int64),
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
                px = _fake_bytes(bytes(r.payload), mh * mw * mc).reshape(mh, mw, mc)
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
        T.StructField("mean_micro", T.LongType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame sampling: emit one stat row per sampled frame (1-in-N
    uniform): (media_id, frame_idx, mean_micro).  One input row fans out to
    ceil(n_frames/every_n) rows — the classic video-expansion shape;
    partitioning stays by input splits.  Frame fi's decoded tensor is the
    md5 chain streamed at suffix ':f{fi}' (a real decoder would seek)."""
    vids = media.filter(F.col("meta.kind") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_fi, out_mean = [], [], []
            for r in pdf.itertuples(index=False):
                m = r.meta
                if DECODE_BACKEND == "real":
                    _require_real_backend("video")
                n_vals = _decode_n_vals(m)
                for fi in range(0, int(m["n_frames"]), every_n):
                    vals = _fake_bytes(bytes(r.payload), n_vals, stream=f":f{fi}")
                    out_id.append(r.media_id)
                    out_fi.append(fi)
                    out_mean.append(int(_micro(vals.astype(np.float64).mean())))
            if out_id:
                yield pd.DataFrame(
                    {
                        "media_id": out_id,
                        "frame_idx": np.asarray(out_fi, np.int32),
                        "mean_micro": np.asarray(out_mean, np.int64),
                    }
                )

    return vids.mapInPandas(run, schema=FRAME_SCHEMA)
