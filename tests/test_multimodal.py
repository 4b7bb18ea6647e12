"""Multimodal plumbing: schema, determinism, metadata-pruned decode paths.
The decode kernels are deterministic md5-chain fakes (no codec libs in this
env); the Spark-side shapes are real and the kernels have exact DuckDB twins
(checked here and by the driver's media_* oracle entries)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.multimodal import (  # noqa: E402
    FEATURE_SEGMENTS,
    decode_features,
    resize_image,
    sample_frames,
    synthetic_media,
)


def test_media_table_schema_and_determinism(spark):
    m1 = synthetic_media(spark, 60, seed=1).collect()
    m2 = synthetic_media(spark, 60, seed=1, partitions=3).collect()
    assert len(m1) == 60
    by_id1 = {r["media_id"]: r["payload_sha256"] for r in m1}
    by_id2 = {r["media_id"]: r["payload_sha256"] for r in m2}
    assert by_id1 == by_id2  # partitioning-independent payloads
    kinds = {r["meta"]["kind"] for r in m1}
    assert kinds == {"image", "audio", "video"}


def test_decode_features_all_kinds(spark):
    media = synthetic_media(spark, 30, seed=2)
    out = decode_features(media).collect()
    # one global-mean row + FEATURE_SEGMENTS segment rows per media item
    assert len(out) == 30 * (FEATURE_SEGMENTS + 1)
    per_media: dict[int, set[int]] = {}
    for r in out:
        per_media.setdefault(r["media_id"], set()).add(r["dim"])
        assert 0 <= r["value_micro"] <= 255_000_000
    assert all(dims == set(range(FEATURE_SEGMENTS + 1)) for dims in per_media.values())
    # deterministic across runs
    out2 = decode_features(synthetic_media(spark, 30, seed=2)).collect()
    a = {(r["media_id"], r["dim"]): r["value_micro"] for r in out}
    b = {(r["media_id"], r["dim"]): r["value_micro"] for r in out2}
    assert a == b


def test_media_duckdb_parity(spark):
    """The full Spark pipeline (synthetic media -> mapInPandas decode) must
    equal the pure-SQL twin that regenerates payloads and runs the md5-chain
    decode in DuckDB — the same check the driver harness performs."""
    import duckdb

    from sparksearch.entry_queries import ORACLE_SQL, SPARK_QUERIES

    for name, keycols in [
        ("media_decode_features", ("media_id", "dim")),
        ("media_frame_sample", ("media_id", "frame_idx")),
    ]:
        got = {
            tuple(r[k] for k in keycols): tuple(r)
            for r in SPARK_QUERIES[name](spark, "/root/testdata/sf0.001").collect()
        }
        want = {}
        cur = duckdb.connect().execute(ORACLE_SQL[name])
        cols = [d[0] for d in cur.description]
        for row in cur.fetchall():
            d = dict(zip(cols, row))
            want[tuple(d[k] for k in keycols)] = tuple(d[c] for c in cols)
        assert set(got) == set(want)
        for k in got:
            assert got[k] == want[k], (name, k, got[k], want[k])


def test_resize_image_only_images(spark):
    media = synthetic_media(spark, 30, seed=3)
    n_img = media.filter(F.col("meta.kind") == "image").count()
    out = resize_image(media, 8, 8)
    rows = out.collect()
    assert len(rows) == n_img
    assert all(r["out_width"] == 8 and r["out_height"] == 8 for r in rows)
    assert all(0 <= r["mean_px"] <= 255 for r in rows)


def test_sample_frames_fanout(spark):
    media = synthetic_media(spark, 30, seed=4)
    vids = {r["media_id"]: r["meta"]["n_frames"] for r in media.filter(
        F.col("meta.kind") == "video").collect()}
    out = sample_frames(media, every_n=8).collect()
    per_vid: dict[int, int] = {}
    for r in out:
        per_vid[r["media_id"]] = per_vid.get(r["media_id"], 0) + 1
    for mid, nf in vids.items():
        assert per_vid[mid] == len(range(0, nf, 8))


def test_real_backend_stub_raises(spark):
    import sparksearch.multimodal as mm

    media = synthetic_media(spark, 3, seed=5)
    mm.DECODE_BACKEND = "real"
    try:
        import pytest

        with pytest.raises(Exception, match="NotImplementedError|real image"):
            decode_features(media).collect()
    finally:
        mm.DECODE_BACKEND = "fake"
