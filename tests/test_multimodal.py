"""Multimodal binary-column plumbing (schemas, batching, UDF signatures);
decode itself is a deterministic fake (no media libs in this container)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ts2g2_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rng = np.random.default_rng(77)
    rows = []
    for i in range(6):
        payload = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
        rows.append((f"img{i}", "image", payload, 32, 24, None, None))
    rows.append(("img_dup", "image", rows[0][2], 32, 24, None, None))
    rows.append(("vid0", "video",
                 bytes(rng.integers(0, 256, 256, dtype=np.uint8)),
                 8, 8, None, 25))
    rows.append(("aud0", "audio",
                 bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
                 None, None, 16000, None))
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_metadata_and_exact_dedup(spark, media):
    meta = mm.attach_metadata(media)
    r = {x.media_id: x for x in meta.collect()}
    assert r["img0"].n_bytes == 128
    assert r["img0"].content_hash == r["img_dup"].content_hash
    groups = mm.exact_media_dedup(media).collect()
    assert len(groups) == 1
    assert groups[0].members == ["img0", "img_dup"]


def test_extract_features_deterministic(spark, media):
    f1 = {r.media_id: r.feature
          for r in mm.extract_features(media, feat_dim=16).collect()}
    f2 = {r.media_id: r.feature
          for r in mm.extract_features(media, feat_dim=16).collect()}
    assert f1 == f2  # deterministic fake decode
    assert all(len(v) == 16 for v in f1.values())
    assert f1["img0"] == f1["img_dup"]  # same bytes -> same feature
    assert f1["img0"] != f1["img1"]


def test_extract_features_stub_marker(spark, media):
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, decoder=None)


def test_sample_frames(spark, media):
    frames = mm.sample_frames(media, every_n=10).collect()
    assert [f.frame_idx for f in frames] == [0, 10, 20]
    assert all(len(f.payload) == 64 for f in frames)  # 8x8 grid


def test_resize_images(spark, media):
    out = mm.resize_images(media, out_w=4, out_h=4)
    rows = out.collect()
    assert len(rows) == 7  # images only, video/audio filtered
    assert all(len(r.payload) == 16 for r in rows)
    # payload binary never enters the dedup shuffle: the Exchange operator
    # itself must not carry the payload column (children print BELOW it in
    # the plan string, so inspect the Exchange line only)
    plan = mm.exact_media_dedup(
        spark.createDataFrame([], mm.MEDIA_SCHEMA))._jdf \
        .queryExecution().executedPlan().toString()
    exchange_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchange_lines
    assert all("payload" not in ln for ln in exchange_lines)


def test_custom_decoder(spark, media):
    def dec(payload, kind):
        return np.full((4, 4), len(payload), dtype=np.float32)

    f = {r.media_id: r.feature
         for r in mm.extract_features(media, feat_dim=4,
                                      decoder=dec).collect()}
    assert f["img0"] == [128.0, 128.0, 128.0, 128.0]
