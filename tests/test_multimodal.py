"""Multimodal plumbing: media-span explode, fetch, decode/feature stubs,
resize planning. Kernels are stubs (no codec libs in the container); the
Spark plumbing — schemas, Arrow batches, determinism — is real."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from axora_spark import schemas
from axora_spark.operators.multimodal import (extract_media_features,
                                              fetch_media, media_spans,
                                              resize_plan, synth_media_bytes,
                                              _decode_stub, _feature_stub)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "https://h/p1", [
            {"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": "https://cdn/x.png",
             "offset": 1},
            {"kind": "media", "text": "", "media_ref": "https://cdn/y.svg",
             "offset": 2},
        ], None),
        ("d2", "https://h/p2", [
            {"kind": "text", "text": "only text", "media_ref": "",
             "offset": 0},
        ], None),
    ]
    return spark.createDataFrame(rows, schemas.DOCUMENTS)


def test_media_spans_explode(spark, docs):
    m = media_spans(docs).collect()
    assert {(r.doc_id, r.media_ref) for r in m} == {
        ("d1", "https://cdn/x.png"), ("d1", "https://cdn/y.svg")}


def test_fetch_and_features_deterministic(spark, docs):
    feats = extract_media_features(fetch_media(media_spans(docs)))
    rows = {r.media_ref: r for r in feats.collect()}
    assert set(rows) == {"https://cdn/x.png", "https://cdn/y.svg"}
    r = rows["https://cdn/x.png"]
    assert r.content_type == "image/png"
    assert r.n_bytes == len(synth_media_bytes("https://cdn/x.png"))
    assert len(r.feature) == 64
    assert math.isclose(sum(x * x for x in r.feature), 1.0, rel_tol=1e-3)
    # run twice → identical (stub determinism)
    again = {q.media_ref: q for q in
             extract_media_features(fetch_media(media_spans(docs))).collect()}
    assert again["https://cdn/x.png"].feature == r.feature
    assert (again["https://cdn/x.png"].width, again["https://cdn/x.png"].height) \
        == (r.width, r.height)


def test_resize_plan(spark, docs):
    feats = extract_media_features(fetch_media(media_spans(docs)))
    plan = {r.media_ref: r for r in resize_plan(feats, max_side=256).collect()}
    for r in plan.values():
        assert max(r.target_width, r.target_height) <= 256
        # aspect ratio preserved within rounding
        assert abs(r.target_width / r.target_height
                   - r.width / r.height) < 0.05


def test_stub_contracts():
    with pytest.raises(NotImplementedError):
        _decode_stub(b"")
    w, h = _decode_stub(b"\x10\x20rest")
    assert w >= 64 and h >= 64
    v = _feature_stub(b"payload")
    assert v.shape == (64,)


def test_sample_frames_fanout(spark):
    from axora_spark.operators.multimodal import sample_frames
    rows = [("d1", "https://cdn/v.mp4", 0),
            ("d2", "https://cdn/x.png", 5)]
    media = spark.createDataFrame(
        rows, "doc_id string, media_ref string, offset int")
    fetched = fetch_media(media)
    frames = sample_frames(fetched, every_ms=500, max_frames=8).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # image → exactly one frame at ts 0
    assert len(by_doc["d2"]) == 1 and by_doc["d2"][0].ts_ms == 0
    # video → one frame per 500ms of stub duration, capped at 8
    v = sorted(by_doc["d1"], key=lambda r: r.frame_index)
    assert 1 <= len(v) <= 8
    assert [r.ts_ms for r in v] == [i * 500 for i in range(len(v))]
    # frames are deterministic non-empty bytes, distinct per timestamp
    blobs = [bytes(r.frame) for r in v]
    assert all(blobs) and len(set(blobs)) == len(blobs)
    # rerun is bit-identical (stub determinism)
    again = sample_frames(fetch_media(media), every_ms=500,
                          max_frames=8).collect()
    assert sorted((r.doc_id, r.frame_index, bytes(r.frame))
                  for r in again) == \
        sorted((r.doc_id, r.frame_index, bytes(r.frame)) for r in frames)


def test_sample_frames_cap(spark):
    from axora_spark.operators.multimodal import sample_frames
    media = spark.createDataFrame(
        [("d1", "https://cdn/v.mp4", 0)],
        "doc_id string, media_ref string, offset int")
    frames = sample_frames(fetch_media(media), every_ms=100,
                           max_frames=3).collect()
    assert len(frames) == 3  # stub duration ≥1000ms → cap binds


def test_sample_frames_malformed_video_degrades_per_row(spark):
    # a video payload too short to probe yields ZERO frames for that row
    # only; siblings in the same Arrow batch are unaffected
    from axora_spark.operators.multimodal import FRAME_SAMPLES, sample_frames
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    rows = [("bad", "https://cdn/broken.mp4", "video/mp4", b"x"),
            ("good", "https://cdn/ok.png", "image/png", b"0123")]
    fetched = spark.createDataFrame(rows, schema)
    out = sample_frames(fetched).collect()
    assert {r.doc_id for r in out} == {"good"}
