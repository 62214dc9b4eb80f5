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
