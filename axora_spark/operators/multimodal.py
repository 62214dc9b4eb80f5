"""Multimodal span processing: decode / feature-extract / resize /
frame-sample plumbing over media spans.

Media payloads are opaque `binary` columns with typed metadata (the
engine's documents carry `media_ref` URLs; a fetch stage resolves them to
bytes). The image/audio/video codec libraries are NOT in this container,
so the decode kernels are deterministic stand-ins behind `_decode_stub`
(clearly marked); everything Spark-side — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested. Swapping in PIL/ffmpeg
changes only the stub body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), False),
])

MEDIA_FEATURES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])

_FEATURE_DIM = 64


def synth_media_bytes(media_ref: str) -> bytes:
    """Deterministic fake payload for a media_ref (fixture fetch)."""
    h = hashlib.sha256(media_ref.encode()).digest()
    return h * (1 + len(media_ref) % 7)


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB — stands in for an image decode (PIL/libvips not installed).
    Returns deterministic (width, height) from the payload header. A real
    deployment replaces this body with `PIL.Image.open(...).size`."""
    if not payload:
        raise NotImplementedError("empty media payload")
    w = 64 + payload[0] % 192 * 8
    h = 64 + payload[1] % 192 * 8
    return w, h


def _feature_stub(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """STUB — stands in for a vision-model feature extractor. Deterministic
    unit vector from the payload hash (same trick as the text hash
    embedding, operators/embed.py)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / max(float(np.linalg.norm(v)), 1e-9)


def media_spans(documents: DataFrame) -> DataFrame:
    """Explode the media spans of DOCUMENTS rows (native, no UDF)."""
    return (documents
            .select("doc_id", F.explode(
                F.filter("spans", lambda s: s["kind"] == "media")).alias("s"))
            .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                    F.col("s.offset").alias("offset")))


def fetch_media(media: DataFrame) -> DataFrame:
    """Resolve media_ref → binary payload (fixture: deterministic synth;
    production: HTTP fetch inside the same mapInPandas shape)."""
    out_schema = T.StructType(media.schema.fields + [
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [synth_media_bytes(r) for r in pdf["media_ref"]]
            pdf = pdf.assign(
                payload=payloads,
                content_type=[("image/png" if r.endswith(".png")
                               else "image/svg+xml" if r.endswith(".svg")
                               else "video/mp4" if r.endswith(".mp4")
                               else "application/octet-stream")
                              for r in pdf["media_ref"]],
                n_bytes=[len(p) for p in payloads])
            yield pdf

    return media.mapInPandas(run, schema=out_schema)


def extract_media_features(fetched_media: DataFrame,
                           dim: int = _FEATURE_DIM) -> DataFrame:
    """Decode + feature-extract per media item, Arrow-batched. Real
    plumbing, stubbed kernels (see module docstring)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims, feats = [], []
            for p in pdf["payload"]:
                # per-ROW degradation: one undecodable payload yields
                # null width/height/feature, never a task failure (the
                # same policy as fetch errors and sample_frames)
                try:
                    dims.append(_decode_stub(p))
                    feats.append(_feature_stub(bytes(p), dim).tolist())
                except NotImplementedError:
                    dims.append((None, None))
                    feats.append(None)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "content_type": pdf["content_type"],
                "n_bytes": pdf["n_bytes"],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "feature": feats,
            })

    return fetched_media.mapInPandas(run, schema=MEDIA_FEATURES)


FRAME_SAMPLES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("frame_index", T.IntegerType(), False),
    T.StructField("ts_ms", T.LongType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def _probe_stub(payload: bytes) -> int:
    """STUB — stands in for an ffprobe duration read. Deterministic
    duration_ms from the payload header; real deployment replaces the
    body with `ffmpeg.probe(...)['format']['duration']`."""
    if len(payload) < 3:
        raise NotImplementedError("payload too short to probe")
    return 1000 * (1 + payload[2] % 8)          # 1s .. 8s


def _frame_stub(payload: bytes, ts_ms: int) -> bytes:
    """STUB — stands in for a frame grab at ts_ms (no ffmpeg in this
    container). Deterministic bytes from (payload, ts)."""
    return hashlib.sha256(payload + ts_ms.to_bytes(8, "big")).digest()


def sample_frames(fetched_media: DataFrame, every_ms: int = 500,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp
    (0, every_ms, 2·every_ms, … < duration, capped at max_frames);
    non-video media pass through as a single frame at ts 0. The
    fan-OUT lives inside mapInPandas — each Arrow batch yields MORE
    rows than it consumed, which is the shape a real ffmpeg frame
    grabber needs (per-row explode would re-decode the container once
    per frame). Downstream feature extraction runs per frame with the
    same extract_media_features plumbing."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "media_ref", "frame_index", "ts_ms", "frame")}
            for doc_id, ref, ctype, payload in zip(
                    pdf["doc_id"], pdf["media_ref"],
                    pdf["content_type"], pdf["payload"]):
                payload = bytes(payload)
                if ctype is not None and ctype.startswith("video/"):
                    try:
                        duration = _probe_stub(payload)
                    except NotImplementedError:
                        # un-probe-able container: degrade PER ROW (zero
                        # frames), same policy as fetch errors — one
                        # malformed payload must never fail the task
                        continue
                    stamps: range | tuple = range(0, duration, every_ms)
                else:
                    stamps = (0,)
                for i, ts in enumerate(stamps):
                    if i >= max_frames:
                        break
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["frame_index"].append(i)
                    out["ts_ms"].append(ts)
                    out["frame"].append(_frame_stub(payload, ts))
            yield pd.DataFrame(out)

    return fetched_media.mapInPandas(run, schema=FRAME_SAMPLES)


def resize_plan(features: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure column algebra (the actual pixel resample
    would live in the decode stub): target dims preserving aspect ratio."""
    scale = F.least(F.lit(1.0),
                    F.lit(max_side) / F.greatest("width", "height"))
    return features.select(
        "doc_id", "media_ref", "width", "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"))
