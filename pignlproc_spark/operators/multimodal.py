"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data-pipeline requirement: treat image/audio/video as opaque
``binary`` columns; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages. The image/audio codec
libraries are NOT in this container, so the decode step is STUBBED
(clearly marked) behind :func:`decode_payload`: tests exercise the
real Spark plumbing — schema, partitioning, UDF signature, batch
shape — against :func:`fake_decode` (deterministic md5-derived
pseudo-features).

Scale notes: payload bytes stay columnar end-to-end (Parquet binary →
Arrow buffer → pandas bytes); featurization is embarrassingly
parallel (no shuffle); ``repartition`` before the stage controls task
granularity when payloads are large and row counts small.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "url string, kind string, payload binary, width int, height int, duration_ms int"
FEATURE_SCHEMA = (
    "url string, kind string, n_bytes bigint, sha1 string, "
    "feature array<float>, frames_sampled int"
)

FEATURE_DIM = 8


def decode_payload(payload: bytes, kind: str):
    """REAL media decode — NOT AVAILABLE in this container (no PIL /
    ffmpeg / torchaudio). On a production cluster, swap this for the
    actual decoder; everything downstream is format-agnostic."""
    raise NotImplementedError(
        "media decoding requires image/audio libs not present in this environment; "
        "use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, kind: str) -> tuple[list[float], int]:
    """Deterministic stand-in: md5-derived pseudo-feature vector +
    pseudo frame count. Same input bytes ⇒ same features, any
    partitioning/parallelism."""
    if payload is None:
        payload = b""
    d = hashlib.md5(kind.encode() + b":" + payload).digest()
    feats = [round(b / 255.0, 6) for b in d[:FEATURE_DIM]]
    frames = 1 + d[FEATURE_DIM] % 16
    return feats, frames


def extract_media_features(media: DataFrame, decoder=fake_decode) -> DataFrame:
    """media(url, kind, payload, ...) → per-item features via
    mapInPandas (Arrow batches; decoder called once per row inside the
    batch loop — amortized setup belongs in the iterator prologue)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task setup (codec init in the real decoder) goes here
        for pdf in batches:
            feats, frames, shas, nbytes = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                f, fr = decoder(payload, kind)
                feats.append(f)
                frames.append(fr)
                shas.append(hashlib.sha1(payload or b"").hexdigest())
                nbytes.append(len(payload or b""))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "sha1": shas,
                    "feature": feats,
                    "frames_sampled": frames,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "url string, kind string, payload binary, width int, height int"
FRAMES_SCHEMA = "url string, frame_idx int, frame binary, ts_ms int"


def fake_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic stand-in for image resize: real impl would decode
    → resample → re-encode; the fake keeps a size-proportional,
    content-derived payload so downstream schema/partition tests are
    meaningful."""
    base = hashlib.md5(payload or b"").digest()
    need = max(1, (target_w * target_h) // 64)
    return (base * (need // len(base) + 1))[:need]


def resize_images(media: DataFrame, target_w: int = 64, target_h: int = 64, resizer=fake_resize) -> DataFrame:
    """Image resize stage via mapInPandas — payload-in, payload-out,
    metadata updated; only 'image' rows transform, others pass with
    untouched payloads filtered out upstream by the caller."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["kind"] == "image"].copy()
            out["payload"] = [resizer(p, target_w, target_h) for p in out["payload"]]
            out["width"] = target_w
            out["height"] = target_h
            yield out[["url", "kind", "payload", "width", "height"]]

    return media.mapInPandas(gen, schema=RESIZE_SCHEMA)


def fake_frame_iter(payload: bytes, every_ms: int):
    """Deterministic stand-in for video frame sampling: yields
    (frame_idx, frame_bytes, ts_ms) pseudo-frames derived from the
    payload; a real impl wraps pyav/ffmpeg seek+decode."""
    d = hashlib.md5(payload or b"").digest()
    n = 1 + d[0] % 8
    for i in range(n):
        yield i, hashlib.md5(d + bytes([i])).digest(), i * every_ms


def sample_frames(media: DataFrame, every_ms: int = 1000, framer=fake_frame_iter) -> DataFrame:
    """Frame sampling = per-item fan-out: mapInPandas emitting multiple
    rows per input (the UDTF shape; batch boundaries preserved so a
    giant video never materializes all frames at once when the real
    decoder streams)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "frame_idx": [], "frame": [], "ts_ms": []}
            for url, kind, payload in zip(pdf["url"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                for idx, frame, ts in framer(payload, every_ms):
                    rows["url"].append(url)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(frame)
                    rows["ts_ms"].append(ts)
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, schema=FRAMES_SCHEMA)


def fake_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media:{i}".encode()).digest() * (4 + i % 7)
        rows.append((f"https://m.example/{i}", kind, bytearray(payload), 64 + i, 48 + i, 1000 * (i % 30)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
