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


def fake_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media:{i}".encode()).digest() * (4 + i % 7)
        rows.append((f"https://m.example/{i}", kind, bytearray(payload), 64 + i, 48 + i, 1000 * (i % 30)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
