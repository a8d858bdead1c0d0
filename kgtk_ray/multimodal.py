"""Multimodal (image/audio/video) column plumbing.

Media ride through the pipeline as opaque ``binary`` columns with typed
metadata; decode / feature-extraction are actor-pool ``map_batches``
stages.  The actual codec libraries (PIL/ffmpeg/torchaudio) are not in
this container, so the decoder is pluggable: the default
``DeterministicFakeDecoder`` derives a stable feature vector from the
payload bytes (so the plumbing — schema, batch sizing, actor
signature, output layout — is real and testable), and
``LibraryDecoder`` raises ``NotImplementedError`` with the dependency
it would use.

Batch sizing: media rows are large, so these stages default to small
``batch_size`` and ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas object dtype cleanly).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

Dataset = ray.data.Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),           # images/video; -1 unknown
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),     # audio/video; -1 unknown
])


class DeterministicFakeDecoder:
    """Stand-in decoder: maps payload bytes to a stable ``dim``-float
    feature vector (byte histogram, L2-normalized).  Real plumbing,
    fake pixels."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for buf in t["payload"].to_pylist():
            b = np.frombuffer(buf or b"\x00", dtype=np.uint8)
            hist = np.bincount(b % self.dim, minlength=self.dim).astype(np.float32)
            n = np.linalg.norm(hist)
            feats.append((hist / n if n else hist).tolist())
        return t.append_column(
            "features", pa.array(feats, pa.list_(pa.float32(), self.dim)))


class LibraryDecoder:
    """The stage a real deployment would use; requires PIL/ffmpeg."""

    def __init__(self, kind: str = "image"):
        self.kind = kind
        raise NotImplementedError(
            "media decoding needs PIL (image) / ffmpeg (audio, video), "
            "which are not installed in this environment; use "
            "DeterministicFakeDecoder for plumbing tests")


def decode_features(media: Dataset, *, decoder=DeterministicFakeDecoder,
                    dim: int = 64, concurrency: int | tuple = 2,
                    batch_size: int = 64, num_cpus: float = 0.5) -> Dataset:
    """Actor-pool decode stage: small batches (large payloads), Arrow
    batches end-to-end, decoder state built once per actor."""
    return media.map_batches(
        decoder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def synthesize_media(n: int = 64, *, kind: str = "image", seed: int = 42) -> Dataset:
    """Deterministic fake media table for tests/bench (seeded payloads)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    t = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kind] * n),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array([-1] * n, pa.int32()),
        "height": pa.array([-1] * n, pa.int32()),
        "duration_ms": pa.array([-1] * n, pa.int32()),
    })
    return ray.data.from_arrow(t)
