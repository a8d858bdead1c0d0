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
        # one segment-bincount over the concatenated payload bytes —
        # no per-row Python in the decode loop
        bufs = [(b or b"\x00") for b in t["payload"].to_pylist()]
        lens = np.fromiter((len(b) for b in bufs), dtype=np.int64,
                           count=len(bufs))
        seg = np.repeat(np.arange(len(bufs), dtype=np.int64), lens)
        flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        hist = np.bincount(seg * self.dim + flat % self.dim,
                           minlength=len(bufs) * self.dim) \
            .reshape(len(bufs), self.dim).astype(np.float32)
        norms = np.linalg.norm(hist, axis=1, keepdims=True)
        np.divide(hist, norms, out=hist, where=norms > 0)
        return t.append_column(
            "features", pa.array(hist.tolist(),
                                 pa.list_(pa.float32(), self.dim)))


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


class DeterministicFakeResizer:
    """Stand-in resize: re-derives a payload of exactly
    ``width*height`` bytes by tiling/truncating the source bytes and
    updates the size metadata — the real plumbing (schema rewrite,
    payload replacement, actor state) without PIL."""

    def __init__(self, width: int = 32, height: int = 32):
        self.w, self.h = int(width), int(height)

    def __call__(self, t: pa.Table) -> pa.Table:
        size = self.w * self.h
        out = []
        for buf in t["payload"].to_pylist():
            b = buf or b"\x00"
            reps = -(-size // len(b))
            out.append((b * reps)[:size])
        cols = {name: t[name] for name in t.column_names}
        cols["payload"] = pa.array(out, pa.large_binary())
        cols["width"] = pa.array([self.w] * t.num_rows, pa.int32())
        cols["height"] = pa.array([self.h] * t.num_rows, pa.int32())
        return pa.table(cols)


def resize_media(media: Dataset, *, width: int = 32, height: int = 32,
                 resizer=DeterministicFakeResizer,
                 concurrency: int | tuple = 2, batch_size: int = 64,
                 num_cpus: float = 0.5) -> Dataset:
    """Actor-pool resize stage (PIL-backed in a real deployment; the
    deterministic fake keeps the plumbing testable here)."""
    return media.map_batches(
        resizer, fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)


def sample_frames(media: Dataset, *, num_frames: int = 4,
                  batch_size: int = 32) -> Dataset:
    """Frame sampling: one input media row fans out to ``num_frames``
    rows ``(media_id, frame_idx, ts_ms, payload)``.  The fake
    "decoder" treats the payload as the timeline and slices it into
    contiguous windows (ffmpeg would seek+decode in a real deployment);
    ``ts_ms`` is the frame's offset on the declared duration (payload
    length when duration is unknown).  Small batches: the fan-out
    multiplies large binary rows."""
    k = int(num_frames)

    def frames(t: pa.Table) -> pa.Table:
        ids, idxs, tss, outs = [], [], [], []
        for mid, buf, dur in zip(t["media_id"].to_pylist(),
                                 t["payload"].to_pylist(),
                                 t["duration_ms"].to_pylist()):
            b = buf or b"\x00"
            n = len(b)
            base = dur if dur and dur > 0 else n
            for i in range(k):
                lo, hi = (n * i) // k, (n * (i + 1)) // k
                ids.append(mid)
                idxs.append(i)
                tss.append((base * i) // k)
                outs.append(b[lo:max(hi, lo + 1)])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "ts_ms": pa.array(tss, pa.int64()),
            "payload": pa.array(outs, pa.large_binary()),
        })

    return media.map_batches(frames, batch_format="pyarrow",
                             batch_size=batch_size)


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
