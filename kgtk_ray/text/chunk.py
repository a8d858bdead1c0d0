"""Text chunking for embedding / RAG preparation: split each document
into fixed-size character windows with overlap, one output row per
chunk.  Row-expanding ``map_batches`` (a flat-map): no shuffle, no
driver state; the expansion factor is bounded by
``ceil(len / (size - overlap))`` per document.

Chunk boundaries are pure character arithmetic so the DuckDB oracle
reproduces them with ``substr`` + ``generate_series``.  The inner loop
runs over CHUNK SLOTS (≤ longest-doc chunks per batch), not rows —
each iteration is one vectorized ``str.slice`` over the rows that
still have a chunk at that slot.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def chunk_text(ds: Dataset, *, size: int = 512, overlap: int = 64,
               text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per (document, chunk): ``(id_col, chunk_id, chunk)``.

    Chunks start at character offsets ``0, stride, 2*stride, ...``
    (``stride = size - overlap``) while the offset is inside the text;
    each chunk is ``size`` characters (the last one shorter).  Empty
    documents produce no chunks.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        lens = s.str.len().to_numpy()
        n_chunks = np.where(lens > 0, (np.maximum(lens - 1, 0) // stride) + 1, 0)
        max_n = int(n_chunks.max()) if len(n_chunks) else 0
        ids, cids, chunks = [], [], []
        for j in range(max_n):
            has = n_chunks > j
            if not has.any():
                break
            piece = s[has].str.slice(j * stride, j * stride + size)
            ids.append(df.loc[has, id_col].to_numpy())
            cids.append(np.full(int(has.sum()), j, dtype=np.int64))
            chunks.append(piece.to_numpy())
        if not ids:
            return pd.DataFrame({id_col: pd.Series(dtype=df[id_col].dtype),
                                 "chunk_id": pd.Series(dtype="int64"),
                                 "chunk": pd.Series(dtype=str)})
        return pd.DataFrame({id_col: np.concatenate(ids),
                             "chunk_id": np.concatenate(cids),
                             "chunk": np.concatenate(chunks)})

    return ds.map_batches(f, batch_format="pandas")
