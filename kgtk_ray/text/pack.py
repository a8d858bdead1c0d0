"""Sequence packing for LLM training: assign documents to fixed
token-budget training sequences (greedy concatenation, the standard
"pack until the next doc would overflow" rule) so short documents
share a sequence instead of wasting pad tokens.

Deterministic distributed shape: each document hashes to one of
``n_bins`` packing bins (the Knuth multiplicative id hash shared with
:mod:`kgtk_ray.ops.sample` — reproducible across runs, block orders
and cluster sizes, and computable in SQL so the oracle can replay the
exact packing).  Within a bin, documents are packed in ascending-id
order.  Bins are independent, so packing parallelism = ``n_bins`` and
no global order is ever needed; at scale, grow ``n_bins`` with the
corpus.

Packing rule per bin (ids ascending): a document joins the current
sequence unless adding it would exceed ``max_tokens`` AND the sequence
is non-empty; then a new sequence starts.  A document longer than
``max_tokens`` therefore always sits alone in its own sequence
(callers chunk oversized docs first — see
:func:`kgtk_ray.text.chunk_text`).

The greedy scan is inherently sequential per bin (each decision
depends on the running total), so the per-bin kernel is a numpy loop
over pre-computed int64 arrays — O(1) integer work per row, dwarfed by
the upstream tokenization; everything batch-level stays vectorized.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def _greedy_pack(n_tokens: np.ndarray, max_tokens: int) -> np.ndarray:
    """Sequence index per doc (docs already in packing order)."""
    seq = np.empty(len(n_tokens), dtype=np.int64)
    cur, acc = 0, 0
    for i, n in enumerate(n_tokens):
        if acc > 0 and acc + n > max_tokens:
            cur += 1
            acc = 0
        acc += int(n)
        seq[i] = cur
    return seq


def pack_sequences(ds: Dataset, *, max_tokens: int = 1024,
                   text_col: str = "text", id_col: str = "doc_id",
                   count_col: str | None = None,
                   n_bins: int = 64) -> Dataset:
    """Returns ``(id_col, n_tokens, bin, seq)``: every document with
    its token count, packing bin, and the sequence index it was packed
    into within that bin.  ``(bin, seq)`` identifies a training
    sequence; group on it to emit packed examples.

    Token counts come from ``count_col`` if given, else from the
    BPE-ish regex tokenizer (:data:`kgtk_ray.text.tokens.BPEISH`) over
    ``text_col``.
    """
    from ..ops._bucket import bucketed_group_apply
    from ..ops.sample import _id_hash
    from .tokens import BPEISH

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        if count_col is not None:
            n = df[count_col].astype("int64")
        else:
            n = df[text_col].astype(str).str.count(BPEISH).astype("int64")
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": n.to_numpy(),
            "bin": (_id_hash(df[id_col].to_numpy())
                    % np.uint64(n_bins)).astype("int64"),
        })

    prepped = ds.map_batches(prep, batch_format="pandas")

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b, sub in df.groupby("bin", sort=False):
            sub = sub.sort_values(id_col, kind="mergesort")
            frames.append(pd.DataFrame({
                id_col: sub[id_col].to_numpy(),
                "n_tokens": sub["n_tokens"].to_numpy(),
                "bin": np.int64(b),
                "seq": _greedy_pack(sub["n_tokens"].to_numpy(), max_tokens),
            }))
        if not frames:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "bin": pd.Series(dtype="int64"),
                                 "seq": pd.Series(dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    return bucketed_group_apply(prepped, ["bin"], pack,
                                num_buckets=min(n_bins, 64))
