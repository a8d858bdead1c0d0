"""Word n-gram Jaccard near-duplicate detection.

Each document is re-texted as its ``\\x00``-joined word-n-gram stream
and pushed through the MinHash-LSH + verify pipeline.  Precision note:
the verify step computes Jaccard over CHARACTER shingles of that
stream (window ``max(8, 4n)``), which tracks — but is not identical
to — Jaccard over the n-gram SETS themselves: shared grams produce
shared character windows, so similarity ordering is preserved, but the
threshold acts on the shingle measure.  Deterministic, fixture-pinned
behavior (scripts/make_fixtures.py implements the same measure
independently).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .minhash import minhash_dedup

Dataset = ray.data.Dataset


def _word_ngrams(text: str, n: int) -> str:
    toks = text.lower().split()
    if len(toks) < n:
        return text.lower()
    return "\x00".join(" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1))


def ngram_jaccard_dedup(ds: Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8, num_perm: int = 128,
                        bands: int = 32, seed: int = 42) -> Dataset:
    """Returns ``(doc_id, cluster)`` clustering docs whose word-``n``-gram
    Jaccard >= threshold.  Implemented by re-texting each doc as its
    n-gram stream and running the minhash-LSH + exact-verify pipeline
    with shingle size = 1 n-gram."""
    def to_ngrams(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            text_col: [_word_ngrams(t, n) for t in df[text_col].astype(str)],
        })

    # shingle_k here operates on the \x00-joined n-gram stream; using the
    # full gram strings as shingles via splitting is handled by minhash's
    # character shingles of the joined stream — k chosen to span a gram.
    ng = ds.map_batches(to_ngrams, batch_format="pandas")
    return minhash_dedup(ng, text_col=text_col, id_col=id_col,
                         num_perm=num_perm, bands=bands,
                         shingle_k=max(8, 4 * n), threshold=threshold,
                         seed=seed)
