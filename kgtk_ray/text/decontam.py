"""Benchmark decontamination: drop (or mark) corpus documents that
share any word ``k``-gram with an evaluation set — the standard
guard against test-set leakage into training data.

Distributed shape: the eval side is benchmark-sized (thousands of
documents, not the corpus), so its distinct gram hashes are collected
once, sorted, and broadcast via ``ray.put``; the corpus side is a
single stateless ``map_batches`` doing a vectorized ``searchsorted``
membership test per batch — zero shuffles, corpus never materializes.
The gram-hash set is the same 64-bit hash used by
:mod:`kgtk_ray.text.repetition` (an equality proxy; the DuckDB oracle
joins the gram strings themselves).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .repetition import _gram_hash, _token_series

Dataset = ray.data.Dataset


def _doc_gram_hashes(df: pd.DataFrame, text_col: str, id_col: str,
                     k: int) -> pd.DataFrame:
    toks = _token_series(df[text_col].astype(str))
    ex = toks.explode().dropna()
    parts = [ex]
    for i in range(1, k):
        parts.append(ex.groupby(level=0).shift(-i))
    gram = parts[0].str.cat(parts[1:], sep=" ").dropna()
    return pd.DataFrame({id_col: df[id_col].reindex(gram.index).to_numpy(),
                         "gram_h": _gram_hash(gram)})


def decontaminate(corpus: Dataset, eval_ds: Dataset, *, k: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  mode: str = "remove") -> Dataset:
    """Remove (``mode='remove'``) or flag (``mode='mark'``, adds a
    boolean ``contaminated`` column) corpus documents sharing at least
    one word ``k``-gram with ``eval_ds``.

    ``eval_ds`` must be benchmark-scale: its distinct gram hashes are
    driver-collected and broadcast (8 bytes per distinct gram).  The
    corpus side streams.
    """
    if mode not in ("remove", "mark"):
        raise ValueError(f"mode must be 'remove' or 'mark', got {mode!r}")

    ev = eval_ds.map_batches(
        lambda df: _doc_gram_hashes(df, text_col, id_col, k)[["gram_h"]]
        .drop_duplicates(),
        batch_format="pandas").to_pandas()
    # an eval set with no k-grams at all yields schema-less empty blocks
    if "gram_h" not in ev.columns:
        ev = pd.DataFrame({"gram_h": pd.Series(dtype="uint64")})
    eval_hashes = np.sort(ev["gram_h"].unique().astype(np.uint64))
    ref = ray.put(eval_hashes)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ev_h = ray.get(ref)
        grams = _doc_gram_hashes(df, text_col, id_col, k)
        if len(grams) and len(ev_h):
            pos = np.searchsorted(ev_h, grams["gram_h"].to_numpy())
            pos = np.minimum(pos, len(ev_h) - 1)
            hit = ev_h[pos] == grams["gram_h"].to_numpy()
            bad_ids = set(grams.loc[hit, id_col].tolist())
        else:
            bad_ids = set()
        contaminated = df[id_col].isin(bad_ids)
        if mode == "mark":
            df = df.copy()
            df["contaminated"] = contaminated.to_numpy()
            return df
        return df.loc[~contaminated]

    return corpus.map_batches(f, batch_format="pandas")
