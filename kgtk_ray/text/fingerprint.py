"""Document fingerprinting.

* :func:`fingerprint` — md5 of the whitespace-normalized lowercased
  text (DuckDB-replicable: ``md5(lower(regexp_replace(text,'\\s+',' ','g')))``).
* :func:`winnowing_fingerprints` — rolling-hash winnowing (the MOSS
  scheme): k-gram rolling hashes, minimum per sliding window, emitted
  as (doc_id, position, hash) rows for plagiarism-style matching.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def _norm(s: pd.Series) -> pd.Series:
    return s.astype(str).str.replace(r"\s+", " ", regex=True).str.lower()


def fingerprint(ds: Dataset, *, text_col: str = "text",
                out_col: str = "fingerprint") -> Dataset:
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = [hashlib.md5(t.encode("utf-8")).hexdigest()
                       for t in _norm(df[text_col])]
        return df

    return ds.map_batches(f, batch_format="pandas")


def winnowing_fingerprints(ds: Dataset, *, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8,
                           window: int = 4) -> Dataset:
    """Emit (doc_id, pos, hash) winnowed fingerprints per document."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids, poss, hashes = [], [], []
        for did, t in zip(df[id_col].to_numpy(), _norm(df[text_col])):
            if len(t) < k:
                continue
            grams = np.asarray([t[i: i + k] for i in range(len(t) - k + 1)],
                               dtype=object)
            h = pd.util.hash_array(grams)
            n = len(h)
            if n < window:
                sel = np.array([int(np.argmin(h))])
            else:
                # sliding-window minima (vectorized via stride trick)
                idx = np.arange(n - window + 1)[:, None] + np.arange(window)
                wins = h[idx]
                sel = np.unique(idx[np.arange(len(idx)), wins.argmin(axis=1)])
            ids.extend([did] * len(sel))
            poss.extend(sel.tolist())
            hashes.extend(h[sel].tolist())
        return pd.DataFrame({id_col: ids, "pos": np.asarray(poss, dtype="int64"),
                             "hash": np.asarray(hashes, dtype="uint64")})

    return ds.map_batches(f, batch_format="pandas")
