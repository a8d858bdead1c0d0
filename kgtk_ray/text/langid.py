"""Heuristic language identification.

Deterministic stopword-count heuristic, chosen so the DuckDB oracle can
replicate it exactly with string arithmetic: score(lang) = number of
occurrences of each of the language's marker words as whole tokens in
the lowercased text; argmax wins, ties broken by the fixed language
order below.  Replaces fasttext-style models that aren't in this
container; the Ray plumbing (vectorized batch stage) is the real thing.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset

# fixed order = tie-break priority
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of"]),
    ("de", ["der", "und", "die"]),
    ("fr", ["le", "et", "les"]),
    ("es", ["el", "y", "los"]),
    ("zh", ["de5", "shi4", "le5"]),  # pinyin-ish markers for the synthetic corpus
]


def _count_word(s: pd.Series, w: str) -> np.ndarray:
    # whole-token occurrences in lowercased text, via padded containment:
    # count of " w " in " " + text + " " with punctuation collapsed to spaces
    return s.str.count(rf"(?<![A-Za-z0-9]){re.escape(w)}(?![A-Za-z0-9])").to_numpy()


def langid(ds: Dataset, *, text_col: str = "text",
           out_col: str = "lang_pred") -> Dataset:
    """Add ``out_col`` with the predicted language code ("und" when no
    marker occurs)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        low = df[text_col].astype(str).str.lower()
        scores = np.zeros((len(df), len(LANG_MARKERS)), dtype=np.int64)
        for j, (_, words) in enumerate(LANG_MARKERS):
            for w in words:
                scores[:, j] += _count_word(low, w)
        best = scores.argmax(axis=1)
        none = scores.max(axis=1) == 0
        langs = np.array([code for code, _ in LANG_MARKERS], dtype=object)
        pred = langs[best]
        pred[none] = "und"
        df = df.copy()
        df[out_col] = pred
        return df

    return ds.map_batches(f, batch_format="pandas")
