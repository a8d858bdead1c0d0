"""Text normalizers — vectorized ports of the reference's
``kgtk/nomalizer.py`` (sic, /root/reference/kgtk/nomalizer.py:8-41):
whitespace collapse, punctuation -> space, lower-casing, and the
all-of-the-above ``normalize_text``.

Pure pandas str kernels inside ``map_batches`` — no Python row loops.
"""
from __future__ import annotations

import string

import pandas as pd
import ray.data

Dataset = ray.data.Dataset

_PUNCT_TABLE = str.maketrans({c: " " for c in string.punctuation})


def normalize_whitespace_series(s: pd.Series) -> pd.Series:
    return s.astype(str).str.replace(r"\s+", " ", regex=True).str.strip()


def normalize_punctuation_series(s: pd.Series) -> pd.Series:
    # str.translate per element is C-speed; escape-free equivalent of
    # the reference's punct_trans_table.
    return normalize_whitespace_series(s.astype(str).str.translate(_PUNCT_TABLE))


def normalize_text_series(s: pd.Series) -> pd.Series:
    return normalize_punctuation_series(s).str.lower()


def normalize_text(ds: Dataset, *, column: str = "text",
                   out_column: str = "text_norm",
                   mode: str = "text") -> Dataset:
    """Add a normalized copy of ``column``.

    mode: 'whitespace' | 'punctuation' | 'case' | 'text' (all).
    """
    fns = {
        "whitespace": normalize_whitespace_series,
        "punctuation": normalize_punctuation_series,
        "case": lambda s: s.astype(str).str.lower(),
        "text": normalize_text_series,
    }
    fn = fns[mode]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_column] = fn(df[column])
        return df

    return ds.map_batches(f, batch_format="pandas")
