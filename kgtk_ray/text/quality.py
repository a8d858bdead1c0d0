"""Document quality scoring (length / punctuation / stopword ratios).

All measures are deterministic string arithmetic so the DuckDB oracle
can reproduce them: n_chars, n_tokens (whitespace split), mean token
length, punctuation ratio, stopword ratio, and a composite
``quality`` in [0,1].
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset

STOPWORDS = ["the", "a", "and", "of", "to"]


def quality_score(ds: Dataset, *, text_col: str = "text") -> Dataset:
    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        n_chars = s.str.len().to_numpy()
        n_tokens = s.str.count(r"\S+").to_numpy()
        n_punct = s.str.count(r"[^\w\s]").to_numpy()
        low = s.str.lower()
        n_stop = np.zeros(len(s), dtype=np.int64)
        for w in STOPWORDS:
            n_stop += low.str.count(
                rf"(?<![A-Za-z0-9]){w}(?![A-Za-z0-9])").to_numpy()
        tok = np.maximum(n_tokens, 1)
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        stop_ratio = n_stop / tok
        mean_tok_len = (n_chars - (n_tokens - 1).clip(min=0)) / tok
        # composite: long enough, not punctuation soup, some stopwords
        quality = (
            np.clip(n_tokens / 100.0, 0, 1) * 0.4
            + np.clip(1.0 - 5.0 * punct_ratio, 0, 1) * 0.3
            + np.clip(5.0 * stop_ratio, 0, 1) * 0.3
        )
        df = df.copy()
        df["n_tokens"] = n_tokens.astype("int64")
        df["punct_ratio"] = punct_ratio
        df["stop_ratio"] = stop_ratio
        df["quality"] = quality
        return df

    return ds.map_batches(f, batch_format="pandas")
