"""Document quality scoring (length / punctuation / stopword ratios).

All measures are deterministic string arithmetic so the DuckDB oracle
can reproduce them: n_chars, n_tokens (whitespace split), mean token
length, punctuation ratio, stopword ratio, and a composite
``quality`` in [0,1].

Arrow-native kernel (round 5): every string measure is a
``pyarrow.compute`` (RE2) kernel over the zero-copy ``large_string``
column; only the final scalar ratio arithmetic runs in numpy (cheap,
numeric).  Whole-token stopword counting uses the same
three-space-separator trick as :mod:`.langid`.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .langid import _padded_tokens

Dataset = ray.data.Dataset

STOPWORDS = ["the", "a", "and", "of", "to"]


def quality_score(ds: Dataset, *, text_col: str = "text") -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(t[text_col], pa.large_string()), "")
        n_chars = pc.utf8_length(s).to_numpy().astype(np.int64)
        n_tokens = pc.count_substring_regex(
            s, r"\S+").to_numpy().astype(np.int64)
        n_punct = pc.count_substring_regex(
            s, r"[^\w\s]").to_numpy().astype(np.int64)
        padded = _padded_tokens(s)
        n_stop = np.zeros(t.num_rows, dtype=np.int64)
        for w in STOPWORDS:
            n_stop += pc.count_substring(
                padded, f" {w} ").to_numpy().astype(np.int64)
        tok = np.maximum(n_tokens, 1)
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        stop_ratio = n_stop / tok
        # composite: long enough, not punctuation soup, some stopwords
        quality = (
            np.clip(n_tokens / 100.0, 0, 1) * 0.4
            + np.clip(1.0 - 5.0 * punct_ratio, 0, 1) * 0.3
            + np.clip(5.0 * stop_ratio, 0, 1) * 0.3
        )
        for name in ("n_tokens", "punct_ratio", "stop_ratio", "quality"):
            if name in t.column_names:
                t = t.drop_columns([name])
        return (t.replace_schema_metadata(None)
                 .append_column("n_tokens", pa.array(n_tokens))
                 .append_column("punct_ratio", pa.array(punct_ratio))
                 .append_column("stop_ratio", pa.array(stop_ratio))
                 .append_column("quality", pa.array(quality)))

    return ds.map_batches(f, batch_format="pyarrow")
