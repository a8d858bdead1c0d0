"""Token counting: whitespace tokens and a BPE-ish regex token count
(the GPT-2 pre-tokenizer word/number/punct split, approximated with a
deterministic regex DuckDB can also run)."""
from __future__ import annotations

import pandas as pd
import ray.data

Dataset = ray.data.Dataset

# words | numbers | non-space punctuation runs
BPEISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_counts(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """Add ``ws_tokens`` (whitespace) and ``bpe_tokens`` (regex) counts."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        df = df.copy()
        df["ws_tokens"] = s.str.count(r"\S+").astype("int64")
        df["bpe_tokens"] = s.str.count(BPEISH).astype("int64")
        return df

    return ds.map_batches(f, batch_format="pandas")
