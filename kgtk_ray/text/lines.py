"""C4-style line-level filtering (Raffel et al. 2020 §2.2 — the rules
that produced C4 from Common Crawl): keep only lines that look like
prose sentences, drop boilerplate lines, and drop whole pages that are
too short or carry template markers.  The reference repo has no
counterpart; rules follow the paper:

1. keep a line only if it ends in terminal punctuation (``.!?"`` after
   trailing whitespace),
2. keep a line only if it has at least ``min_words_per_line`` words
   (paper: 5),
3. drop any line containing the word "javascript" (word-boundary,
   case-insensitive),
4. drop the whole page when it contains any ``drop_page_patterns``
   literal (paper: "lorem ipsum" and "{"; a bad-words list can be
   passed the same way),
5. drop the whole page when fewer than ``min_lines_per_doc`` lines
   survive (paper: 3 sentences).

The surviving lines are re-joined with ``\\n`` in their original
order.  One stateless vectorized ``map_batches``: lines explode with
their document index, every rule is a C-regex/str mask, and the
re-join is a per-document group concat — no per-row Python, no
shuffle, no driver state.  Every rule is replicated exactly in the
driver's DuckDB oracle (``list_filter`` preserves line order).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset

_TERMINAL_RE = r'[.!?"]\s*$'
_JS_RE = r"\bjavascript\b"


def c4_line_filter(ds: Dataset, *, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words_per_line: int = 5,
                   min_lines_per_doc: int = 3,
                   drop_page_patterns: tuple = ("lorem ipsum", "{"),
                   ) -> Dataset:
    """Apply the C4 line/page rules; returns the input rows that
    survive with ``text_col`` rewritten to the kept lines."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        text = df[text_col].astype(str)
        low = text.str.lower()
        page_ok = np.ones(len(df), dtype=bool)
        for pat in drop_page_patterns:
            page_ok &= ~low.str.contains(pat.lower(), regex=False).to_numpy()
        sub = df[page_ok]
        if not len(sub):
            return sub
        ex = sub[text_col].astype(str).str.split("\n").explode()
        keep = (ex.str.contains(_TERMINAL_RE, regex=True)
                & (ex.str.split().str.len() >= min_words_per_line)
                & ~ex.str.lower().str.contains(_JS_RE, regex=True))
        kept = ex[keep.to_numpy(dtype=bool)]
        if kept.empty:
            return sub.iloc[0:0]
        joined = kept.groupby(level=0).agg("\n".join)
        counts = kept.groupby(level=0).size()
        ok = counts[counts >= min_lines_per_doc].index
        out = sub.loc[ok].copy()
        out[text_col] = joined.loc[ok].to_numpy()
        return out

    return ds.map_batches(f, batch_format="pandas")
