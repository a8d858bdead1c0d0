"""Unigram language-model quality scoring (the CCNet-style "LM
filter" shape, with a self-contained word-unigram model instead of an
external KenLM binary: no model artifacts exist in this environment,
and the unigram variant keeps the oracle SQL-expressible).

Two-phase distributed shape:

1. **train** — reference-side token counts via the combiner-first
   :func:`grouped_aggregate`; the resulting vocabulary is collected to
   the driver **bounded by ``max_vocab``** (most-frequent tokens,
   deterministic (count desc, token) tie-break) and broadcast once via
   ``ray.put``.  A webtext vocabulary is millions of types where the
   corpus is billions of tokens, so the bound is the scale guard.
2. **score** — one stateless ``map_batches`` over the corpus: tokens
   exploded once, add-half smoothed log-probabilities looked up with a
   vectorized pandas map, per-document mean by a groupby.

``score = mean over doc tokens of ln((count(tok) + 0.5) / (N + 0.5 V))``
with ``N`` total reference tokens and ``V`` distinct reference types
(out-of-vocabulary tokens count 0).  Higher is closer to the reference
distribution.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .repetition import _token_series

Dataset = ray.data.Dataset


def unigram_logprob(corpus: Dataset, reference: Dataset, *,
                    text_col: str = "text", id_col: str = "doc_id",
                    max_vocab: int = 1_000_000,
                    num_buckets: int = 32) -> Dataset:
    """Score each corpus document by its mean smoothed unigram
    log-probability under the reference token distribution.  Returns
    ``(id_col, n_tokens, lm_score)``; documents with no tokens are
    dropped (their mean is undefined)."""
    from ..ops.agg import grouped_aggregate
    from ..ops._bucket import MIN_BUNDLE_ROWS

    def to_tokens(df: pd.DataFrame) -> pd.DataFrame:
        ex = _token_series(df[text_col].astype(str)).explode().dropna()
        return pd.DataFrame({"tok": ex.to_numpy()})

    counts = grouped_aggregate(
        reference.map_batches(to_tokens, batch_format="pandas",
                              batch_size=MIN_BUNDLE_ROWS),
        ["tok"], {"c": (None, "count")}, num_buckets=num_buckets).to_pandas()
    if "c" not in counts.columns or not len(counts):
        # token-less reference corpus (an empty aggregate also loses
        # its schema): the smoothed model is undefined, so no document
        # gets a score — mirror the "documents with no tokens are
        # dropped" rule at the model level
        return corpus.map_batches(
            lambda df: pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "lm_score": pd.Series([], dtype="float64")}),
            batch_format="pandas")
    if len(counts) > max_vocab:
        counts = counts.sort_values(["c", "tok"],
                                    ascending=[False, True]).head(max_vocab)
    n_total = int(counts["c"].sum())
    v = len(counts)
    model = ray.put(dict(zip(counts["tok"], counts["c"].astype("int64"))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model)
        toks = _token_series(df[text_col].astype(str))
        ex = toks.explode().dropna()
        c = ex.map(m).fillna(0).to_numpy(dtype=np.float64)
        logp = np.log((c + 0.5) / (n_total + 0.5 * v))
        per_doc = pd.Series(logp, index=ex.index).groupby(level=0).agg(
            ["mean", "size"])
        keep = df.index.intersection(per_doc.index)
        return pd.DataFrame({
            id_col: df.loc[keep, id_col].to_numpy(),
            "n_tokens": per_doc.loc[keep, "size"].astype("int64").to_numpy(),
            "lm_score": per_doc.loc[keep, "mean"].to_numpy(),
        })

    return corpus.map_batches(score, batch_format="pandas",
                              batch_size=MIN_BUNDLE_ROWS)
