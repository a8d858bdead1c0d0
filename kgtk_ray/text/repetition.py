"""Repetition / quality-filter signals for web-scale training corpora.

Implements the repetition measures popularized by the Gopher corpus
filtering rules (Rae et al. 2021, "Scaling Language Models: Methods,
Analysis & Insights from Training Gopher", table A1) and the
cross-document duplicated-n-gram signal used by RefinedWeb-style
pipelines — re-expressed as vectorized Ray Data batch transforms:

* per-document signals (``repetition_signals``) are a single
  ``map_batches`` pass: tokens are exploded to a long frame once and
  every measure (distinct-token fraction, top-token fraction, top
  bigram fraction, mean token length) is a pandas groupby at C speed —
  no Python loop over rows, no shuffle;
* the corpus-global signal (``corpus_dup_ngram_frac``) shuffles
  64-bit n-gram *hashes*, never n-gram strings: distinct
  (doc, gram) pairs -> bucketed count of containing docs -> hash join
  back onto per-doc occurrences -> per-doc aggregate.  Every stage is
  bounded by the gram-hash key space, so it holds at 100 TB where a
  string shuffle would not.

All measures are deterministic string arithmetic mirrored 1:1 by the
DuckDB oracle SQL in ``__ray_entry__.oracle_sql()``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def _token_series(s: pd.Series) -> pd.Series:
    """Whitespace tokens per row (list-valued), matching
    ``string_split_regex(trim(text), '\\s+')`` on non-empty text."""
    return s.astype(str).str.split()


def repetition_signals(ds: Dataset, *, text_col: str = "text",
                       id_col: str = "doc_id") -> Dataset:
    """Per-document repetition measures.

    Returns ``(id_col, n_tokens, dup_word_frac, top_word_frac,
    top_bigram_frac, mean_word_len)``:

    * ``dup_word_frac``  — 1 - distinct tokens / tokens
    * ``top_word_frac``  — occurrences of the most frequent token / tokens
    * ``top_bigram_frac``— occurrences of the most frequent word bigram
      / bigrams (null when the document has < 2 tokens)
    * ``mean_word_len``  — non-whitespace characters / tokens
    """
    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        toks = _token_series(s)
        n_tokens = toks.str.len().to_numpy()
        n = np.maximum(n_tokens, 1)

        ex = toks.explode().dropna()
        cnt = ex.groupby([ex.index, ex]).size()
        top = cnt.groupby(level=0).max().reindex(df.index, fill_value=0)
        distinct = cnt.groupby(level=0).size().reindex(df.index, fill_value=0)

        nxt = ex.groupby(level=0).shift(-1)
        big = (ex + " " + nxt).dropna()
        bcnt = big.groupby([big.index, big]).size()
        btop = bcnt.groupby(level=0).max().reindex(df.index)
        n_big = big.groupby(level=0).size().reindex(df.index)

        nonspace = s.str.count(r"\S").to_numpy()
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": n_tokens.astype("int64"),
            "dup_word_frac": 1.0 - distinct.to_numpy() / n,
            "top_word_frac": top.to_numpy() / n,
            "top_bigram_frac": btop.to_numpy() / n_big.to_numpy(),
            "mean_word_len": nonspace / n,
        })
        return out

    return ds.map_batches(f, batch_format="pandas")


def gopher_filter(ds: Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_tokens: int = 20, max_tokens: int = 100_000,
                  min_mean_word_len: float = 3.0,
                  max_mean_word_len: float = 10.0,
                  max_dup_word_frac: float = 0.55,
                  max_top_word_frac: float = 0.15) -> Dataset:
    """Drop documents violating Gopher-style quality thresholds.

    Keeps the input columns of surviving documents (a streaming filter,
    not a projection): token count inside ``[min_tokens, max_tokens]``,
    mean word length inside ``[min_mean_word_len, max_mean_word_len]``,
    duplicate-token fraction at most ``max_dup_word_frac`` and
    top-token fraction at most ``max_top_word_frac``.
    """
    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        toks = _token_series(s)
        n_tokens = toks.str.len().to_numpy()
        n = np.maximum(n_tokens, 1)
        ex = toks.explode().dropna()
        cnt = ex.groupby([ex.index, ex]).size()
        top = cnt.groupby(level=0).max().reindex(df.index, fill_value=0)
        distinct = cnt.groupby(level=0).size().reindex(df.index, fill_value=0)
        mean_len = s.str.count(r"\S").to_numpy() / n
        dup_frac = 1.0 - distinct.to_numpy() / n
        top_frac = top.to_numpy() / n
        keep = ((n_tokens >= min_tokens) & (n_tokens <= max_tokens)
                & (mean_len >= min_mean_word_len)
                & (mean_len <= max_mean_word_len)
                & (dup_frac <= max_dup_word_frac)
                & (top_frac <= max_top_word_frac))
        return df.loc[keep]

    return ds.map_batches(f, batch_format="pandas")


def _gram_hash(grams: pd.Series) -> np.ndarray:
    """Stable 64-bit hash of n-gram strings (shuffle key; strings never
    leave the producing task)."""
    return pd.util.hash_pandas_object(grams, index=False).to_numpy()


def corpus_dup_ngram_frac(ds: Dataset, *, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 3,
                          min_docs: int = 2,
                          num_buckets: int = 64) -> Dataset:
    """Fraction of each document's word ``k``-grams that also occur in
    at least ``min_docs`` distinct documents corpus-wide.

    Distributed shape: one pass emits (doc, gram-hash) occurrences;
    distinct pairs (exact — each document's grams are produced inside
    a single task, so a per-batch drop_duplicates is global) feed a
    bucketed count of containing documents per gram; a bucketed hash
    join brings the counts back onto the occurrences; a grouped
    aggregate reduces to one row per document.  Only 8-byte hashes and
    doc ids cross the wire.

    Returns ``(id_col, n_grams, dup_gram_frac)`` for documents with at
    least ``k`` tokens.
    """
    from ..ops._bucket import bucketed_join, MIN_BUNDLE_ROWS
    from ..ops.agg import grouped_aggregate
    import pyarrow as pa

    def to_grams(df: pd.DataFrame) -> pd.DataFrame:
        toks = _token_series(df[text_col].astype(str))
        ex = toks.explode().dropna()
        parts = [ex]
        for i in range(1, k):
            parts.append(ex.groupby(level=0).shift(-i))
        gram = parts[0].str.cat(parts[1:], sep=" ").dropna()
        doc = df[id_col].reindex(gram.index).to_numpy()
        return pd.DataFrame({id_col: doc, "gram_h": _gram_hash(gram)})

    grams = ds.map_batches(to_grams, batch_format="pandas",
                           batch_size=MIN_BUNDLE_ROWS)

    pairs = grams.map_batches(
        lambda df: df.drop_duplicates([id_col, "gram_h"]),
        batch_format="pandas", batch_size=MIN_BUNDLE_ROWS)
    counts = grouped_aggregate(pairs, ["gram_h"],
                               {"ndocs": (id_col, "count")},
                               num_buckets=num_buckets)

    joined = bucketed_join(
        grams, counts, "gram_h",
        left_fields={id_col: pa.int64(), "gram_h": pa.uint64()},
        right_fields={"gram_h": pa.uint64(), "ndocs": pa.int64()},
        num_buckets=num_buckets)

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["is_dup"] = (df["ndocs"] >= min_docs).astype("int64")
        return df[[id_col, "is_dup"]]

    marked = joined.map_batches(mark, batch_format="pandas",
                                batch_size=MIN_BUNDLE_ROWS)
    per_doc = grouped_aggregate(marked, [id_col],
                                {"n_grams": (None, "count"),
                                 "n_dup": ("is_dup", "sum")},
                                num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, "n_grams"]].copy()
        out["dup_gram_frac"] = df["n_dup"] / df["n_grams"]
        return out

    return per_doc.map_batches(finish, batch_format="pandas")
