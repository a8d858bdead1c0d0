"""Model-based quality classification (the GPT-3 / CCNet / LLaMA
"Wikipedia-reference classifier" shape): train a logistic regression
over hashed unigram+bigram frequencies to separate a high-quality
reference corpus from raw web text, then score (and optionally
lottery-filter) every document.  The reference repo has no
counterpart; semantics follow the public pipeline descriptions
(GPT-3 appendix A, CCNet §3.3).

Distributed shape:

1. **sample** — each class is bounded to ``max_train_docs`` documents
   chosen by smallest ``(knuth_hash(id), id)`` (the same deterministic
   order all sampling ops here use), via a per-batch top-n combiner +
   global sort/limit; only those rows materialize on the driver.  A
   labeled training set is thousands of documents regardless of corpus
   size, so this is the honest 100 TB shape (fastText-style training
   is driver-scale; scoring is the distributed cost).
2. **train** — full-batch logistic regression with L2, fixed iteration
   count and zero init: every quantity is a deterministic function of
   the sampled features, so retraining on any cluster layout yields
   identical weights.  The gradient is accumulated sparsely over
   (doc, bucket) feature pairs (``np.add.at``) — no dense
   n_docs x num_buckets matrix is ever built.
3. **score** — weights broadcast once via ``ray.put``; one stateless
   vectorized ``map_batches`` computes ``sigmoid(w . x + b)`` per
   document over hashed feature frequencies.
4. **filter** — either a hard threshold or the GPT-3 lottery: keep a
   document iff ``u(id) < score ** alpha`` with ``u`` the Knuth-hash
   uniform of the id, reproducible across runs / blocks / cluster
   sizes.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..ops.sample import SALT_LOTTERY, _id_hash
from .dsir import _feature_buckets

Dataset = ray.data.Dataset


def _sample_texts(ds: Dataset, *, text_col: str, id_col: str,
                  n: int) -> pd.DataFrame:
    """The ``n`` rows with smallest (knuth_hash(id), id): per-batch
    top-n combiner, then one small sort/limit."""
    def topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, text_col]].copy()
        df["__h__"] = _id_hash(df[id_col].to_numpy())
        return df.sort_values(["__h__", id_col],
                              kind="mergesort").head(n)

    part = ds.map_batches(topn, batch_format="pandas")
    out = part.sort(["__h__", id_col]).limit(n).to_pandas()
    if out.empty:
        # Ray loses the schema of empty materialized datasets
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             text_col: pd.Series([], dtype=object)})
    return out.drop(columns="__h__")


def _featurize(texts: pd.Series, num_buckets: int, bigrams: bool):
    """(doc_positions, buckets, per-doc feature counts) with features
    weighted as within-document frequencies."""
    rows, b = _feature_buckets(texts.astype(str), num_buckets, bigrams)
    pos = pd.Index(texts.index)
    loc = pos.get_indexer(rows) if len(rows) else np.empty(0, np.int64)
    n = np.zeros(len(texts), dtype=np.int64)
    if len(loc):
        np.add.at(n, loc, 1)
    return loc, b, n


def train_quality_classifier(positive: Dataset, negative: Dataset, *,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             num_buckets: int = 10_000,
                             bigrams: bool = True,
                             max_train_docs: int = 5_000,
                             iters: int = 500, lr: float = 2.0,
                             l2: float = 1e-4) -> tuple[np.ndarray, float]:
    """Fit the logistic regression; returns ``(weights, bias)``.
    Deterministic: bounded hash-ordered samples, zero init, fixed
    iteration count."""
    pos = _sample_texts(positive, text_col=text_col, id_col=id_col,
                        n=max_train_docs)
    neg = _sample_texts(negative, text_col=text_col, id_col=id_col,
                        n=max_train_docs)
    texts = pd.concat([pos[text_col], neg[text_col]], ignore_index=True)
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    loc, b, n = _featurize(texts, num_buckets, bigrams)
    # frequency weighting: each feature contributes 1/len(doc)
    inv = np.zeros(len(texts))
    nz = n > 0
    inv[nz] = 1.0 / n[nz]
    fw = inv[loc]
    w = np.zeros(num_buckets)
    b0 = 0.0
    m = max(1, len(texts))
    for _ in range(iters):
        margin = np.zeros(len(texts))
        np.add.at(margin, loc, w[b] * fw)
        p = 1.0 / (1.0 + np.exp(-(margin + b0)))
        err = p - y
        grad = np.zeros(num_buckets)
        np.add.at(grad, b, err[loc] * fw)
        w -= lr * (grad / m + l2 * w)
        b0 -= lr * float(err.sum()) / m
    return w, b0


def quality_classifier_scores(corpus: Dataset, positive: Dataset,
                              negative: Dataset | None = None, *,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              num_buckets: int = 10_000,
                              bigrams: bool = True,
                              max_train_docs: int = 5_000,
                              iters: int = 500) -> Dataset:
    """Score every corpus document with the trained classifier
    (``negative`` defaults to the corpus itself, the GPT-3 setup).
    Returns ``(id_col, n_feats, clf_score)`` with ``clf_score`` in
    (0, 1), higher = more positive-like."""
    neg = corpus if negative is None else negative
    w, b0 = train_quality_classifier(
        positive, neg, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets, bigrams=bigrams,
        max_train_docs=max_train_docs, iters=iters)
    w_ref = ray.put(w.astype(np.float64))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        wv = ray.get(w_ref)
        loc, b, n = _featurize(df[text_col], num_buckets, bigrams)
        margin = np.zeros(len(df))
        if len(loc):
            inv = np.zeros(len(df))
            nz = n > 0
            inv[nz] = 1.0 / n[nz]
            np.add.at(margin, loc, wv[b] * inv[loc])
        p = 1.0 / (1.0 + np.exp(-(margin + b0)))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_feats": n, "clf_score": p})

    return corpus.map_batches(score, batch_format="pandas")


def classifier_filter(corpus: Dataset, positive: Dataset,
                      negative: Dataset | None = None, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      threshold: float | None = None,
                      lottery_alpha: float | None = 9.0,
                      num_buckets: int = 10_000,
                      max_train_docs: int = 5_000,
                      iters: int = 500) -> Dataset:
    """Keep target-like documents.  ``threshold`` keeps
    ``clf_score >= threshold``; otherwise the GPT-3 lottery keeps a
    document iff ``u(id) < clf_score ** lottery_alpha`` (most
    high-score docs survive, low-score docs survive occasionally —
    preserving tail diversity), with ``u`` deterministic in the id."""
    scored = quality_classifier_scores(
        corpus, positive, negative, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets, max_train_docs=max_train_docs,
        iters=iters)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if threshold is not None:
            return df[df["clf_score"].to_numpy() >= threshold]
        # salted stream: independent of the hash-ordered training
        # sampling above (see SALT_LOTTERY in ops/sample.py)
        u = (_id_hash(df[id_col].to_numpy(), SALT_LOTTERY)
             .astype(np.float64) + 0.5) / 4294967296.0
        return df[u < df["clf_score"].to_numpy() ** lottery_alpha]

    return scored.map_batches(keep, batch_format="pandas")
