"""DSIR — Data Selection with Importance Resampling (Xie et al.,
arXiv:2302.03169): score raw web documents by how target-like they are
under hashed n-gram bag-of-words models, then resample with Gumbel
top-k.  The public method behind "pick the Pile/Wikipedia-like slice
of Common Crawl"; the reference repo has no counterpart (it is a KG
toolkit), so this follows the paper.

Distributed shape (all stages bounded, nothing all-to-all beyond one
``num_buckets``-wide count aggregate):

1. **features** — per batch, lowercased whitespace unigrams + bigrams
   hashed into ``num_buckets`` buckets (vectorized
   ``pd.util.hash_array`` over exploded token arrays).
2. **fit** — bucket count vectors for the raw corpus and the target
   corpus via per-batch ``bincount`` partials emitted long-form and
   summed by the combiner-first :func:`grouped_aggregate`; the two
   dense vectors (``num_buckets`` floats, ~80 KB at the paper's 10k
   buckets) collect to the driver and broadcast once via ``ray.put``.
3. **score** — one stateless ``map_batches``:
   ``log w(x) = sum_b count_b(x) * (log p_target[b] - log p_raw[b])``
   with add-alpha smoothing, exactly the paper's importance
   log-weight under the hashed generative model.
4. **resample** — Gumbel top-k over ``log w + g(id)`` where the Gumbel
   noise is a pure function of the document id (Knuth multiplicative
   hash -> uniform -> ``-log(-log u)``), so the selected set is
   reproducible across runs, block orders and cluster sizes; the
   global top-k is one distributed sort + limit on an
   (id, key)-width projection.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..ops.sample import SALT_GUMBEL, _id_hash
from .repetition import _token_series

Dataset = ray.data.Dataset

_ALPHA = 0.5  # add-alpha smoothing for empty buckets


def _feature_buckets(texts: pd.Series, num_buckets: int,
                     bigrams: bool) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, bucket) pairs for every unigram/bigram feature of
    every row; fully vectorized (explode + hash_array)."""
    toks = _token_series(texts.str.lower())
    ex = toks.explode().dropna()
    idx = [ex.index.to_numpy()]
    feats = [ex.to_numpy(dtype=object)]
    if bigrams:
        # bigram string per consecutive token pair, built by shifting
        # the exploded array and masking row boundaries
        words = ex.to_numpy(dtype=object)
        rows = ex.index.to_numpy()
        if len(words) > 1:
            same = rows[1:] == rows[:-1]
            big = words[:-1][same].astype(object) + " " + words[1:][same]
            idx.append(rows[:-1][same])
            feats.append(big)
    rows_all = np.concatenate(idx) if idx else np.empty(0, dtype=np.int64)
    feats_all = (np.concatenate(feats) if feats
                 else np.empty(0, dtype=object))
    if len(feats_all) == 0:
        return rows_all, np.empty(0, dtype=np.int64)
    b = pd.util.hash_array(feats_all) % np.uint64(num_buckets)
    return rows_all, b.astype(np.int64)


def _bucket_counts(ds: Dataset, *, text_col: str, num_buckets: int,
                   bigrams: bool, num_shuffle_buckets: int) -> np.ndarray:
    """Dense feature-bucket count vector for a corpus: per-batch
    bincount partials in long form, combiner-summed; distinct keys are
    bounded by ``num_buckets`` so the exchange is tiny."""
    from ..ops._bucket import MIN_BUNDLE_ROWS
    from ..ops.agg import grouped_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        _, b = _feature_buckets(df[text_col].astype(str), num_buckets,
                                bigrams)
        c = np.bincount(b, minlength=num_buckets)
        nz = np.flatnonzero(c)
        return pd.DataFrame({"bucket": nz.astype(np.int64),
                             "c": c[nz].astype(np.int64)})

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=MIN_BUNDLE_ROWS),
        ["bucket"], {"c": ("c", "sum")},
        num_buckets=num_shuffle_buckets).to_pandas()
    out = np.zeros(num_buckets, dtype=np.int64)
    if len(agg):
        out[agg["bucket"].to_numpy()] = agg["c"].to_numpy()
    return out


def dsir_scores(corpus: Dataset, target: Dataset, *,
                text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 10_000, bigrams: bool = True,
                num_shuffle_buckets: int = 16) -> Dataset:
    """Per-document DSIR importance log-weight of ``corpus`` documents
    toward the ``target`` distribution.  Returns
    ``(id_col, n_feats, dsir_score)``; ``dsir_score`` is the summed
    log probability ratio (higher = more target-like), 0.0 for
    documents with no features."""
    raw_c = _bucket_counts(corpus, text_col=text_col,
                           num_buckets=num_buckets, bigrams=bigrams,
                           num_shuffle_buckets=num_shuffle_buckets)
    tgt_c = _bucket_counts(target, text_col=text_col,
                           num_buckets=num_buckets, bigrams=bigrams,
                           num_shuffle_buckets=num_shuffle_buckets)
    log_raw = np.log(raw_c + _ALPHA) - np.log(raw_c.sum()
                                              + _ALPHA * num_buckets)
    log_tgt = np.log(tgt_c + _ALPHA) - np.log(tgt_c.sum()
                                              + _ALPHA * num_buckets)
    ratio_ref = ray.put((log_tgt - log_raw).astype(np.float64))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ratio = ray.get(ratio_ref)
        rows, b = _feature_buckets(df[text_col].astype(str), num_buckets,
                                   bigrams)
        pos = pd.Index(df.index)
        w = np.zeros(len(df), dtype=np.float64)
        n = np.zeros(len(df), dtype=np.int64)
        if len(rows):
            loc = pos.get_indexer(rows)
            np.add.at(w, loc, ratio[b])
            np.add.at(n, loc, 1)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_feats": n, "dsir_score": w})

    return corpus.map_batches(score, batch_format="pandas")


def dsir_sample(corpus: Dataset, target: Dataset, *, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 10_000, bigrams: bool = True,
                gumbel: bool = True) -> Dataset:
    """Select the ``k`` corpus documents with the largest
    ``dsir_score [+ Gumbel(id)]`` — the paper's importance resampling
    (``gumbel=False`` degrades to deterministic top-k selection).
    Returns ``(id_col, n_feats, dsir_score, dsir_key)`` for the
    selected documents; one distributed sort + limit, so only
    score-width rows move."""
    scored = dsir_scores(corpus, target, text_col=text_col,
                         id_col=id_col, num_buckets=num_buckets,
                         bigrams=bigrams)

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if gumbel:
            # salted stream: independent of the id-hash sampling /
            # lottery streams (see SALT_GUMBEL in ops/sample.py)
            u = (_id_hash(df[id_col].to_numpy(), SALT_GUMBEL)
                 .astype(np.float64) + 0.5) / 4294967296.0
            df["dsir_key"] = df["dsir_score"].to_numpy() - np.log(-np.log(u))
        else:
            df["dsir_key"] = df["dsir_score"]
        return df

    keyed = scored.map_batches(key, batch_format="pandas")
    return keyed.sort(["dsir_key", id_col], descending=[True, False]).limit(k)
