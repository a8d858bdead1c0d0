"""Repetition / quality-filter signals for web-scale training corpora.

Implements the repetition measures popularized by the Gopher corpus
filtering rules (Rae et al. 2021, "Scaling Language Models: Methods,
Analysis & Insights from Training Gopher", table A1) and the
cross-document duplicated-n-gram signal used by RefinedWeb-style
pipelines — re-expressed as vectorized Ray Data batch transforms:

* per-document signals (``repetition_signals``) are a single
  ``map_batches`` pass.  Arrow-native kernel (round 5): tokens come
  from ``pc.utf8_split_whitespace`` + ``pc.dictionary_encode`` on the
  zero-copy ``large_string`` column, so every group statistic
  (distinct-token fraction, top-token fraction, top bigram fraction,
  mean token length) runs over int32 codes in numpy — token STRINGS
  never materialize as Python objects, attacking the measured
  DRAM-bandwidth wall (BASELINE.md round-4 scaling section);
* the corpus-global signal (``corpus_dup_ngram_frac``) shuffles
  64-bit n-gram *hashes*, never n-gram strings: distinct
  (doc, gram) pairs -> bucketed count of containing docs -> hash join
  back onto per-doc occurrences -> per-doc aggregate.  Every stage is
  bounded by the gram-hash key space, so it holds at 100 TB where a
  string shuffle would not.  Gram hashes mix per-token content hashes
  (computed once per DISTINCT token per batch over the dictionary)
  positionally — object-dtype hashing cost is proportional to the
  vocabulary of a batch, not its token count.

All measures are deterministic string arithmetic mirrored 1:1 by the
DuckDB oracle SQL in ``__ray_entry__.oracle_sql()``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

Dataset = ray.data.Dataset

# NOTE on tokenization: pc.utf8_split_whitespace was observed
# returning the whole string UNSPLIT (['the '] for 'the ')
# intermittently inside fresh Ray Data workers (~1/3 of pipeline runs
# on a 4-row corpus; never reproducible in-process, with plasma
# round-trips, with sliced/chunked inputs, or with 8 concurrent
# first-calls in a fresh interpreter).  The kernel's whitespace
# classification appears unreliable under some worker initialization
# order, so tokenization uses the RE2 split instead — which also
# matches the DuckDB oracle's '\s+' (ASCII) semantics exactly.
_WS_SPLIT = r"\s+"


def _token_series(s: pd.Series) -> pd.Series:
    """Whitespace tokens per row (list-valued), matching
    ``string_split_regex(trim(text), '\\s+')`` on non-empty text.
    Pandas helper shared by the object-dtype consumers (dsir /
    decontam / lm); the hot kernels in THIS module use the Arrow
    :func:`_token_codes` path instead."""
    return s.astype(str).str.split()


def _gram_hash(grams: pd.Series) -> np.ndarray:
    """Stable 64-bit hash of n-gram strings (shuffle key; strings never
    leave the producing task)."""
    return pd.util.hash_pandas_object(grams, index=False).to_numpy()


def _token_codes(col) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                               np.ndarray, pa.Array, int]:
    """Tokenize an Arrow string column: returns ``(row_ids, codes,
    token_lengths, n_tokens_per_row, dictionary, n_rows)`` with empty
    tokens (split artifacts at whitespace boundaries) removed and
    document order preserved.  All outputs but the dictionary are
    numeric numpy arrays."""
    s = pc.fill_null(pc.cast(col, pa.large_string()), "")
    lists = pc.split_pattern_regex(s, _WS_SPLIT)
    n_rows = len(lists)
    lens = pc.fill_null(pc.list_value_length(lists), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    row = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    toklen = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    keep = toklen > 0          # drop "" boundary artifacts
    row, codes, toklen = row[keep], codes[keep], toklen[keep]
    n_tokens = np.bincount(row, minlength=n_rows)
    return row, codes, toklen, n_tokens, enc.dictionary, n_rows


def _group_top_distinct(row: np.ndarray, key: np.ndarray,
                        n_rows: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (max multiplicity, distinct count) of ``key`` values —
    the numpy lexsort replacement for a pandas groupby over object
    strings.  O(n log n), no Python objects."""
    top = np.zeros(n_rows, dtype=np.int64)
    distinct = np.zeros(n_rows, dtype=np.int64)
    if not len(row):
        return top, distinct
    order = np.lexsort((key, row))
    r, k = row[order], key[order]
    new = np.empty(len(r), dtype=bool)
    new[0] = True
    new[1:] = (r[1:] != r[:-1]) | (k[1:] != k[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(r)))
    np.maximum.at(top, r[starts], counts)
    np.add.at(distinct, r[starts], 1)
    return top, distinct


def _bigram_pairs(row: np.ndarray, codes: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row, first-code, second-code) of consecutive same-row token
    pairs, in document order."""
    if len(row) < 2:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    adj = row[1:] == row[:-1]
    return row[:-1][adj], codes[:-1][adj], codes[1:][adj]


def _signal_frame(col) -> dict[str, np.ndarray]:
    row, codes, toklen, n_tokens, _, n_rows = _token_codes(col)
    n = np.maximum(n_tokens, 1)
    top, distinct = _group_top_distinct(row, codes, n_rows)

    brow, c1, c2 = _bigram_pairs(row, codes)
    # pack the pair into one key for the group scan: codes are batch-
    # local dictionary indices, so c1 * K + c2 stays well inside int64
    k = int(codes.max()) + 1 if len(codes) else 1
    btop, _ = _group_top_distinct(brow, c1 * k + c2, n_rows)
    n_big = np.bincount(brow, minlength=n_rows).astype(np.float64)

    nonspace = np.bincount(row, weights=toklen, minlength=n_rows)
    return {
        "n_tokens": n_tokens.astype(np.int64),
        "dup_word_frac": 1.0 - distinct / n,
        "top_word_frac": top / n,
        "top_bigram_frac": np.where(n_big > 0,
                                    btop / np.maximum(n_big, 1), np.nan),
        "mean_word_len": nonspace / n,
    }


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
    def f(t: pa.Table) -> pa.Table:
        sig = _signal_frame(t[text_col])
        return pa.table({id_col: t[id_col],
                         **{name: pa.array(v) for name, v in sig.items()}})

    return ds.map_batches(f, batch_format="pyarrow")


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
    def f(t: pa.Table) -> pa.Table:
        sig = _signal_frame(t[text_col])
        n_tokens = sig["n_tokens"]
        keep = ((n_tokens >= min_tokens) & (n_tokens <= max_tokens)
                & (sig["mean_word_len"] >= min_mean_word_len)
                & (sig["mean_word_len"] <= max_mean_word_len)
                & (sig["dup_word_frac"] <= max_dup_word_frac)
                & (sig["top_word_frac"] <= max_top_word_frac))
        return t.replace_schema_metadata(None).filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the positional combine."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


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

    def to_grams(t: pa.Table) -> pd.DataFrame:
        row, codes, _, _, dictionary, _ = _token_codes(t[text_col])
        doc_ids = t[id_col].to_numpy(zero_copy_only=False)
        m = max(len(codes) - k + 1, 0)  # candidate gram start positions
        if m == 0:
            return pd.DataFrame({id_col: doc_ids[:0],
                                 "gram_h": np.empty(0, np.uint64)})
        # content-hash once per DISTINCT token, then map through codes:
        # cross-batch stable, object-dtype cost bounded by the batch
        # vocabulary, not its token count
        vocab_h = pd.util.hash_array(
            dictionary.to_pandas().to_numpy(dtype=object))
        th = vocab_h[codes]
        gram_h = _mix64(th[:m])
        ok = np.ones(m, dtype=bool)  # all k tokens inside one document
        for i in range(1, k):
            # positional combine: the accumulator is multiplied before
            # the xor, so token order matters (a plain mix(a)^mix(b)
            # commutes and collides transposed grams)
            with np.errstate(over="ignore"):
                gram_h = _mix64(gram_h * np.uint64(0x100000001B3)
                                ^ th[i:m + i])
            ok &= row[i:m + i] == row[:m]
        return pd.DataFrame({id_col: doc_ids[row[:m][ok]],
                             "gram_h": gram_h[ok]})

    grams = ds.map_batches(to_grams, batch_format="pyarrow",
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
