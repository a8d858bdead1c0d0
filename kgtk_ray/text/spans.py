"""Global sub-document span deduplication (C4 style).

The C4 corpus pipeline (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", §2.2)
removes every repeated three-sentence span from the corpus, keeping
only its first occurrence, then reassembles the documents from the
surviving spans.  This module re-expresses that as a Ray Data
pipeline over fixed-``k``-word spans (the synthetic corpus carries no
sentence punctuation, so the span unit is a word window; the shape is
identical for sentence spans — swap the splitter):

1. one row-expanding ``map_batches`` pass splits each document into
   consecutive ``k``-word spans (the trailing partial span counts);
   each document is produced whole inside a single task, so span
   indices are exact;
2. one hash-bucketed shuffle keyed on the span text groups every
   occurrence of a span into the same bucket, where the global first
   occurrence — minimum ``(doc_id, span_idx)`` — survives a vectorized
   ``drop_duplicates``; the winner is a total order, so the result is
   deterministic across block orders and cluster sizes;
3. one bucketed shuffle on ``doc_id`` reassembles surviving spans in
   span order.

Scale: both shuffles move each span string exactly once; there is no
driver-side state.  Documents whose every span was seen earlier
disappear from the output (C4 likewise drops emptied documents).
"""
from __future__ import annotations

import pandas as pd
import ray.data

from ..ops._bucket import MIN_BUNDLE_ROWS, bucketed_group_apply

Dataset = ray.data.Dataset


_SENT_SPLIT = r"(?<=[.!?])\s+"


def dedup_spans(ds: Dataset, *, text_col: str = "text",
                id_col: str = "doc_id", k: int = 3,
                unit: str = "word", num_buckets: int = 32) -> Dataset:
    """Remove every repeated ``k``-unit span corpus-wide (keep the
    occurrence with the smallest ``(id_col, span position)``) and
    reassemble documents from their surviving spans.

    ``unit="word"`` spans over whitespace tokens; ``unit="sentence"``
    is C4's literal three-sentence unit (split after ``.!?``;
    inter-sentence whitespace is normalized to one space on
    reassembly, as C4 does).

    Returns ``(id_col, text_col)``; documents with no surviving spans
    (or no tokens) are dropped.
    """
    if unit not in ("word", "sentence"):
        raise ValueError(f"unit must be 'word' or 'sentence', got {unit!r}")

    def to_spans(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        toks = s.str.split() if unit == "word" \
            else s.str.strip().str.split(_SENT_SPLIT, regex=True)
        ex = toks.explode().dropna()
        ex = ex[ex != ""]
        if ex.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "span_idx": pd.Series([], dtype="int64"),
                                 "span_text": pd.Series([], dtype=str)})
        pos = ex.groupby(level=0).cumcount()
        # vectorized k-word join: concatenate k doc-local shifted copies
        # (the bigram idiom from repetition.py); a shift past the end of
        # the document yields NaN -> "" so the trailing partial span
        # falls out of the rstrip (words are split() output: non-empty,
        # no internal whitespace)
        parts = [ex.groupby(level=0).shift(-i).fillna("")
                 for i in range(1, k)]
        span = ex.str.cat(parts, sep=" ").str.rstrip() if parts else ex
        starts = (pos % k == 0).to_numpy()
        return pd.DataFrame({
            id_col: df[id_col].reindex(ex.index).to_numpy()[starts],
            "span_idx": (pos // k).to_numpy()[starts],
            "span_text": span.to_numpy()[starts],
        })

    spans = ds.map_batches(to_spans, batch_format="pandas",
                           batch_size=MIN_BUNDLE_ROWS)

    # global keep-first: all occurrences of a span text land in one
    # bucket (hash of the exact text), where the minimal (doc, idx)
    # occurrence wins — exact even under 64-bit hash-bucket collisions,
    # because the dedup key is the text itself.
    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([id_col, "span_idx"], kind="mergesort")
                .drop_duplicates("span_text"))

    kept = bucketed_group_apply(spans, ["span_text"], keep_first,
                                num_buckets=num_buckets, arrow_tag=True)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("span_idx", kind="mergesort")
        out = (df.groupby(id_col, sort=False)["span_text"]
               .agg(" ".join).reset_index(name=text_col))
        return out

    return bucketed_group_apply(kept, [id_col], reassemble,
                                num_buckets=num_buckets, arrow_tag=True)
