"""Heuristic language identification.

Deterministic stopword-count heuristic, chosen so the DuckDB oracle can
replicate it exactly with string arithmetic: score(lang) = number of
occurrences of each of the language's marker words as whole tokens in
the lowercased text; argmax wins, ties broken by the fixed language
order below.  Replaces fasttext-style models that aren't in this
container; the Ray plumbing (vectorized batch stage) is the real thing.

Arrow-native kernel (round 5): the batch never round-trips through
pandas object dtype — lowercase / separator-normalize / count run as
``pyarrow.compute`` (RE2) kernels over the zero-copy ``large_string``
column, attacking the measured single-node DRAM-bandwidth wall
(BASELINE.md round-4 scaling section).  Whole-token counting without
RE2 lookarounds: non-alphanumeric runs collapse to THREE spaces, the
text is space-padded, and ``count_substring(" w ")`` counts each token
exactly once (adjacent repeats keep one private space on each side, so
non-overlapping scanning cannot miss one) — exactly the oracle's
``list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x=w)``.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

Dataset = ray.data.Dataset

# fixed order = tie-break priority
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of"]),
    ("de", ["der", "und", "die"]),
    ("fr", ["le", "et", "les"]),
    ("es", ["el", "y", "los"]),
    ("zh", ["de5", "shi4", "le5"]),  # pinyin-ish markers for the synthetic corpus
]


def _padded_tokens(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Lowercased text with non-alnum runs collapsed to three spaces and
    a space pad at both ends: every whole token is surrounded by its own
    spaces, so ``count_substring(" w ")`` = whole-token occurrences."""
    s = pc.fill_null(pc.cast(col, pa.large_string()), "")
    low = pc.utf8_lower(s)
    norm = pc.replace_substring_regex(low, "[^a-z0-9]+", "   ")
    sp = pa.scalar(" ", pa.large_string())
    return pc.binary_join_element_wise(sp, norm, sp,
                                       pa.scalar("", pa.large_string()))


def count_whole_tokens(col, word: str) -> np.ndarray:
    """Whole-token occurrence counts of ``word`` per row (int64)."""
    return pc.count_substring(_padded_tokens(col),
                              f" {word} ").to_numpy().astype(np.int64)


def langid(ds: Dataset, *, text_col: str = "text",
           out_col: str = "lang_pred") -> Dataset:
    """Add ``out_col`` with the predicted language code ("und" when no
    marker occurs)."""
    def f(t: pa.Table) -> pa.Table:
        padded = _padded_tokens(t[text_col])
        scores = np.zeros((t.num_rows, len(LANG_MARKERS)), dtype=np.int64)
        for j, (_, words) in enumerate(LANG_MARKERS):
            for w in words:
                scores[:, j] += pc.count_substring(
                    padded, f" {w} ").to_numpy().astype(np.int64)
        best = scores.argmax(axis=1)
        langs = np.array([code for code, _ in LANG_MARKERS], dtype=object)
        pred = langs[best]
        pred[scores.max(axis=1) == 0] = "und"
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        # metadata-free schema keeps Ray's block-schema dedup hashable
        return (t.replace_schema_metadata(None)
                 .append_column(out_col, pa.array(pred, pa.large_string())))

    return ds.map_batches(f, batch_format="pyarrow")
