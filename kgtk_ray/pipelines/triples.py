"""Rule-based triple extraction over extracted page text.

The analog of the reference's import stage (e.g. import-ntriples /
import-conceptnet turn external records into edge rows,
/root/reference/kgtk/imports/kgtkntriples.py) — here the "records" are
dependency-pattern sentences in web text.  Deterministic regex rules
keep P/R against the reference extraction well defined (SURVEY §7 M5).

Extraction is vectorized: each pattern runs once per batch via pandas
``str.extractall`` (compiled regex, C loop), emitting (node1, label,
node2, url) rows; no per-row Python.
"""
from __future__ import annotations

import re
from typing import Sequence

import pandas as pd
import ray.data

Dataset = ray.data.Dataset

# Patterns for the synthetic entity corpus: "<alias> was born in <alias>."
_ENT = r"([A-Za-z][A-Za-z0-9]*)"
DEFAULT_PATTERNS: list[tuple[str, str]] = [
    (rf"{_ENT} was born in {_ENT}\.", "born_in"),
    (rf"{_ENT} works for {_ENT}\.", "works_for"),
    (rf"{_ENT} is located in {_ENT}\.", "located_in"),
]

# Patterns for the documents-derived corpus (pages_from_documents):
# object may contain spaces (e.g. "Source src5"); stop at the period.
DOC_PATTERNS: list[tuple[str, str]] = [
    (r"Doc (D\d+) was published by ([^.\n]+)\.", "published_by"),
    (r"Doc (D\d+) is written in (\w+)\.", "written_in"),
    (r"Doc (D\d+) has (\d+) characters\.", "char_count"),
]


def extract_triples(
    pages: Dataset,
    patterns: Sequence[tuple[str, str]] = DEFAULT_PATTERNS,
    *,
    text_col: str = "extracted_text",
    url_col: str = "url",
    with_provenance: bool = True,
) -> Dataset:
    """Emit one edge row per pattern match: (node1, label, node2[, url])."""
    compiled = [(re.compile(p), label) for p, label in patterns]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        text = df[text_col].astype(str)
        for rx, label in compiled:
            m = text.str.extractall(rx)
            if m.empty:
                continue
            m = m.rename(columns={0: "node1", 1: "node2"})
            idx = m.index.get_level_values(0)
            out = pd.DataFrame({
                "node1": m["node1"].to_numpy(dtype=object),
                "label": label,
                "node2": m["node2"].to_numpy(dtype=object),
            })
            if with_provenance:
                out["url"] = df[url_col].to_numpy()[idx]
            frames.append(out)
        if not frames:
            cols = ["node1", "label", "node2"] + (["url"] if with_provenance else [])
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        return pd.concat(frames, ignore_index=True)

    return pages.map_batches(f, batch_format="pandas")
