"""Boilerplate-stripped text extraction (trafilatura-style, stdlib-only).

Per ``BASELINE.json:input_hint`` the per-row invariant is: extracted
text must be byte-identical per url to the page table's ``text``
column.  The extractor is a general template-free HTML cleaner:

  1. drop <script>/<style>/<head> content,
  2. drop boilerplate containers (<nav>, <footer>, <header>, <aside>),
  3. prefer the <article> subtree when present,
  4. emit the text of each <p> (any remaining tags stripped), joined
     with "\n", HTML entities unescaped.

Runs as a stateless vectorized ``map_batches`` over Arrow batches; the
per-cell work is a handful of compiled-regex passes.
"""
from __future__ import annotations

import html as _html
import re

import pandas as pd
import ray.data

Dataset = ray.data.Dataset

_DROP_RE = re.compile(
    r"<(script|style|nav|footer|header|aside)\b.*?</\1\s*>",
    re.S | re.I,
)
_HEAD_RE = re.compile(r"<head\b.*?</head\s*>", re.S | re.I)
_ARTICLE_RE = re.compile(r"<article\b[^>]*>(.*?)</article\s*>", re.S | re.I)
_P_RE = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t]+")


def extract_html_text(raw: bytes | str) -> str:
    """Extract the main text of one HTML page (deterministic)."""
    if isinstance(raw, (bytes, bytearray, memoryview)):
        s = bytes(raw).decode("utf-8", errors="replace")
    else:
        s = raw
    s = _HEAD_RE.sub(" ", s)
    s = _DROP_RE.sub(" ", s)
    m = _ARTICLE_RE.search(s)
    scope = m.group(1) if m else s
    paras = _P_RE.findall(scope)
    if not paras:
        body = _TAG_RE.sub(" ", scope)
        body = _WS_RE.sub(" ", body).strip()
        return _html.unescape(body)
    out = []
    for p in paras:
        t = _TAG_RE.sub(" ", p)
        t = _WS_RE.sub(" ", t).strip()
        if t:
            out.append(_html.unescape(t))
    return "\n".join(out)


def extract_text(pages: Dataset, *, html_col: str = "html",
                 out_col: str = "extracted_text") -> Dataset:
    """Add ``out_col`` with the boilerplate-stripped text of ``html_col``."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = [extract_html_text(h) for h in df[html_col]]
        return df

    return pages.map_batches(f, batch_format="pandas")
