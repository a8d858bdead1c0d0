"""PII scrubbing for web-text corpora.

Redacts e-mail addresses, IPv4 addresses and international phone
numbers from a text column with compiled, vectorized regex passes —
one ``map_batches`` over the corpus, no shuffle, no per-row Python.

The patterns are deliberately RE2-compatible (no lookaround, no
backreferences) so the exact same regexes run in the DuckDB oracle via
``regexp_replace(..., 'g')``, giving byte-identical output on both
sides.  Replacement order is fixed (e-mail, then IP, then phone) so a
dotted/digit-bearing token is claimed by the most specific pattern
first.
"""
from __future__ import annotations

import re

import pandas as pd
import ray.data

Dataset = ray.data.Dataset

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international form: leading '+', digits/space/()- body, ends on a digit
PHONE_RE = r"\+\d[\d()\- ]{6,}\d"

_PASSES: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def scrub_series(s: pd.Series) -> pd.Series:
    for pat, rep in _COMPILED:
        s = s.str.replace(pat, rep, regex=True)
    return s


_COMPILED = [(re.compile(p), r) for p, r in _PASSES]


def scrub_pii(ds: Dataset, *, text_col: str = "text",
              out_col: str | None = None) -> Dataset:
    """Replace e-mails / IPv4s / phone numbers in ``text_col`` with
    ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` tokens.

    Writes the scrubbed text back to ``text_col`` (or ``out_col`` if
    given, keeping the original).  Streaming, stateless, vectorized.
    """
    dst = out_col or text_col

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[dst] = scrub_series(df[text_col].astype(str))
        return df

    return ds.map_batches(f, batch_format="pandas")
