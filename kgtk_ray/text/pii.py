"""PII scrubbing for web-text corpora.

Redacts e-mail addresses, IPv4 addresses, US SSNs, payment-card
numbers and international phone numbers from a text column with
compiled, vectorized regex passes — one ``map_batches`` over the
corpus, no shuffle, no per-row Python.

The e-mail / IP / SSN / phone patterns are deliberately RE2-compatible
(no lookaround, no backreferences) so the exact same regexes run in
the DuckDB oracle via ``regexp_replace(..., 'g')``, giving
byte-identical output on both sides.  Replacement order is fixed
(e-mail, IP, SSN, card, phone) so a dotted/digit-bearing token is
claimed by the most specific pattern first.  The card pass adds a
Luhn-checksum confirmation (a regex alone over-redacts arbitrary long
digit runs); checksums aren't expressible in SQL regex, so that pass
is pytest-verified rather than oracle-mirrored.
"""
from __future__ import annotations

import re

import pandas as pd
import ray.data

Dataset = ray.data.Dataset

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# US social security number, dashed form
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
# international form: leading '+', digits/space/()- body, ends on a digit
PHONE_RE = r"\+\d[\d()\- ]{6,}\d"
# 13-19 digits with optional single space/dash separators; candidates
# are confirmed by a Luhn checksum in Python (not expressible in RE2,
# so this pass has no SQL-oracle mirror — pytest-verified instead)
CC_RE = r"\b\d(?:[ -]?\d){12,18}\b"

def _luhn_ok(digits: str) -> bool:
    total, alt = 0, False
    for ch in reversed(digits):
        d = ord(ch) - 48
        if alt:
            d *= 2
            if d > 9:
                d -= 9
        total += d
        alt = not alt
    return total % 10 == 0


def _scrub_cc(m: "re.Match") -> str:
    digits = re.sub(r"[ -]", "", m.group(0))
    return "<CC>" if _luhn_ok(digits) else m.group(0)


# Ordered pass list; the card pass sits explicitly between SSN (so
# dashed short runs are already claimed) and phone.  Each entry is
# (name, compiled pattern, replacement string or callable).
_PASSES: list[tuple[str, "re.Pattern", object]] = [
    ("email", re.compile(EMAIL_RE), "<EMAIL>"),
    ("ip", re.compile(IPV4_RE), "<IP>"),
    ("ssn", re.compile(SSN_RE), "<SSN>"),
    ("cc", re.compile(CC_RE), _scrub_cc),
    ("phone", re.compile(PHONE_RE), "<PHONE>"),
]


def scrub_series(s: pd.Series, *, credit_cards: bool = True) -> pd.Series:
    for name, pat, rep in _PASSES:
        if name == "cc" and not credit_cards:
            continue
        s = s.str.replace(pat, rep, regex=True)
    return s


def scrub_pii(ds: Dataset, *, text_col: str = "text",
              out_col: str | None = None,
              credit_cards: bool = True) -> Dataset:
    """Replace e-mails / IPv4s / SSNs / card numbers / phone numbers in
    ``text_col`` with ``<EMAIL>`` / ``<IP>`` / ``<SSN>`` / ``<CC>`` /
    ``<PHONE>`` tokens.  Card candidates (13-19 digits, optional
    space/dash separators) are redacted only when the Luhn checksum
    passes; ``credit_cards=False`` skips that pass.

    Writes the scrubbed text back to ``text_col`` (or ``out_col`` if
    given, keeping the original).  Streaming, stateless, vectorized.
    """
    dst = out_col or text_col

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[dst] = scrub_series(df[text_col].astype(str),
                               credit_cards=credit_cards)
        return df

    return ds.map_batches(f, batch_format="pandas")
