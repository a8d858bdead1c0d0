"""Boilerplate-stripped text extraction (trafilatura-style, stdlib-only).

Per ``BASELINE.json:input_hint`` the per-row invariant is: extracted
text must be byte-identical per url to the page table's ``text``
column.  The extractor is a general template-free HTML cleaner:

  1. drop <head> content, then <script>/<style>/<nav>/<footer>/
     <header>/<aside> blocks (one left-to-right pass per tag),
  2. prefer the <article> subtree when present,
  3. emit the text of each <p> (any remaining tags stripped), joined
     with "\\n", HTML entities unescaped; when no <p> exists, the
     tag-stripped scope text.

Arrow-native batch kernel (round 5, was the flagship's single biggest
remote-wall stage as a per-row Python loop): every pass is a
column-level RE2 kernel (``pyarrow.compute.replace_substring_regex``
/ ``extract_regex``) over the zero-copy ``large_string`` column.  The
paragraph list never materializes: paragraph gaps collapse to a \\x00
marker, per-paragraph trim / empty-drop run as global regex passes
over the marker string, and the final marker->\\n substitution yields
the joined text.  Only entity unescaping drops to Python, and only
for the rows that actually contain ``&`` (no Arrow kernel exists).
:func:`extract_html_text` remains the row-level spec the batch kernel
is property-tested against.
"""
from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

Dataset = ray.data.Dataset

# boilerplate containers dropped before paragraph extraction; one
# left-to-right non-greedy pass per tag (RE2 has no backreferences, so
# the row spec below uses the same sequential per-tag order)
DROP_TAGS = ("script", "style", "nav", "footer", "header", "aside")

_HEAD_RE = re.compile(r"<head\b.*?</head\s*>", re.S | re.I)
_DROP_RES = [re.compile(rf"<{t}\b.*?</{t}\s*>", re.S | re.I)
             for t in DROP_TAGS]
_ARTICLE_RE = re.compile(r"<article\b[^>]*>(.*?)</article\s*>", re.S | re.I)
_P_RE = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t]+")


def extract_html_text(raw: bytes | str) -> str:
    """Extract the main text of one HTML page (deterministic row-level
    spec; the distributed path is the vectorized Arrow kernel in
    :func:`extract_text`, property-tested to agree with this)."""
    if isinstance(raw, (bytes, bytearray, memoryview)):
        s = bytes(raw).decode("utf-8", errors="replace")
    else:
        s = raw
    s = _HEAD_RE.sub(" ", s)
    for rx in _DROP_RES:
        s = rx.sub(" ", s)
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


_SEP = "\x00"  # paragraph marker: cannot appear in decoded HTML text


def _extract_column(col) -> pa.Array:
    """The batch kernel: column-level RE2 passes implementing the same
    semantics as :func:`extract_html_text`."""
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        try:
            s = pc.cast(col, pa.large_string())
        except pa.ArrowInvalid:  # non-UTF8 bytes: row-level decode
            s = pa.array([bytes(x).decode("utf-8", errors="replace")
                          if x is not None else ""
                          for x in col.to_pylist()], pa.large_string())
    else:
        s = pc.cast(col, pa.large_string())
    s = pc.fill_null(s, "")
    s = pc.replace_substring_regex(s, r"(?is)<head\b.*?</head\s*>", " ")
    for t in DROP_TAGS:
        s = pc.replace_substring_regex(
            s, rf"(?is)<{t}\b.*?</{t}\s*>", " ")
    art = pc.struct_field(pc.extract_regex(
        s, r"(?is)<article\b[^>]*>(?P<a>.*?)</article\s*>"), "a")
    scope = pc.if_else(pc.is_null(art), s, art)

    # the body fallback applies unless a COMPLETE <p>...</p> pair exists
    has_p = pc.match_substring_regex(scope, r"(?is)<p\b[^>]*>.*?</p\s*>")
    # paragraph path: keep only <p> contents, gaps -> \x00 markers.
    # Order matters: cut after the LAST </p> (greedy .* backtrack)
    # BEFORE collapsing gaps, so an unmatched trailing <p> opener is
    # dropped exactly as findall's complete-pair semantics drop it.
    p = pc.replace_substring_regex(
        scope, r"(?is)^.*?<p\b[^>]*>", "")          # before first <p>
    p = pc.replace_substring_regex(
        p, r"(?is)(.*)</p\s*>.*$", r"\1")           # after last </p>
    p = pc.replace_substring_regex(
        p, r"(?is)</p\s*>.*?<p\b[^>]*>", _SEP)      # between paragraphs

    # one shared tail pass: p-path rows carry \x00 markers, body-path
    # rows have none (so the marker passes are no-ops for them)
    x = pc.if_else(has_p, p, scope)
    # strip tags, collapse spaces/tabs (per paragraph — \x00 is not in
    # the class, so markers bound the collapse)
    x = pc.replace_substring_regex(x, r"<[^>]+>", " ")
    x = pc.replace_substring_regex(x, r"[ \t]+", " ")
    # trim each paragraph, drop emptied paragraphs, trim the ends
    x = pc.replace_substring_regex(x, r"\s*\x00\s*", _SEP)
    x = pc.replace_substring_regex(x, r"\x00+", _SEP)
    x = pc.replace_substring_regex(x, r"^[\s\x00]+|[\s\x00]+$", "")
    out = pc.replace_substring(x, _SEP, "\n")
    # entities: no Arrow kernel — unescape only the rows that need it
    amp = pc.match_substring(out, "&").to_numpy(zero_copy_only=False)
    if amp.any():
        vals = out.to_numpy(zero_copy_only=False).astype(object)
        idx = np.flatnonzero(amp)
        vals[idx] = [_html.unescape(v) for v in vals[idx]]
        out = pa.array(vals, pa.large_string())
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def extract_text(pages: Dataset, *, html_col: str = "html",
                 out_col: str = "extracted_text") -> Dataset:
    """Add ``out_col`` with the boilerplate-stripped text of ``html_col``."""
    def f(t: pa.Table) -> pa.Table:
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        # drop parquet/pandas schema metadata: it makes block schemas
        # unhashable, defeating Ray's schema-dedup fast path
        return (t.replace_schema_metadata(None)
                 .append_column(out_col, _extract_column(t[html_col])))

    return pages.map_batches(f, batch_format="pyarrow")
