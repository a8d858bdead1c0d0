"""URL canonicalization, URL-level dedup and domain filtering — the
front door of every Common-Crawl-style curation pipeline (CCNet §3.1
and RefinedWeb/Macrodata-refinement both start with URL filtering +
URL dedup before any content-level pass).  The reference has no URL
operators (it is a KG toolkit), so semantics here follow the public
pipelines; everything is deterministic and SQL-replicable so the
driver oracle can hash-verify it.

Canonicalization rule (applied in this order):

1. strip surrounding whitespace
2. drop the ``#fragment``
3. lowercase ``scheme://host[:port]`` (everything before the first
   ``/`` or ``?``); URLs with no ``://`` pass through steps 1-2 only
4. drop default ports (``:80`` for http, ``:443`` for https)
5. optionally strip a leading ``www.`` from the host
6. drop tracking parameters (``utm_*``, fbclid, gclid, msclkid,
   mc_eid, igshid, ref, ref_src), byte-sort the surviving ``k=v``
   parameter strings, re-join with ``&`` (the ``?`` disappears when
   nothing survives)
7. strip one trailing ``/`` from the path

Arrow-native kernel (round 5): steps 1-5 and 7 run as
``pyarrow.compute`` (RE2) kernels over the zero-copy ``large_string``
column — no pandas object-dtype round trip of the full URL strings.
Only step 6's per-row parameter sort drops to pandas, and only over
the (typically small) subset of rows that actually carry a query
string; Arrow has no per-list string sort kernel.

At 100 TB every step is stateless per batch; URL dedup then reuses the
exact-dedup exchange (hash-bucketed shuffle on the canonical string,
min-id winner per group) and domain filtering broadcasts the
block/allow list once via ``ray.put`` as a ready-to-use Arrow
``value_set`` (near-zero-copy out of plasma per task).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

Dataset = ray.data.Dataset

# tracking parameters dropped by step 6 (public ad/analytics params;
# the utm_ family is matched as a prefix)
TRACKING_PARAM_RE = (
    r"^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$")

_HEAD_RE = r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://[^/?]*)(?P<rest>.*)$"


def _sorted_query(q: pd.Series) -> pd.Series:
    """Filter tracking params out of '&'-joined query strings and
    byte-sort the rest; vectorized (explode -> mask -> stable sort ->
    group join) over only the rows that have a query."""
    out = pd.Series([""] * len(q), index=q.index, dtype=object)
    has = q.notna() & (q != "")
    if not has.any():
        return out
    ex = q[has].str.split("&").explode()
    ex = ex[(ex != "") & ~ex.str.match(TRACKING_PARAM_RE)]
    if ex.empty:
        return out
    d = pd.DataFrame({"i": ex.index.to_numpy(), "p": ex.to_numpy()})
    d = d.sort_values(["i", "p"], kind="mergesort")
    joined = d.groupby("i", sort=False)["p"].agg("&".join)
    out.loc[joined.index] = joined.to_numpy()
    return out


def canonicalize_array(col, *, strip_www: bool = False) -> pa.ChunkedArray:
    """The canonicalization rule over an Arrow string array (one
    batch); returns ``large_string``."""
    s = pc.fill_null(pc.cast(col, pa.large_string()), "")
    # RE2 trim, not utf8_trim_whitespace — the whitespace-classifying
    # kernels misbehaved intermittently in fresh Ray workers (see the
    # note in text/repetition.py); the oracle's trim() is ASCII anyway
    s = pc.replace_substring_regex(s, r"^\s+|\s+$", "")  # 1: strip
    s = pc.replace_substring_regex(s, "#.*$", "")        # 2: fragment
    ex = pc.extract_regex(s, _HEAD_RE)                   # null = no scheme
    head = pc.utf8_lower(pc.struct_field(ex, "head"))    # 3: scheme+host
    head = pc.replace_substring_regex(
        head, r"^(http://[^/?:]*):80$", r"\1")           # 4: ports
    head = pc.replace_substring_regex(
        head, r"^(https://[^/?:]*):443$", r"\1")
    if strip_www:                                        # 5: www.
        head = pc.replace_substring_regex(
            head, r"^([a-z][a-z0-9+.-]*://)www\.", r"\1")
    rest = pc.struct_field(ex, "rest")
    path = pc.replace_substring_regex(rest, r"\?.*$", "")
    path = pc.replace_substring_regex(path, "/$", "")    # 7: trailing /
    # 6: the per-row parameter sort — pandas over the query subset only
    query = pc.struct_field(pc.extract_regex(rest, r"\?(?P<q>.*)$"), "q")
    canon_q = pa.array(
        _sorted_query(query.to_pandas()).to_numpy(), pa.large_string())
    empty = pa.scalar("", pa.large_string())
    base = pc.binary_join_element_wise(head, path, empty)
    withq = pc.binary_join_element_wise(
        base, pa.scalar("?", pa.large_string()), canon_q, empty)
    out = pc.if_else(pc.not_equal(canon_q, ""), withq, base)
    # 3: no-scheme rows pass through steps 1-2 only (out is null there)
    return pc.if_else(pc.is_null(out), s, out)


def canonicalize_series(s: pd.Series, *, strip_www: bool = False) -> pd.Series:
    """The canonicalization rule over a string Series (pandas wrapper
    around :func:`canonicalize_array` for driver-side/test use)."""
    arr = canonicalize_array(
        pa.Array.from_pandas(s.astype(str), type=pa.large_string()),
        strip_www=strip_www)
    return pd.Series(arr.to_pandas().to_numpy(), index=s.index, dtype=object)


def canonicalize_urls(ds: Dataset, *, url_col: str = "url",
                      out_col: str = "url_canon",
                      strip_www: bool = False) -> Dataset:
    """Add ``out_col`` = canonical form of ``url_col``."""
    def f(t: pa.Table) -> pa.Table:
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        # metadata-free schema keeps Ray's block-schema dedup hashable
        return t.replace_schema_metadata(None).append_column(
            out_col, canonicalize_array(t[url_col], strip_www=strip_www))

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_urls(ds: Dataset, *, url_col: str = "url",
               id_col: str = "doc_id", strip_www: bool = True,
               canon_col: str = "url_canon") -> Dataset:
    """URL-level dedup: keep the minimum-``id_col`` row per canonical
    URL (``strip_www`` defaults on — ``www.x.com`` and ``x.com`` are
    one page for dedup purposes).  Same two-phase exchange as exact
    content dedup: per-batch combiner drops local duplicates, then one
    hash-bucketed shuffle on the canonical string settles the rest."""
    from ..dedup.exact import dedup_exact
    return dedup_exact(
        canonicalize_urls(ds, url_col=url_col, out_col=canon_col,
                          strip_www=strip_www),
        text_col=canon_col, id_col=id_col)


def extract_host_array(col, *, strip_www: bool = True) -> pa.ChunkedArray:
    """Lowercased host (no port) per URL as Arrow ``large_string``;
    '' when there is no ``scheme://``."""
    s = pc.replace_substring_regex(
        pc.fill_null(pc.cast(col, pa.large_string()), ""),
        r"^\s+|\s+$", "")
    host = pc.utf8_lower(pc.struct_field(
        pc.extract_regex(
            s, r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<h>[^/?:#]*)"), "h"))
    if strip_www:
        host = pc.replace_substring_regex(host, r"^www\.", "")
    return pc.fill_null(host, "")


def extract_host(s: pd.Series, *, strip_www: bool = True) -> pd.Series:
    """Pandas wrapper around :func:`extract_host_array`."""
    arr = extract_host_array(
        pa.Array.from_pandas(s.astype(str), type=pa.large_string()),
        strip_www=strip_www)
    return pd.Series(arr.to_pandas().to_numpy(), index=s.index, dtype=object)


def filter_domains(ds: Dataset, *, blocklist=None, allowlist=None,
                   url_col: str = "url", host_col: str | None = "host",
                   strip_www: bool = True) -> Dataset:
    """Drop rows whose URL host is in ``blocklist`` (or, with
    ``allowlist``, keep only hosts in it).  The list is broadcast once
    via ``ray.put`` as a sorted Arrow array and used directly as the
    ``is_in`` value_set per batch — the UT1-blocklist shape (millions
    of hosts) stays a single object-store copy per node, never a
    shuffle.  ``host_col`` (when not None) is added to the output for
    downstream per-domain stats."""
    if (blocklist is None) == (allowlist is None):
        raise ValueError("pass exactly one of blocklist / allowlist")
    wanted = allowlist is not None
    ref = ray.put(pa.array(sorted(set(allowlist if wanted else blocklist)),
                           pa.large_string()))

    def f(t: pa.Table) -> pa.Table:
        hosts = extract_host_array(t[url_col], strip_www=strip_www)
        mask = pc.is_in(hosts, value_set=ray.get(ref))
        if not wanted:
            mask = pc.invert(mask)
        t = t.replace_schema_metadata(None)
        if host_col:
            if host_col in t.column_names:
                t = t.drop_columns([host_col])
            t = t.append_column(host_col, hosts)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")
