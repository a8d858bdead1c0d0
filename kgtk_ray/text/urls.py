"""URL canonicalization, URL-level dedup and domain filtering — the
front door of every Common-Crawl-style curation pipeline (CCNet §3.1
and RefinedWeb/Macrodata-refinement both start with URL filtering +
URL dedup before any content-level pass).  The reference has no URL
operators (it is a KG toolkit), so semantics here follow the public
pipelines; everything is deterministic and SQL-replicable so the
driver oracle can hash-verify it.

Canonicalization rule (applied in this order; every step is a
vectorized pandas/C-regex pass — no per-row Python):

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

At 100 TB every step is stateless per batch; URL dedup then reuses the
exact-dedup exchange (hash-bucketed shuffle on the canonical string,
min-id winner per group) and domain filtering broadcasts the
block/allow list once via ``ray.put``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

Dataset = ray.data.Dataset

# tracking parameters dropped by step 6 (public ad/analytics params;
# the utm_ family is matched as a prefix)
TRACKING_PARAM_RE = (
    r"^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$")

_HEAD_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)(.*)$"


def _sorted_query(q: pd.Series) -> pd.Series:
    """Filter tracking params out of '&'-joined query strings and
    byte-sort the rest; fully vectorized (explode -> mask -> stable
    sort -> group join)."""
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


def canonicalize_series(s: pd.Series, *, strip_www: bool = False) -> pd.Series:
    """The canonicalization rule over a string Series (one batch)."""
    s = s.astype(str).str.strip()
    s = s.str.replace(r"#.*$", "", regex=True)          # 2: fragment
    parts = s.str.extract(_HEAD_RE)
    head, rest = parts[0], parts[1]
    no_scheme = head.isna()
    head = head.str.lower()                              # 3: scheme+host
    head = head.str.replace(r"^(http://[^/?:]*):80$", r"\1", regex=True)
    head = head.str.replace(r"^(https://[^/?:]*):443$", r"\1", regex=True)
    if strip_www:
        head = head.str.replace(r"^([a-z][a-z0-9+.-]*://)www\.",
                                r"\1", regex=True)
    path = rest.str.replace(r"\?.*$", "", regex=True)
    query = rest.str.extract(r"\?(.*)$")[0]
    canon_q = _sorted_query(query)
    path = path.str.replace(r"/$", "", regex=True)       # 7: trailing /
    out = head.fillna("") + path.fillna("")
    hasq = canon_q != ""
    out = out.where(~hasq, out + "?" + canon_q)
    return out.where(~no_scheme, s)                      # 3: pass-through


def canonicalize_urls(ds: Dataset, *, url_col: str = "url",
                      out_col: str = "url_canon",
                      strip_www: bool = False) -> Dataset:
    """Add ``out_col`` = canonical form of ``url_col``."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = canonicalize_series(df[url_col], strip_www=strip_www)
        return df

    return ds.map_batches(f, batch_format="pandas")


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


def extract_host(s: pd.Series, *, strip_www: bool = True) -> pd.Series:
    """Lowercased host (no port) of each URL; '' when there is no
    ``scheme://``."""
    host = s.astype(str).str.strip().str.extract(
        r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?:#]*)")[0].str.lower()
    if strip_www:
        host = host.str.replace(r"^www\.", "", regex=True)
    return host.fillna("")


def filter_domains(ds: Dataset, *, blocklist=None, allowlist=None,
                   url_col: str = "url", host_col: str | None = "host",
                   strip_www: bool = True) -> Dataset:
    """Drop rows whose URL host is in ``blocklist`` (or, with
    ``allowlist``, keep only hosts in it).  The list is broadcast once
    via ``ray.put`` and membership is a vectorized ``isin`` per batch
    — the UT1-blocklist shape (millions of hosts) stays a single
    object-store copy per node, never a shuffle.  ``host_col`` (when
    not None) is added to the output for downstream per-domain stats."""
    if (blocklist is None) == (allowlist is None):
        raise ValueError("pass exactly one of blocklist / allowlist")
    wanted = allowlist is not None
    ref = ray.put(frozenset(allowlist if wanted else blocklist))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        hosts = extract_host(df[url_col], strip_www=strip_www)
        mask = hosts.isin(ray.get(ref))
        out = df[mask if wanted else ~mask.to_numpy()]
        if host_col:
            out = out.copy()
            out[host_col] = hosts[mask.to_numpy() if wanted
                                  else ~mask.to_numpy()].to_numpy()
        return out

    return ds.map_batches(f, batch_format="pandas")
