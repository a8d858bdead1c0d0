"""URL canonicalization / dedup / domain filtering (kgtk_ray/text/urls.py)."""
import pandas as pd
import pytest
import ray.data as rd

from kgtk_ray.text.urls import (canonicalize_series, canonicalize_urls,
                                dedup_urls, extract_host, filter_domains)


CASES = [
    # (raw, canonical with strip_www=False)
    ("  HTTP://Example.COM:80/Path/?b=2&utm_source=x&a=1#frag ",
     "http://example.com/Path?a=1&b=2"),
    ("https://WWW.Site.org:443/", "https://www.site.org"),
    ("https://site.org/a/b/?z=9&y=8&fbclid=abc", "https://site.org/a/b?y=8&z=9"),
    ("ftp://Host/Thing", "ftp://host/Thing"),          # path case kept
    ("no-scheme/path#frag", "no-scheme/path"),         # pass-through
    ("http://h:8080/x?ref=1&ref_src=t&q=1", "http://h:8080/x?q=1"),
    ("https://h/?utm_campaign=c", "https://h"),        # ? vanishes
    ("https://h.com/p?a=1&a=0&B=2", "https://h.com/p?B=2&a=0&a=1"),  # byte sort
    ("http://x.com:80?a=1", "http://x.com?a=1"),       # port, no path
]


def test_canonicalize_cases():
    raw = pd.Series([r for r, _ in CASES])
    got = canonicalize_series(raw).to_list()
    assert got == [c for _, c in CASES]


def test_canonicalize_idempotent():
    raw = pd.Series([r for r, _ in CASES])
    once = canonicalize_series(raw)
    assert canonicalize_series(once).to_list() == once.to_list()


def test_strip_www():
    s = pd.Series(["https://WWW.Site.org/x", "https://wwwish.org/x"])
    got = canonicalize_series(s, strip_www=True).to_list()
    assert got == ["https://site.org/x", "https://wwwish.org/x"]


def test_extract_host():
    s = pd.Series(["  HTTP://Example.COM:80/p", "https://www.a.b.c/x?q",
                   "no-scheme", "https://h#f"])
    assert extract_host(s).to_list() == ["example.com", "a.b.c", "", "h"]
    assert extract_host(s, strip_www=False).to_list() == [
        "example.com", "www.a.b.c", "", "h"]


def test_canonicalize_urls_dataset():
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "url": ["HTTP://A.com:80/x/", "https://b.com/y?utm_source=z&k=v"]}))
    out = canonicalize_urls(ds).to_pandas().sort_values("doc_id")
    assert out.url_canon.to_list() == ["http://a.com/x", "https://b.com/y?k=v"]


def test_dedup_urls_min_id_winner():
    rows = pd.DataFrame({
        "doc_id": [5, 3, 9, 7, 1],
        "url": [
            "https://www.A.com/page/",       # canon -> https://a.com/page
            "https://a.com:443/page",        # same page
            "HTTPS://A.COM/page#frag",       # same page
            "https://a.com/other",           # distinct
            "http://a.com/page",             # distinct (scheme differs)
        ]})
    out = dedup_urls(rd.from_pandas(rows)).to_pandas()
    # one winner per canonical url, minimum doc_id
    assert sorted(out.doc_id) == [1, 3, 7]
    canon = dict(zip(out.doc_id, out.url_canon))
    assert canon[3] == "https://a.com/page"
    assert canon[1] == "http://a.com/page"


def test_filter_domains_blocklist_and_allowlist():
    rows = pd.DataFrame({
        "doc_id": range(6),
        "url": [f"https://www.site{i % 3}.org/p/{i}" for i in range(6)]})
    ds = rd.from_pandas(rows)
    blocked = filter_domains(ds, blocklist={"site1.org"}).to_pandas()
    assert sorted(blocked.doc_id) == [0, 2, 3, 5]
    assert set(blocked.host) == {"site0.org", "site2.org"}
    allowed = filter_domains(ds, allowlist={"site1.org"},
                             host_col=None).to_pandas()
    assert sorted(allowed.doc_id) == [1, 4]
    assert "host" not in allowed.columns
    with pytest.raises(ValueError):
        filter_domains(ds, blocklist={"x"}, allowlist={"y"})
