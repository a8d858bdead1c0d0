"""Fuzz-parity: the vectorized URL canonicalizer vs the DuckDB SQL
reimplementation used as the driver oracle (__ray_entry__._url_sql_ctes
embeds the same rule; here the SQL is applied to a generated URL grid
directly so the two implementations are compared on inputs neither was
tuned for)."""
import itertools

import duckdb
import pandas as pd

from kgtk_ray.text.urls import TRACKING_PARAM_RE, canonicalize_series


def _sql_canon(urls: pd.DataFrame) -> pd.Series:
    sql = f"""
    WITH c0 AS (SELECT u, regexp_replace(trim(u), '#.*$', '') AS s FROM urls),
    c1 AS (SELECT *, regexp_extract(s,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*') AS head FROM c0),
    c2 AS (SELECT *,
             CASE WHEN head = '' THEN ''
                  ELSE substr(s, length(head) + 1) END AS rest,
             regexp_replace(regexp_replace(lower(head),
                 '^(http://[^/?:]*):80$', '\\1'),
                 '^(https://[^/?:]*):443$', '\\1') AS h2
           FROM c1),
    c3 AS (SELECT *,
             regexp_replace(regexp_replace(rest, '\\?.*$', ''),
                            '/$', '') AS path,
             coalesce(array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
                 x -> x <> '' AND NOT regexp_matches(x,
                     '{TRACKING_PARAM_RE}'))), '&'), '') AS q
           FROM c2)
    SELECT CASE WHEN head = '' THEN s
                ELSE h2 || path || CASE WHEN q = '' THEN ''
                                        ELSE '?' || q END
           END AS canon
    FROM c3
    """
    return duckdb.query(sql).df()["canon"]


def _grid() -> list[str]:
    schemes = ["http://", "HTTPS://", "ftp://", ""]
    hosts = ["Example.COM", "www.site.org:443", "h:80", "a.b.c:8080"]
    paths = ["", "/", "/P/x/", "/p"]
    queries = ["", "?a=1&utm_source=x", "?z=9&y=8&y=10", "?ref=1",
               "?utm_a=1&utm_b=2", "?b&a&"]
    frags = ["", "#frag"]
    return ["".join(p) for p in
            itertools.product(schemes, hosts, paths, queries, frags)]


def test_grid_parity_with_sql_oracle():
    urls = pd.DataFrame({"u": _grid()})
    py = canonicalize_series(urls["u"]).to_list()
    sql = _sql_canon(urls).to_list()
    diffs = [(u, a, b) for u, a, b in zip(urls["u"], py, sql) if a != b]
    assert not diffs, f"{len(diffs)} disagreements, first 5: {diffs[:5]}"


def test_random_url_parity_with_sql_oracle():
    """Hypothesis fuzz past the grid: random scheme/host/port/path/query/
    fragment compositions, including percent-escapes, repeated params,
    empty components, unicode path segments and junk non-URLs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.text(alphabet="abZ09._%-é~", max_size=6)
    scheme = st.sampled_from(["http://", "https://", "HTTP://", "ftp://",
                              "", "mailto:", "//"])
    host = st.sampled_from(["Example.COM", "a.b", "WWW.x.Org", "h", ""])
    port = st.sampled_from(["", ":80", ":443", ":8080", ":0"])
    path = st.lists(seg, max_size=3).map(lambda ps: "".join("/" + p for p in ps))
    param = st.one_of(
        seg.map(lambda s: f"{s}=v"),
        st.sampled_from(["utm_source=x", "utm_medium=", "ref=1", "fbclid=z",
                         "gclid=1", "a", "", "a=1=2", "A=1"]))
    query = st.lists(param, max_size=4).map(
        lambda ps: "?" + "&".join(ps) if ps else "")
    frag = st.sampled_from(["", "#f", "#", "#a?b=1"])
    url = st.one_of(
        st.tuples(scheme, host, port, path, query, frag).map("".join),
        st.sampled_from(["", "   ", "not a url", "http://", "?x=1", "#only"]))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(url, min_size=1, max_size=25))
    def run(urls):
        df = pd.DataFrame({"u": urls})
        py = canonicalize_series(df["u"]).to_list()
        sql = _sql_canon(df).to_list()
        diffs = [(u, a, b) for u, a, b in zip(urls, py, sql) if a != b]
        assert not diffs, f"{len(diffs)} disagreements, first 5: {diffs[:5]}"

    run()
