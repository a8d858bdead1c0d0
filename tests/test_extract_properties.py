"""Property-based parity for the Arrow extraction kernel (hypothesis).

The flagship's hottest stage (`kgtk_ray/pipelines/extract.py`) has two
implementations: the row-level spec `extract_html_text` and the
column-level RE2 kernel `_extract_column`.  The fixed adversarial suite
in test_pipeline.py pins known-hard shapes; this generates random tag
soup from a grammar of boilerplate tags, paragraph tags, article
scopes, entities, whitespace runs and stray brackets, and asserts the
two implementations agree byte-for-byte on every page.  Pure-Python
(no Ray session) — the kernel is exercised directly on an Arrow array.
"""
from hypothesis import given, settings
from hypothesis import strategies as st

import pyarrow as pa

from kgtk_ray.pipelines.extract import _extract_column, extract_html_text

# words that can land inside or between tags; includes entity spellings,
# tab/newline runs, multi-space runs, and lone angle brackets
_CHUNK = st.sampled_from([
    "word", "a b", "x  y", "\tz", "q\n", " ", "", "&amp;", "&lt;tag&gt;",
    "&nbsp;", "&#65;", "5 < 6", "7 > 3", "été", "0x00-free",
])

_OPEN = st.sampled_from([
    "<p>", "<P>", "<p class='x'>", "<article>", "<article id=a>",
    "<nav>", "<script>", "<style>", "<footer>", "<header>", "<aside>",
    "<head>", "<div>", "<span>", "<b>",
])

_CLOSE = st.sampled_from([
    "</p>", "</P>", "</p >", "</article>", "</nav>", "</script>",
    "</style>", "</footer>", "</header>", "</aside>", "</head>",
    "</div>", "</span>", "</b>",
])

_TOKEN = st.one_of(_CHUNK, _OPEN, _CLOSE)

PAGE = st.lists(_TOKEN, max_size=40).map("".join)


@settings(max_examples=400, deadline=None)
@given(st.lists(PAGE, min_size=1, max_size=8))
def test_extract_kernel_matches_row_spec_on_tag_soup(pages):
    col = pa.array([p.encode("utf-8") for p in pages], pa.large_binary())
    got = _extract_column(col).to_pylist()
    want = [extract_html_text(p) for p in pages]
    assert got == want, [
        (p, g, w) for p, g, w in zip(pages, got, want) if g != w][:3]


@settings(max_examples=200, deadline=None)
@given(PAGE)
def test_extract_kernel_single_page_utf8_and_binary_agree(page):
    """binary and string input columns produce identical output."""
    as_bin = _extract_column(
        pa.array([page.encode("utf-8")], pa.large_binary())).to_pylist()
    as_str = _extract_column(
        pa.array([page], pa.large_string())).to_pylist()
    assert as_bin == as_str == [extract_html_text(page)]
