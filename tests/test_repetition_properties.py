"""Property-based checks for the repetition / PII kernels: the
vectorized implementations must agree with naive per-row Python
references on arbitrary generated text, and scrubbing must be
idempotent (a redacted document gains no new matches)."""
from collections import Counter

import hypothesis.strategies as st
import pandas as pd
from hypothesis import given, settings

from kgtk_ray.text.pii import scrub_series
from kgtk_ray.text.repetition import _token_series

WORDS = st.lists(
    st.text(alphabet="abcxyz@.+-0123456789", min_size=1, max_size=6),
    min_size=0, max_size=30)


def naive_signals(text: str):
    toks = text.split()
    n = len(toks)
    if n == 0:
        return 0, 0.0, 0.0
    c = Counter(toks)
    return n, 1.0 - len(c) / n, max(c.values()) / n


@settings(max_examples=200, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=8))
def test_signals_match_naive(rows):
    texts = [" ".join(w) for w in rows]
    s = pd.Series(texts)
    toks = _token_series(s)
    n_tokens = toks.str.len()
    ex = toks.explode().dropna()
    cnt = ex.groupby([ex.index, ex]).size()
    top = cnt.groupby(level=0).max().reindex(s.index, fill_value=0)
    distinct = cnt.groupby(level=0).size().reindex(s.index, fill_value=0)
    for i, t in enumerate(texts):
        n, dupf, topf = naive_signals(t)
        assert n_tokens.iloc[i] == n
        if n:
            assert abs((1.0 - distinct.iloc[i] / n) - dupf) < 1e-12
            assert abs(top.iloc[i] / n - topf) < 1e-12


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(
    alphabet="abz ._@+-()0123456789\n", min_size=0, max_size=60),
    min_size=1, max_size=6))
def test_scrub_matches_naive_re_sub(texts):
    # single-pass semantics (same as the oracle's nested
    # regexp_replace): the vectorized series path must agree with
    # plain per-string re.sub in the same pass order
    import re
    from kgtk_ray.text.pii import _PASSES

    def naive(t: str) -> str:
        for _name, pat, rep in _PASSES:
            t = pat.sub(rep, t)
        return t

    s = pd.Series(texts, dtype=str)
    out = scrub_series(s)
    assert out.tolist() == [naive(t) for t in texts]


def test_scrub_no_residual_email_or_ip():
    s = pd.Series([
        "a@b.co c@d.org back-to-back a@b.co",
        "1.2.3.4 5.6.7.8",
        "nested bob@[1.2.3.4] form",
    ])
    out = scrub_series(s)
    assert not out.str.contains(
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", regex=True).any()
    assert not out.str.contains(
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", regex=True).any()


def naive_signal_frame(text: str):
    """Per-row spec of _signal_frame's five signals."""
    toks = text.split()
    n = len(toks)
    c = Counter(toks)
    bigrams = Counter(zip(toks, toks[1:]))
    n_big = max(len(toks) - 1, 0)
    return {
        "n_tokens": n,
        "dup_word_frac": 1.0 - len(c) / max(n, 1),
        "top_word_frac": (max(c.values()) if c else 0) / max(n, 1),
        "top_bigram_frac": (max(bigrams.values()) / n_big
                            if n_big > 0 else None),
        "mean_word_len": sum(len(t) for t in toks) / max(n, 1),
    }


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab xyz\t\n.0", max_size=40),
                min_size=1, max_size=10))
def test_signal_frame_kernel_matches_naive(texts):
    """The numpy lexsort group-scan kernel (Arrow column in, all five
    signals out) must agree with the per-row spec — including the
    bigram pack (c1 * K + c2) and the empty/one-token edge rows."""
    import math
    import pyarrow as pa
    from kgtk_ray.text.repetition import _signal_frame

    got = _signal_frame(pa.array(texts, pa.large_string()))
    for i, t in enumerate(texts):
        want = naive_signal_frame(t)
        assert got["n_tokens"][i] == want["n_tokens"], t
        for k in ("dup_word_frac", "top_word_frac", "mean_word_len"):
            assert abs(got[k][i] - want[k]) < 1e-12, (k, t)
        g = got["top_bigram_frac"][i]
        if want["top_bigram_frac"] is None:
            assert math.isnan(g), t
        else:
            assert abs(g - want["top_bigram_frac"]) < 1e-12, t
