"""Fuzz the Arrow-native text kernels against their own DuckDB oracles
on randomized documents (hypothesis).

The driver's correctness gate runs queries() vs oracle_sql() on the
synthetic corpus; this runs the SAME pairs on adversarial generated
text (punctuation runs, CJK, accents, whitespace runs, empty docs,
stopword soup) so the round-5 RE2/`count_substring` tricks in
langid/quality/token_counts/fingerprint are pinned beyond the corpus'
distribution.  Each hypothesis example writes a documents.parquet to
tmp, runs the real query callable on that directory, and compares
cell-exact (floats rounded to 6dp, like the driver) with the oracle
SQL over a view on the same file.
"""
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

QUERIES = ["langid", "quality", "token_counts", "fingerprint"]

# second wave: every other oracle that reads only the documents view
# and consumes its text — corpus-wide ops (span dedup, dup-ngrams,
# unigram LM) included, since at fuzz scale they are cheap
QUERIES2 = ["text_normalize", "repetition", "gopher_filter", "pii_scrub",
            "dup_ngrams", "dedup_spans", "lm_score", "chunk_text",
            "dedup_exact", "c4_lines", "corpus_stats"]

WORD = st.sampled_from([
    "the", "and", "is", "der", "und", "le", "la", "el", "que",
    "word", "Zahl", "été", "naïve", "mañana", "好", "你好世界",
    "x9", "42", "a-b", "don't", "...", "!!", "?", ";;", "—",
    "CamelCase", "UPPER", "mixed123", "_under_", "",
])
GAP = st.sampled_from([" ", "  ", "\t", "\n", " \n ", ""])
TEXT = st.lists(st.tuples(WORD, GAP), max_size=25).map(
    lambda ps: "".join(w + g for w, g in ps))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(TEXT, min_size=1, max_size=12))
def test_text_kernels_match_sql_oracles_on_random_docs(
        ray_session, tmp_path_factory, texts):
    import __ray_entry__ as E

    d = tmp_path_factory.mktemp("fuzzdocs")
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["fuzz"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    for name in QUERIES:
        res = qs[name](str(d))
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        want = con.sql(oracles[name]).df()
        g, w = _norm(got), _norm(want)
        assert g.equals(w), (name, texts,
                             g.to_dict("records")[:3],
                             w.to_dict("records")[:3])


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(TEXT, min_size=2, max_size=10), st.integers(0, 3))
def test_corpus_ops_match_sql_oracles_on_random_docs(
        ray_session, tmp_path_factory, texts, dup_phase):
    """Corpus-wide text ops vs their oracles on random documents.
    Duplicated texts are injected (dup_phase rotates which) so
    dedup_exact / dedup_spans / dup_ngrams see actual duplication."""
    import __ray_entry__ as E

    texts = texts + [texts[dup_phase % len(texts)]]  # guaranteed dup
    d = tmp_path_factory.mktemp("fuzzcorpus")
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "de"][:1] * len(texts), pa.string()),
        "source": pa.array(["s" + str(i % 2) for i in range(len(texts))],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    for name in QUERIES2:
        res = qs[name](str(d))
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        want = con.sql(oracles[name]).df()
        if len(got) == 0 and len(want) == 0:
            continue  # Ray empty results can lose their schema
        g, w = _norm(got), _norm(want)
        assert g.equals(w), (name, texts,
                             g.to_dict("records")[:3],
                             w.to_dict("records")[:3])
