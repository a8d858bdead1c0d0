"""Unit tests for the repetition / gopher-filter / dup-ngram / PII ops
with hand-computed expectations (oracle-SQL parity is covered by
scripts/check_correctness.py; these pin the semantics on tiny known
inputs, including block-split independence)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgtk_ray.text import (corpus_dup_ngram_frac, gopher_filter,
                           repetition_signals, scrub_pii, scrub_series)


def _docs(rows, parallelism=2):
    return rd.from_pandas(pd.DataFrame(rows)).repartition(parallelism)


def test_repetition_signals_hand_values():
    ds = _docs([
        {"doc_id": 1, "text": "a b a b a"},
        {"doc_id": 2, "text": "x y z w"},
        {"doc_id": 3, "text": "only"},
    ])
    out = (repetition_signals(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 1: 5 tokens, 2 distinct, top 'a' x3; bigrams: "a b","b a","a b","b a" -> top 2/4
    assert out.n_tokens.tolist() == [5, 4, 1]
    assert out.dup_word_frac.tolist() == pytest.approx([1 - 2 / 5, 0.0, 0.0])
    assert out.top_word_frac.tolist() == pytest.approx([3 / 5, 1 / 4, 1.0])
    assert out.top_bigram_frac.iloc[0] == pytest.approx(2 / 4)
    assert out.top_bigram_frac.iloc[1] == pytest.approx(1 / 3)
    assert np.isnan(out.top_bigram_frac.iloc[2])  # <2 tokens: no bigrams
    assert out.mean_word_len.tolist() == pytest.approx([1.0, 1.0, 4.0])


def test_gopher_filter_thresholds():
    long_ok = " ".join(f"tok{i}" for i in range(30))
    ds = _docs([
        {"doc_id": 1, "text": long_ok},                      # passes
        {"doc_id": 2, "text": "too short"},                  # < min_tokens
        {"doc_id": 3, "text": "a " * 40},                    # mean len 1 < 3
        {"doc_id": 4, "text": ("dup " * 35 + long_ok)},      # dup+top frac high
    ])
    out = gopher_filter(ds, min_tokens=20, max_dup_word_frac=0.5,
                        max_top_word_frac=0.2).to_pandas()
    assert out.doc_id.tolist() == [1]
    # original columns preserved
    assert list(out.columns) == ["doc_id", "text"]


def test_corpus_dup_ngram_frac_cross_doc():
    shared = "alpha beta gamma delta"  # 2 shared trigrams across docs 1,2
    ds = _docs([
        {"doc_id": 1, "text": shared + " one two"},
        {"doc_id": 2, "text": shared + " six seven"},
        {"doc_id": 3, "text": "p q r s t"},
    ], parallelism=3)
    out = (corpus_dup_ngram_frac(ds, k=3, min_docs=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # each of docs 1,2 has 4 trigrams; 'alpha beta gamma' and
    # 'beta gamma delta' occur in both
    assert out.n_grams.tolist() == [4, 4, 3]
    assert out.dup_gram_frac.tolist() == pytest.approx([0.5, 0.5, 0.0])


def test_corpus_dup_ngram_counts_occurrences_not_docs():
    # a gram repeated twice inside one doc is 2 occurrences in the
    # denominator but only 1 containing doc for the threshold
    ds = _docs([
        {"doc_id": 1, "text": "a b c a b c"},   # 'a b c' twice, same doc
        {"doc_id": 2, "text": "u v w x"},
    ])
    out = (corpus_dup_ngram_frac(ds, k=3, min_docs=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.n_grams.tolist() == [4, 2]
    assert out.dup_gram_frac.tolist() == pytest.approx([0.0, 0.0])


def test_scrub_series_patterns():
    s = pd.Series([
        "mail me at jo.doe+x@sub.example.co.uk today",
        "server 192.168.001.1 and 10.0.0.7 up",
        "call +1 (555) 010-9999 now",
        "not-an-ip 1.2.3 and half@nope stays",
    ])
    out = scrub_series(s).tolist()
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "server <IP> and <IP> up"
    assert out[2] == "call <PHONE> now"
    assert out[3] == "not-an-ip 1.2.3 and half@nope stays"


def test_scrub_pii_dataset_out_col():
    ds = _docs([{"doc_id": 1, "text": "x a@b.io y"}], parallelism=1)
    out = scrub_pii(ds, out_col="clean").to_pandas()
    assert out.text.iloc[0] == "x a@b.io y"        # original kept
    assert out.clean.iloc[0] == "x <EMAIL> y"


def test_scrub_ssn_and_credit_cards():
    import pandas as pd
    s = pd.Series([
        "ssn 123-45-6789 here",
        "visa 4111 1111 1111 1111 ok",        # Luhn-valid
        "fake 4111 1111 1111 1112 nope",      # Luhn-invalid: kept
        "amex 378282246310005 ok",            # Luhn-valid, 15 digits
        "order id 123456789012345 stays",     # Luhn-invalid run: kept
        "dashed 5500-0000-0000-0004 ok",      # Luhn-valid, dashes
    ])
    out = scrub_series(s).tolist()
    assert out[0] == "ssn <SSN> here"
    assert out[1] == "visa <CC> ok"
    assert out[2] == "fake 4111 1111 1111 1112 nope"
    assert out[3] == "amex <CC> ok"
    assert out[4] == "order id 123456789012345 stays"
    assert out[5] == "dashed <CC> ok"


def test_scrub_credit_cards_optional():
    import pandas as pd
    s = pd.Series(["visa 4111 1111 1111 1111 ok"])
    assert scrub_series(s, credit_cards=False).tolist() == [
        "visa 4111 1111 1111 1111 ok"]
