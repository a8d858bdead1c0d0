"""KGTK value-grammar conformance (FIXTURES.md F6)."""
import numpy as np
import pytest

from kgtk_ray import values as V


CASES = [
    ("", "empty", True),
    ("Wikipedia|IMDB", "list", True),
    ("1", "number", True),
    ("42", "number", True),
    ("3.14e-10", "number", True),
    ("0xff", "quantity", False),  # reference: strict number grammar excludes hex -> quantity, invalid
    ("+17", "number", True),
    (".5", "number", True),
    ("10m", "quantity", True),
    ("-1.2e+2[-1.0,+1.0]kg.m/s2", "quantity", True),
    ("+17.2Q494083", "quantity", True),
    ('"John Doe"', "string", True),
    ('"tab\\tpipe\\|quote\\""', "string", True),
    ("'Sprechen sie deutsch?'@de", "language_qualified_string", True),
    ("'x'@en-gb", "language_qualified_string", True),
    ("@043.26193/010.92708", "location_coordinates", True),
    ("@91.0/200.0", "location_coordinates", False),
    ("^2020-02-24T17:05:30", "date_and_times", True),
    # month zero invalid (repairable), year<1583 out of range,
    # extensions reserved-invalid: KgtkValueOptions strict defaults
    ("^1839-00-00T00:00:00Z/9", "date_and_times", False),
    ("^2020-13-45", "date_and_times", False),
    ("True", "boolean", True),
    ("False", "boolean", True),
    ("Q42", "symbol", True),
    ("!ext", "extension", False),
    ("hello_world", "symbol", True),
    # sigil dispatch (reference classify is first-char only;
    # validity is a separate check)
    ('"unterminated', "string", False),
    ("@not/coords", "location_coordinates", False),
    ("^junk", "date_and_times", False),
]


def test_classify_and_validate():
    vals = np.array([c[0] for c in CASES], dtype=object)
    types = V.classify(vals)
    valid = V.validate(vals)
    for (v, want_t, want_ok), got_t, got_ok in zip(CASES, types, valid):
        assert got_t == want_t, f"{v!r}: {got_t} != {want_t}"
        assert bool(got_ok) == want_ok, f"{v!r}: valid={got_ok} != {want_ok}"


def test_repair_dates_and_coords():
    out = V.repair(np.array(["^1839-00-00T00:00:00Z/9", "@91.0/200.0",
                             "^1839-05-00"], dtype=object))
    assert out[0] == "^1839-01-01T00:00:00Z/9"
    assert out[1] == "@90/-160"
    assert out[2] == "^1839-05-01"


def test_explode_implode_roundtrip():
    vals = np.array(["1", "10m", '"hi"', "'x'@en", "@10/20",
                     "^2020-02-24T17:05:30", "True", "Q42"], dtype=object)
    df = V.explode_fields(vals)
    back = V.implode_fields(df)
    assert list(back) == ["1", "10m", '"hi"', "'x'@en", "@10/20",
                          "^2020-02-24T17:05:30", "True", "Q42"]


def test_explode_fields_content():
    df = V.explode_fields(np.array(["-1.2e+2[-1.0,+1.0]kg.m/s2",
                                    "'abc'@en-gb", "@1.5/-2.5",
                                    "^1999-12-31T23:59:59Z/11"], dtype=object))
    q = df.iloc[0]
    assert q["number"] == -120.0 and q["low_tolerance"] == -1.0
    assert q["si_units"] == "kg.m/s2"
    s = df.iloc[1]
    assert s["text"] == "abc" and s["language"] == "en" and s["language_suffix"] == "gb"
    c = df.iloc[2]
    assert c["latitude"] == 1.5 and c["longitude"] == -2.5
    d = df.iloc[3]
    assert d["year"] == 1999 and d["precision"] == 11 and d["zonestr"] == "Z"


# --- KgtkValueOptions lax/repair matrix (kgtk/value/kgtkvalueoptions.py:
# 15-105; reference-parity fuzzed in scripts/check_values_vs_reference.py
# across 17 option combos incl. repaired values) ---

def test_options_lax_strings():
    from kgtk_ray.values import ValueOptions, validate_with_options
    vals = ['"unescaped "quote""']
    ok, _ = validate_with_options(vals, ValueOptions())
    assert not ok[0]
    ok, _ = validate_with_options(vals, ValueOptions(allow_lax_strings=True))
    assert ok[0]


def test_options_wikidata_lq():
    from kgtk_ray.values import ValueOptions, validate_with_options
    vals = ["'x'@nan-x-hokkien", "'x'@classicalchinese"]
    ok, _ = validate_with_options(vals, ValueOptions())
    assert not ok.any()
    ok, _ = validate_with_options(
        vals, ValueOptions(allow_wikidata_lq_strings=True))
    assert ok.all()


def test_options_month_day_zero_repair():
    from kgtk_ray.values import ValueOptions, validate_with_options
    vals = ["^1839-00-00T00:00:00Z/9"]
    ok, _ = validate_with_options(vals, ValueOptions())
    assert not ok[0]
    ok, _ = validate_with_options(
        vals, ValueOptions(allow_month_or_day_zero=True))
    assert ok[0]
    ok, rep = validate_with_options(
        vals, ValueOptions(repair_month_or_day_zero=True))
    assert ok[0] and rep[0] == "^1839-01-01T00:00:00Z/9"


def test_options_end_of_day():
    from kgtk_ray.values import ValueOptions, validate_with_options
    ok, _ = validate_with_options(["^2020-01-01T24:00:00"], ValueOptions())
    assert ok[0]  # default allow_end_of_day=True
    ok, _ = validate_with_options(["^2020-01-01T24:00:00"],
                                  ValueOptions(allow_end_of_day=False))
    assert not ok[0]
    # 24:30 invalid regardless
    ok, _ = validate_with_options(["^2020-01-01T24:30"], ValueOptions())
    assert not ok[0]


def test_options_coordinates():
    from kgtk_ray.values import ValueOptions, validate_with_options
    sci = ["@1.5e1/-3.0e1"]
    ok, _ = validate_with_options(sci, ValueOptions())
    assert not ok[0]
    ok, _ = validate_with_options(sci, ValueOptions(allow_lax_coordinates=True))
    assert ok[0]
    ok, rep = validate_with_options(
        sci, ValueOptions(repair_lax_coordinates=True))
    assert ok[0] and rep[0] == "@0015.000000/-030.000000"
    wrap = ["@0.0/200.0"]
    ok, rep = validate_with_options(wrap, ValueOptions(modulo_repair_lon=True))
    assert ok[0] and rep[0] == "@0.0/-160.0"
    clamp = ["@95.0/0.0"]
    ok, rep = validate_with_options(
        clamp, ValueOptions(clamp_maximum_lat=True))
    assert ok[0] and rep[0] == "@90.0/0.0"


def test_options_year_clamp():
    from kgtk_ray.values import ValueOptions, validate_with_options
    vals = ["^1500-01-01", "^2200-01-01"]
    ok, _ = validate_with_options(vals, ValueOptions())
    assert not ok.any()
    ok, rep = validate_with_options(
        vals, ValueOptions(clamp_minimum_year=True, clamp_maximum_year=True))
    assert ok.all()
    assert rep[0] == "^1583-01-01" and rep[1] == "^2100-01-01"
    ok, rep = validate_with_options(
        vals, ValueOptions(ignore_minimum_year=True, ignore_maximum_year=True))
    assert ok.all() and rep[0] == "^1500-01-01"


def test_options_lax_qnodes():
    from kgtk_ray.values import ValueOptions, validate_with_options
    vals = ["17Q42_b", "12Q007"]
    ok, _ = validate_with_options(vals, ValueOptions())
    assert not ok.any()
    ok, _ = validate_with_options(vals, ValueOptions(allow_lax_qnodes=True))
    assert ok.all()


def test_clean_edges_with_options(ray_session):
    import pandas as pd
    import ray.data
    from kgtk_ray.ops import clean_edges
    from kgtk_ray.values import ValueOptions
    df = pd.DataFrame({
        "node1": ["a", "b", "c"], "label": "p",
        "node2": ["^1839-00-00", "^2020-01-01", "^1500-01-01"]})
    out = clean_edges(
        ray.data.from_pandas(df),
        options=ValueOptions(repair_month_or_day_zero=True,
                             clamp_minimum_year=True)).to_pandas()
    assert sorted(out.node2) == ["^1583-01-01", "^1839-01-01", "^2020-01-01"]
