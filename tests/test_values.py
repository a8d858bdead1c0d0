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
