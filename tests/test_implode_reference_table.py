"""Replay the reference's implode worked example
(/root/reference/docs/transform/implode.md "file2.tsv"): 29 typed rows
covering every data type plus quoting/escaping edge cases (triple
double quotes, raw vs escaped pipes, quoted symbols/numbers, field
strings passed verbatim, date_and_time + precision reconstruction).

This table caught three real divergences when first replayed: dates
must implode from the date_and_time STRING field (not numeric parts,
kgtkimplode.py:365-390), numeric field strings pass verbatim
(implode_number :125-149), and raw pipes in text bodies come out
pipe-escaped (stringify / escape_pipes default).
"""
from __future__ import annotations

import re

import pandas as pd
import pytest
import ray.data as rd

from kgtk_ray.ops import implode_node2

IMPLODE_MD = "/root/reference/docs/transform/implode.md"

_SPLIT = re.compile(r"(?<!\\)\|")


def _split_row(line: str) -> list[str]:
    s = line.strip()
    return [c.strip() for c in _SPLIT.split(s[1:-1])]


def _parse_md_table(lines: list[str], start: int):
    i = start
    while not lines[i].strip().startswith("|"):
        i += 1
    header = _split_row(lines[i])
    i += 2
    rows = []
    while i < len(lines) and lines[i].strip().startswith("|"):
        rows.append(_split_row(lines[i]))
        i += 1
    return header, rows, i


def _unescape_md(c: str) -> str:
    return c.replace("\\|", "|")


@pytest.fixture(scope="module")
def tables():
    lines = open(IMPLODE_MD).read().split("\n")
    anchor = next(i for i, l in enumerate(lines)
                  if "file2.tsv" in l and "Suppose" in l)
    h1, r1, end1 = _parse_md_table(lines, anchor)
    anchor2 = next(i for i in range(end1, len(lines))
                   if "The output will be" in lines[i])
    h2, r2, _ = _parse_md_table(lines, anchor2)
    df = pd.DataFrame([[_unescape_md(c) for c in row] for row in r1],
                      columns=h1)
    exp = pd.DataFrame([[_unescape_md(c) for c in row] for row in r2],
                       columns=h2)
    return df, exp


def test_implode_matches_reference_docs_table(ray_session, tables):
    df, exp = tables
    assert len(df) >= 25  # the table is the exhaustive type matrix
    got = implode_node2(rd.from_pandas(df), "node2",
                        drop_fields=False).to_pandas()
    for i in range(len(exp)):
        want = exp.iloc[i]["node2"]
        have = got.iloc[i]["node2"]
        assert have == want, (exp.iloc[i]["label"], want, have)
