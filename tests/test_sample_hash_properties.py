"""Property parity for the vectorized sampling hash (hypothesis).

`string_poly_hash` computes ``sum(byte_i * 31**i) mod 2**31`` over the
column's contiguous Arrow UTF-8 buffer; every_nth's reproducibility
across rounds depends on it matching the documented per-row formula
exactly — including on sliced arrays (non-zero Arrow offset), chunked
arrays and nulls, the buffer-arithmetic edge cases.  Pure-Python, no
Ray session.
"""
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kgtk_ray.ops.sample import string_poly_hash

MOD = 2**31


def row_spec(s: str) -> int:
    h, p = 0, 1
    for b in s.encode("utf-8"):
        h = (h + b * p) % MOD
        p = (p * 31) % MOD
    return h


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=20), st.integers(0, 5))
def test_poly_hash_matches_row_formula_any_offset(strs, slice_from):
    arr = pa.array(strs, pa.string())
    if slice_from and len(arr) > slice_from:
        arr = arr.slice(slice_from)
        strs = strs[slice_from:]
    assert string_poly_hash(arr).tolist() == [row_spec(s) for s in strs]


def test_poly_hash_chunked_and_null():
    ca = pa.chunked_array([pa.array(["ab", None]), pa.array(["", "xyz"])])
    assert string_poly_hash(ca).tolist() == [row_spec("ab"), 0, 0,
                                             row_spec("xyz")]


def test_poly_hash_empty_column():
    assert string_poly_hash(pa.array([], pa.string())).tolist() == []
