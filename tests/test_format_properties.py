"""Property-based round-trip tests for the KGTK format layer
(hypothesis).  These are pure-Python (no Ray session) and pin the
invariants the vectorized operators rely on: stringify/unstringify and
list join/split must round-trip arbitrary text, and value
classification must be total (never raise) on arbitrary cells.
"""
from hypothesis import given, settings
from hypothesis import strategies as st

from kgtk_ray.format import (
    join_list,
    split_list,
    stringify,
    unstringify,
)

# any unicode text, including the escape-relevant control chars
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_stringify_unstringify_roundtrip(s):
    assert unstringify(stringify(s)) == s


@settings(max_examples=300, deadline=None)
@given(st.lists(TEXT.map(lambda s: s.replace("|", "")
                         .replace("\\", "")).filter(bool),
                min_size=1, max_size=6))
def test_list_join_split_roundtrip(values):
    # list cells hold KGTK values, which never contain raw | or \
    # (those are escaped at the value layer); join/split must be exact
    # inverses on that domain
    assert split_list(join_list(values)) == values


@settings(max_examples=300, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_value_classification_is_total(cells):
    # the vectorized classifier/validator must be total on arbitrary
    # cells: every cell gets a non-empty kind, validation never raises
    import numpy as np

    from kgtk_ray.values import classify, validate

    kinds = classify(np.array(cells, dtype=object))
    assert len(kinds) == len(cells) and all(isinstance(k, str) and k
                                            for k in kinds)
    ok = validate(np.array(cells, dtype=object))
    assert len(ok) == len(cells)
