"""Regression: semi/anti joins on non-string key columns.

Both sides of every key comparison must render through the single
Arrow key renderer.  Before the fix, ifexists' broadcast path rendered
the filter side with pandas astype(str) ("1.0"/"True") and the input
side with Arrow cast ("1"/"true"), so a float- or bool-keyed semi-join
silently kept nothing (anti kept everything).  Covers the broadcast
path, the large bucketed path (BROADCAST_LIMIT monkeypatched to 0),
and kgtk_join's broadcast path.
"""
import pandas as pd
import pytest
import ray.data as rd

import kgtk_ray.ops.shuffle as S
from kgtk_ray.ops import ifexists, ifnotexists, kgtk_join


def _mk(vals, col="k"):
    return rd.from_pandas(pd.DataFrame({col: vals,
                                        "payload": range(len(vals))}))


@pytest.mark.parametrize("vals,keep", [
    ([1.0, 2.5, 3.0, 4.25], [1.0, 4.25]),          # float keys
    ([True, False, True, False], [True]),           # bool keys
    ([10, 20, 30, 40], [20, 40]),                   # int keys
    (["a", "b", "c", "d"], ["b", "c"]),             # string keys
])
def test_ifexists_nonstring_keys_broadcast(ray_session, vals, keep):
    expect = [v for v in vals if v in set(keep)]    # every matching row
    got = ifexists(_mk(vals), _mk(keep),
                   input_keys=["k"], filter_keys=["k"]).to_pandas()
    assert sorted(map(str, got["k"])) == sorted(map(str, expect))
    anti = ifnotexists(_mk(vals), _mk(keep),
                       input_keys=["k"], filter_keys=["k"]).to_pandas()
    assert len(anti) == len(vals) - len(expect)


def test_ifexists_float_keys_large_path(ray_session, monkeypatch):
    monkeypatch.setattr(S, "BROADCAST_LIMIT", 0)
    vals, keep = [1.0, 2.5, 3.0, 4.25], [1.0, 4.25]
    got = ifexists(_mk(vals), _mk(keep),
                   input_keys=["k"], filter_keys=["k"]).to_pandas()
    assert sorted(got["k"].tolist()) == sorted(keep)


def test_join_float_keys(ray_session):
    left = _mk([1.0, 2.5, 3.0])
    right = _mk([2.5, 3.0, 9.0])
    inner = kgtk_join(left, right, join_on=["k"],
                      right_join_on=["k"]).to_pandas()
    # filtered-union inner join: rows from BOTH files whose key is in
    # the intersection {2.5, 3.0}
    assert sorted(inner["k"].tolist()) == [2.5, 2.5, 3.0, 3.0]
