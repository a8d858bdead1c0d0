"""Driver-contract smoke tests for __ray_entry__ (the real correctness
gate is scripts/check_correctness.py, run out-of-band; here we verify the
contract shape and a couple of fast oracle matches)."""
import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entry_runs():
    ds = E.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert len(df) > 0
    assert {"id", "node1", "label", "node2"} <= set(df.columns)


def test_contract_shape():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 25


@pytest.mark.parametrize("name", ["unique", "add_id", "normalize_nodes"])
def test_fast_oracle_match(name):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    got = E.queries()[name](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(E.oracle_sql()[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
    w = want[cols].astype(str).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)
