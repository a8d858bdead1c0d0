"""Fuzz the window operators against their DuckDB oracles on random
event tables (hypothesis).

tumbling/sliding are bucket arithmetic; session_window is
gaps-and-islands where the boundary semantics live in the edges this
generates deliberately: gaps of EXACTLY the 1800 s threshold (no
break — the oracle breaks strictly greater), gaps one microsecond
over, tied timestamps within a user, single-event users, and events
far apart.  Each example writes an events.parquet to tmp, runs the
real queries() callables on that directory, and compares cell-exact
with oracle_sql() over a DuckDB view on the same file.
"""
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

QUERIES = ["tumbling_window", "sliding_window", "session_window"]

# offsets (integer MICROSECONDS) between consecutive events of a user:
# exact threshold, one-us-over/under, zero (tie), tiny, huge
_US = 1_000_000
GAP_US = st.sampled_from([0, 1, _US, int(59.9 * _US), 1800 * _US,
                          1800 * _US + 1, 1800 * _US - 1,
                          3600 * _US, 86400 * _US])
USER_EVENTS = st.lists(GAP_US, min_size=1, max_size=8)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@settings(max_examples=8, deadline=None)
@given(st.lists(USER_EVENTS, min_size=1, max_size=5),
       st.integers(min_value=0, max_value=3))
def test_windows_match_sql_oracles_on_random_events(
        ray_session, tmp_path_factory, per_user, phase):
    import __ray_entry__ as E

    base = pd.Timestamp("2024-03-01 00:00:00") + pd.Timedelta(
        microseconds=phase * 977_300_123)
    rows = []
    eid = 0
    for uid, gaps in enumerate(per_user):
        t = base + pd.Timedelta(microseconds=uid * 7_500_000)
        for g in gaps:
            t = t + pd.Timedelta(microseconds=g)
            rows.append((eid, t, uid, "click", float(eid % 5), "{}"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    d = tmp_path_factory.mktemp("fuzzevents")
    pq.write_table(pa.Table.from_pandas(
        df, preserve_index=False).cast(pa.schema([
            ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()), ("event_type", pa.string()),
            ("value", pa.float64()), ("props", pa.string())])),
        os.path.join(str(d), "events.parquet"))

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    for name in QUERIES:
        res = qs[name](str(d))
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        want = con.sql(oracles[name]).df()
        g, w = _norm(got), _norm(want)
        assert g.equals(w), (name, len(g), len(w),
                             g.to_dict("records")[:4],
                             w.to_dict("records")[:4])
