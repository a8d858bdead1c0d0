"""Property-pattern validation — the rule engine of the reference's
``validate-properties`` (/root/reference/kgtk/value/
propertypatternvalidator.py, CLI kgtk/cli/validate-properties.py) as
Ray Data stages.

The pattern table is itself KGTK-shaped: rows
``(prop, pattern_kind, value)`` with kinds

* ``node1_pattern`` / ``node2_pattern`` — regex the node must match
  (reference: PropertyPattern.Action.NODE1_PATTERN / NODE2_PATTERN);
* ``node2_type`` — required KGTK data type of node2 (NODE2_TYPE);
* ``minoccurs`` / ``maxoccurs`` — per-(node1, prop) cardinality bounds
  (reference MINOCCURS/MAXOCCURS, propertypatternvalidator.py
  groupby-per-node1 scan).

Row-level rules are a broadcast dict + vectorized regex per batch
(patterns compiled once per actor); cardinality is a partial-count
``map_batches`` combiner followed by a small ``groupby`` — the shuffle
moves one row per (node1, label, batch), not per edge.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data

from ..values import classify

Dataset = ray.data.Dataset


def _compile_rules(patterns: pd.DataFrame) -> dict[str, dict]:
    rules: dict[str, dict] = {}
    for prop, kind, value in zip(patterns["prop"], patterns["kind"],
                                 patterns["value"]):
        r = rules.setdefault(str(prop), {})
        if kind in ("node1_pattern", "node2_pattern"):
            r[kind] = str(value)
        elif kind == "node2_type":
            r[kind] = str(value)
        elif kind in ("minoccurs", "maxoccurs"):
            r[kind] = int(value)
    return rules


class _RowValidator:
    """Actor-pool stage: regexes compiled once in __init__ (per actor),
    applied vectorized per batch."""

    def __init__(self, rules: dict[str, dict]):
        self.rules = {
            p: {
                **r,
                "_n1re": re.compile(r["node1_pattern"]) if "node1_pattern" in r else None,
                "_n2re": re.compile(r["node2_pattern"]) if "node2_pattern" in r else None,
            }
            for p, r in rules.items()
        }

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ok = np.ones(len(df), dtype=bool)
        reasons = np.full(len(df), "", dtype=object)
        labels = df["label"].astype(str)
        for prop, r in self.rules.items():
            m = (labels == prop).to_numpy()
            if not m.any():
                continue
            if r["_n1re"] is not None:
                bad = m & ~df["node1"].astype(str).str.match(r["_n1re"]).to_numpy()
                reasons[bad & ok] = "node1_pattern"
                ok &= ~bad
            if r["_n2re"] is not None:
                bad = m & ~df["node2"].astype(str).str.match(r["_n2re"]).to_numpy()
                reasons[bad & ok] = "node2_pattern"
                ok &= ~bad
            if "node2_type" in r:
                types = classify(df["node2"].astype(str))
                bad = m & (types != r["node2_type"])
                reasons[bad & ok] = "node2_type"
                ok &= ~bad
        df = df.copy()
        df["_ok"] = ok
        df["reason"] = reasons
        return df


def validate_properties(
    edges: Dataset,
    patterns: pd.DataFrame,
    *,
    emit: str = "pass",
) -> Dataset:
    """Validate edges against a property-pattern table.

    ``emit='pass'`` returns conforming rows, ``'reject'`` returns
    violating rows with a ``reason`` column (the reference's
    PASS/EXCLUDE/REPORT action subset, kgtk/io/kgtkreader.py:742-767).
    Cardinality bounds add one small groupby on (node1, label).
    """
    rules = _compile_rules(patterns)
    checked = edges.map_batches(
        _RowValidator, fn_constructor_args=(rules,),
        batch_format="pandas", concurrency=(1, 8))

    card = {p: r for p, r in rules.items()
            if "minoccurs" in r or "maxoccurs" in r}
    if card:
        # partial count inside batches, then a small global groupby
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df["label"].isin(card) & df["_ok"]]
            if sub.empty:
                return pd.DataFrame({"node1": pd.Series([], dtype=str),
                                     "label": pd.Series([], dtype=str),
                                     "c": pd.Series([], dtype="int64")})
            g = sub.groupby(["node1", "label"], as_index=False).size()
            return g.rename(columns={"size": "c"})

        from .agg import grouped_aggregate
        counts = grouped_aggregate(
            checked.map_batches(partial, batch_format="pandas"),
            ["node1", "label"], {"n": ("c", "sum")})
        cdf = counts.to_pandas()
        bad_keys: set[tuple[str, str]] = set()
        for prop, r in card.items():
            sub = cdf[cdf["label"] == prop]
            lo = r.get("minoccurs", 0)
            hi = r.get("maxoccurs", np.inf)
            viol = sub[(sub["n"] < lo) | (sub["n"] > hi)]
            bad_keys.update(zip(viol["node1"].astype(str), viol["label"]))
        bad_ref = ray.put(bad_keys)

        def apply_card(df: pd.DataFrame) -> pd.DataFrame:
            bad = ray.get(bad_ref) if isinstance(bad_ref, ray.ObjectRef) else bad_ref
            keys = list(zip(df["node1"].astype(str), df["label"].astype(str)))
            mask = np.array([k in bad for k in keys])
            df = df.copy()
            df.loc[mask & df["_ok"], "reason"] = "cardinality"
            df.loc[mask, "_ok"] = False
            return df

        checked = checked.map_batches(apply_card, batch_format="pandas")

    if emit == "pass":
        return (checked.filter(expr="_ok == True")
                .drop_columns(["_ok", "reason"]))
    return checked.filter(expr="_ok == False").drop_columns(["_ok"])
