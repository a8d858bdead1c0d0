"""Property-pattern validation — the rule engine of the reference's
``validate-properties`` (/root/reference/kgtk/value/
propertypatternvalidator.py, CLI kgtk/cli/validate-properties.py) as
Ray Data stages.

The pattern table is KGTK-shaped: rows ``(prop, kind, value)``; rows
with the same (prop, kind) and ``|``-separated values aggregate into
lists.  Supported kinds (reference Action enum, :220-295):

* row-level, vectorized per batch (regexes compiled once per actor):
  ``node1_type`` / ``node2_type`` / ``node2_not_type`` (KGTK datatype
  lists), ``node1_values`` / ``node2_values`` / ``node2_not_values``,
  ``node1_pattern`` / ``node2_pattern`` / ``node2_not_pattern`` /
  ``label_pattern`` / ``id_pattern`` / ``id_not_pattern`` (full-match,
  :1147-1183), ``node1_is_valid`` / ``node2_is_valid``,
  ``node2_blank`` / ``node2_not_blank`` / ``id_blank`` /
  ``id_not_blank`` (:1186-1208), numeric ranges ``minval`` / ``maxval``
  / ``greater_than`` / ``less_than`` / ``equal_to`` / ``not_equal_to``
  (non-numeric node2 fails, :1218-1352), date ranges ``mindate`` /
  ``maxdate`` / ``greater_than_date`` / ``less_than_date`` /
  ``equal_to_date`` / ``not_equal_to_date`` (:1354-1461), ``reject``;
* structure: ``isa`` (row must conform to ALL listed datatypes'
  rules, transitively — :1829-1869), ``switch`` (first case whose
  row-level rules pass matches; no case -> invalid.  Deviation: the
  reference re-runs group-level checks per case, :1871-1960; here
  switch matching is row-level only);
* per-``node1``-group (one distributed count + per-bucket rule scan):
  ``minoccurs`` / ``maxoccurs``, ``mustoccur`` (groups missing the
  prop have all rows rejected), ``requires`` / ``prohibits``
  (:841-874);
* global: ``mindistinct`` / ``maxdistinct`` (distinct node2 count per
  prop over the whole dataset, :851-861);
* chain: ``node2_chain`` / ``id_chain`` — the value must appear as a
  node1 whose matched datatypes (prop + isa closure of its valid rows)
  intersect the listed datatypes (:875-884, :1463-1489).

Scale shape: row rules are one stateless actor-pool pass; group rules
are a partial-count combiner + one bucketed shuffle on node1; distinct
is a bucketed distinct + tiny per-prop count; chains are distributed
anti-joins on the value column.  Nothing edge-sized reaches the
driver.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..format import split_list
from ..values import classify, explode_fields, validate

Dataset = ray.data.Dataset

_LIST_KINDS = {
    "node1_type", "node2_type", "node2_not_type", "node1_values",
    "node2_values", "node2_not_values", "isa", "switch", "requires",
    "prohibits", "node2_chain", "id_chain", "equal_to", "not_equal_to",
    "equal_to_date", "not_equal_to_date",
}
_PATTERN_KINDS = {"node1_pattern", "node2_pattern", "node2_not_pattern",
                  "label_pattern", "id_pattern", "id_not_pattern"}
_NUM_KINDS = {"minval", "maxval", "greater_than", "less_than",
              "minoccurs", "maxoccurs", "mindistinct", "maxdistinct"}
_TRUTH_KINDS = {"node1_is_valid", "node2_is_valid", "node2_blank",
                "node2_not_blank", "id_blank", "id_not_blank",
                "mustoccur", "reject"}
_DATE_KINDS = {"mindate", "maxdate", "greater_than_date",
               "less_than_date"}


def compile_rules(patterns: pd.DataFrame) -> dict[str, dict]:
    """Pattern table -> {prop_or_datatype: {kind: parsed value}}."""
    rules: dict[str, dict] = {}
    for prop, kind, value in zip(patterns["prop"], patterns["kind"],
                                 patterns["value"]):
        kind = str(kind)
        r = rules.setdefault(str(prop), {})
        if kind in _LIST_KINDS:
            r.setdefault(kind, [])
            r[kind].extend(split_list(str(value)))
        elif kind in _PATTERN_KINDS:
            r.setdefault(kind, [])
            r[kind].append(str(value))
        elif kind in _NUM_KINDS:
            r[kind] = float(value)
        elif kind in _TRUTH_KINDS:
            r[kind] = str(value) in ("True", "true", "1")
        elif kind in _DATE_KINDS:
            r[kind] = str(value)
        else:
            raise ValueError(f"unknown pattern kind {kind!r} for {prop!r}")
    return rules


def _isa_closure(rules: dict[str, dict], prop: str) -> list[str]:
    """prop + transitive isa parents (cycle-safe, depth-first order)."""
    out: list[str] = []
    stack = [prop]
    seen: set[str] = set()
    while stack:
        p = stack.pop(0)
        if p in seen:
            continue
        seen.add(p)
        out.append(p)
        stack.extend(rules.get(p, {}).get("isa", []))
    return out


def _date_key(values: list[str] | str) -> np.ndarray | str:
    """Comparable form of a ^date string: strip the sigil, keep ISO text
    (lexicographically ordered)."""
    if isinstance(values, str):
        return values.lstrip("^")
    return np.asarray([v.lstrip("^") for v in values], dtype=object)


class _RowValidator:
    """Actor-pool stage: rules and regexes compiled once per actor in
    ``__init__``; ``__call__`` marks each row with ``_ok``, a
    ``reason`` and the ``|``-joined matched datatype list (prop + isa
    closure + matched switch cases) used by the chain phase."""

    def __init__(self, rules: dict[str, dict]):
        self.rules = rules
        self.regex = {
            (p, k): [re.compile(x) for x in r[k]]
            for p, r in rules.items() for k in _PATTERN_KINDS if k in r
        }

    # -- single-datatype row-level check over a masked sub-frame --
    def _check_dt(self, df: pd.DataFrame, m: np.ndarray, dt: str,
                  ok: np.ndarray, reasons: np.ndarray,
                  mark: bool = True) -> np.ndarray:
        """Apply datatype ``dt``'s row rules to rows selected by ``m``;
        returns the per-row pass mask (full length).  When ``mark``,
        failures update ok/reasons in place."""
        r = self.rules.get(dt, {})
        passed = np.ones(len(df), dtype=bool)

        def fail(bad: np.ndarray, why: str) -> None:
            nonlocal passed
            bad = bad & m
            passed &= ~bad
            if mark:
                first = bad & ok
                reasons[first] = why
                ok[bad] = False

        if r.get("reject"):
            fail(m.copy(), f"reject:{dt}")
            return passed

        cols = {"node1": df["node1"].astype(str),
                "label": df["label"].astype(str),
                "node2": df["node2"].astype(str)}
        if "id" in df.columns:
            cols["id"] = df["id"].fillna("").astype(str)

        for col, pre in (("node1", "node1"), ("node2", "node2"),
                         ("label", "label"), ("id", "id")):
            if col not in cols:
                continue
            s = cols[col]
            # type lists
            tk = f"{pre}_type"
            if tk in r:
                types = classify(s.to_numpy())
                fail(~np.isin(types, r[tk]), tk)
            ntk = f"{pre}_not_type"
            if ntk in r:
                types = classify(s.to_numpy())
                fail(np.isin(types, r[ntk]), ntk)
            # value lists
            vk = f"{pre}_values"
            if vk in r:
                fail(~s.isin(set(r[vk])).to_numpy(), vk)
            nvk = f"{pre}_not_values"
            if nvk in r:
                fail(s.isin(set(r[nvk])).to_numpy(), nvk)
            # full-match patterns (inclusion = any matches; exclusion =
            # none may match), reference :1147-1183
            pk = f"{pre}_pattern"
            if (dt, pk) in self.regex:
                hit = np.zeros(len(df), dtype=bool)
                for rx in self.regex[(dt, pk)]:
                    hit |= s.str.fullmatch(rx).to_numpy()
                fail(~hit, pk)
            npk = f"{pre}_not_pattern"
            if (dt, npk) in self.regex:
                hit = np.zeros(len(df), dtype=bool)
                for rx in self.regex[(dt, npk)]:
                    hit |= s.str.fullmatch(rx).to_numpy()
                fail(hit, npk)
            # blank / not blank (truth-flagged)
            bk = f"{pre}_blank"
            if bk in r:
                empty = (s == "").to_numpy()
                fail(~empty if r[bk] else empty, bk)
            nbk = f"{pre}_not_blank"
            if nbk in r:
                empty = (s == "").to_numpy()
                fail(empty if r[nbk] else ~empty, nbk)
            # KGTK validity
            ivk = f"{pre}_is_valid"
            if r.get(ivk):
                fail(~validate(s.to_numpy()), ivk)

        # numeric / date rules target node2
        num_kinds = [k for k in ("minval", "maxval", "greater_than",
                                 "less_than", "equal_to", "not_equal_to")
                     if k in r]
        date_kinds = [k for k in ("mindate", "maxdate",
                                  "greater_than_date", "less_than_date",
                                  "equal_to_date", "not_equal_to_date")
                     if k in r]
        if num_kinds or date_kinds:
            fields = explode_fields(cols["node2"].to_numpy())
            if num_kinds:
                num = fields["number"].to_numpy(dtype=float)
                isnum = np.isin(fields["data_type"], ["number", "quantity"]) \
                    & fields["valid"].to_numpy(dtype=bool)
                for k in num_kinds:
                    if k == "minval":
                        bad = ~isnum | (num < r[k])
                    elif k == "maxval":
                        bad = ~isnum | (num > r[k])
                    elif k == "greater_than":
                        bad = ~isnum | (num <= r[k])
                    elif k == "less_than":
                        bad = ~isnum | (num >= r[k])
                    elif k == "equal_to":
                        bad = ~isnum | ~np.isin(num, [float(x) for x in r[k]])
                    else:  # not_equal_to
                        bad = ~isnum | np.isin(num, [float(x) for x in r[k]])
                    fail(np.asarray(bad, dtype=bool), k)
            if date_kinds:
                isdate = (fields["data_type"] == "date_and_times") \
                    & fields["valid"].to_numpy(dtype=bool)
                key = cols["node2"].str.lstrip("^").to_numpy(dtype=object)
                for k in date_kinds:
                    if k == "mindate":
                        bad = ~isdate | (key < _date_key(r[k]))
                    elif k == "maxdate":
                        bad = ~isdate | (key > _date_key(r[k]))
                    elif k == "greater_than_date":
                        bad = ~isdate | (key <= _date_key(r[k]))
                    elif k == "less_than_date":
                        bad = ~isdate | (key >= _date_key(r[k]))
                    elif k == "equal_to_date":
                        bad = ~isdate | ~np.isin(key, _date_key(r[k]))
                    else:
                        bad = ~isdate | np.isin(key, _date_key(r[k]))
                    fail(bad.astype(bool), k)
        return passed

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ok = np.ones(len(df), dtype=bool)
        reasons = np.full(len(df), "", dtype=object)
        matched = np.full(len(df), "", dtype=object)
        labels = df["label"].astype(str).to_numpy()

        for prop in self.rules:
            m = labels == prop
            if not m.any():
                continue
            # isa: conform to ALL closure datatypes (reference :1829)
            closure = _isa_closure(self.rules, prop)
            for dt in closure:
                self._check_dt(df, m, dt, ok, reasons)
            matched[m] = "|".join(closure)
            # switch: first case whose row rules pass (reference :1871)
            cases = self.rules[prop].get("switch", [])
            if cases:
                unmatched = m.copy()
                for case in cases:
                    case_closure = _isa_closure(self.rules, case)
                    trial = np.ones(len(df), dtype=bool)
                    for dt in case_closure:
                        trial &= self._check_dt(df, unmatched, dt, ok,
                                                reasons, mark=False)
                    hit = unmatched & trial
                    if hit.any():
                        cstr = "|".join(case_closure)
                        matched[hit] = np.array(
                            [v + "|" + cstr for v in matched[hit]],
                            dtype=object)
                    unmatched &= ~hit
                bad = unmatched & ok
                reasons[bad] = "switch"
                ok &= ~unmatched

        df = df.copy()
        df["_ok"] = ok
        df["reason"] = reasons
        df["_matched"] = matched
        return df


from ._bucket import schema_pa_fields as _schema_pa_fields  # noqa: E402


def _group_phase(checked: Dataset, rules: dict[str, dict],
                 num_partitions: int) -> Dataset:
    """minoccurs / maxoccurs / mustoccur / requires / prohibits: one
    distributed (node1, label) count, then a per-node1 bucketed rule
    scan emitting one violation row per bad node1."""
    group_props = {p: r for p, r in rules.items()
                   if any(k in r for k in ("minoccurs", "maxoccurs",
                                           "requires", "prohibits"))}
    must_props = [p for p, r in rules.items() if r.get("mustoccur")]
    if not group_props and not must_props:
        return checked
    # consumed three times below (schema, partial counts, verdict join)
    # — pin it so the row phase doesn't re-execute per consumer
    checked = checked.materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["_ok"]]
        g = sub.groupby(["node1", "label"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    from ._bucket import bucketed_group_apply, bucketed_join
    from .agg import grouped_aggregate

    counts = grouped_aggregate(
        checked.map_batches(partial, batch_format="pandas"),
        ["node1", "label"], {"n": ("c", "sum")},
        num_buckets=num_partitions)

    rref = ray.put((group_props, must_props))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        gp, mp = ray.get(rref)
        rows = []
        for node1, sub in df.groupby("node1", sort=False):
            have = dict(zip(sub["label"], sub["n"]))
            bad_props: list[str] = []
            whole = False
            for p in mp:
                if p not in have:
                    whole = True
            for p, r in gp.items():
                n = have.get(p, 0)
                if n == 0 and "minoccurs" not in r:
                    continue
                if n == 0 and r.get("minoccurs", 0) > 0:
                    # zero valid occurrences: there are no rows of this
                    # prop to mark, so reject the whole group (reference
                    # reports it via report_occurance_violations,
                    # propertypatternvalidator.py:2104)
                    whole = True
                    continue
                if n < r.get("minoccurs", 0) or n > r.get("maxoccurs",
                                                          np.inf):
                    bad_props.append(p)
                    continue
                if n > 0 and any(q not in have for q in r.get("requires",
                                                              [])):
                    bad_props.append(p)
                    continue
                if n > 0 and any(q in have for q in r.get("prohibits", [])):
                    bad_props.append(p)
            if bad_props or whole:
                rows.append((node1, "|".join(sorted(set(bad_props))),
                             int(whole)))
        return pd.DataFrame(rows, columns=["node1", "bad", "whole"])

    viol = bucketed_group_apply(counts, ["node1"], scan,
                                num_buckets=num_partitions)

    # left_fields from the actual schema so extra input columns
    # (e.g. 'node1;label', 'source') survive the group-rule join
    joined = bucketed_join(
        checked, viol, "node1",
        left_fields=_schema_pa_fields(checked),
        right_fields={"node1": pa.string(), "bad": pa.string(),
                      "whole": pa.int64()},
        how="left", num_buckets=num_partitions)

    def apply_viol(df: pd.DataFrame) -> pd.DataFrame:
        bad = df["bad"].fillna("")
        whole = df["whole"].fillna(0).astype(bool)
        labels = df["label"].astype(str)
        hit = whole.to_numpy()
        for i, (b, lab) in enumerate(zip(bad, labels)):
            if b and lab in b.split("|"):
                hit[i] = True
        out = df.drop(columns=["bad", "whole"]).copy()
        out["_ok"] = out["_ok"].astype(bool)  # left join may objectify
        first = hit & out["_ok"].to_numpy()
        out.loc[first, "reason"] = "occurs"
        out.loc[hit, "_ok"] = False
        out["_ok"] = out["_ok"].astype(bool)
        return out

    return joined.map_batches(apply_viol, batch_format="pandas")


def _distinct_phase(checked: Dataset, rules: dict[str, dict],
                    num_partitions: int) -> Dataset:
    props = {p: r for p, r in rules.items()
             if "mindistinct" in r or "maxdistinct" in r}
    if not props:
        return checked

    from ._bucket import bucketed_group_apply
    from .agg import grouped_aggregate

    pref = ray.put(set(props))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(pref)
        sub = df[df["label"].isin(want) & df["_ok"]]
        return sub[["label", "node2"]].drop_duplicates()

    distinct = bucketed_group_apply(
        checked.map_batches(partial, batch_format="pandas"),
        ["label", "node2"], lambda df: df.drop_duplicates(),
        num_buckets=num_partitions)
    counts = grouped_aggregate(
        distinct.map_batches(
            lambda df: df.groupby("label", as_index=False).size()
            .rename(columns={"size": "c"}), batch_format="pandas"),
        ["label"], {"n": ("c", "sum")}).to_pandas()

    bad = set()
    for p, r in props.items():
        n = int(counts.loc[counts["label"] == p, "n"].sum())
        if n < r.get("mindistinct", 0) or n > r.get("maxdistinct", np.inf):
            bad.add(p)
    if not bad:
        return checked
    bref = ray.put(bad)

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bref)
        hit = df["label"].isin(b).to_numpy()
        df = df.copy()
        df.loc[hit & df["_ok"], "reason"] = "distinct"
        df.loc[hit, "_ok"] = False
        return df

    return checked.map_batches(mark, batch_format="pandas")


def _chain_phase(checked: Dataset, rules: dict[str, dict],
                 num_partitions: int) -> Dataset:
    """node2_chain / id_chain: remote node1's matched datatypes must
    intersect the wanted list (reference :1463-1489).  Distributed:
    the (node1, datatype) table comes from the row phase's _matched
    column; failing remote values are computed with an anti-join and
    marked back onto the edges."""
    chains = [(p, k, r[k]) for p, r in rules.items()
              for k in ("node2_chain", "id_chain") if k in r]
    if not chains:
        return checked

    from ..ops.shuffle import ifnotexists
    from ._bucket import bucketed_group_apply

    # distinct (node1, dt) of valid rows
    def explode_matched(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["_ok"] & (df["_matched"] != "")]
        out = pd.DataFrame({
            "node1": sub["node1"].astype(str),
            "dt": sub["_matched"].str.split("|")})
        return out.explode("dt").drop_duplicates()

    dts = bucketed_group_apply(
        checked.map_batches(explode_matched, batch_format="pandas"),
        ["node1", "dt"], lambda df: df.drop_duplicates(),
        num_buckets=num_partitions).materialize()

    from .shuffle import BROADCAST_LIMIT

    checked = checked.materialize()
    for prop, kind, wanted in chains:
        col = "node2" if kind == "node2_chain" else "id"
        want_set = set(wanted)
        targets = dts.map_batches(
            lambda df, w=want_set: df[df["dt"].isin(w)][["node1"]]
            .drop_duplicates(), batch_format="pandas")
        vals = checked.map_batches(
            lambda df, p=prop, c=col: pd.DataFrame(
                {"v": df.loc[(df["label"] == p) & df["_ok"],
                             c].astype(str).drop_duplicates()}),
            batch_format="pandas")
        bad = ifnotexists(vals, targets, input_keys=["v"],
                          filter_keys=["node1"]).materialize()

        if bad.count() <= BROADCAST_LIMIT:
            bset = ray.put(set(bad.to_pandas()["v"]))

            def mark(df: pd.DataFrame, p=prop, c=col, k=kind,
                     bset=bset) -> pd.DataFrame:
                b = ray.get(bset)
                hit = ((df["label"] == p)
                       & df[c].astype(str).isin(b)).to_numpy()
                df = df.copy()
                df.loc[hit & df["_ok"], "reason"] = k
                df.loc[hit, "_ok"] = False
                return df

            checked = checked.map_batches(mark, batch_format="pandas")
            continue

        # entity-scale failing-value set (a chained prop over a large
        # graph): never collected — one bucketed left join keyed on the
        # chain column (null key for non-prop rows, which match nothing)
        # annotates the hits instead.
        from ._bucket import bucketed_join

        keyed = checked.map_batches(
            lambda df, p=prop, c=col: df.assign(
                __cv__=df[c].astype(str).where(df["label"] == p, None)),
            batch_format="pandas")
        badm = bad.map_batches(
            lambda df: pd.DataFrame({"__cv__": df["v"].astype(str),
                                     "__bad__": np.int8(1)}),
            batch_format="pandas")
        lf = _schema_pa_fields(checked)
        lf["__cv__"] = pa.string()
        joined = bucketed_join(
            keyed, badm, "__cv__", left_fields=lf,
            right_fields={"__cv__": pa.string(), "__bad__": pa.int8()},
            how="left", num_buckets=num_partitions)

        def mark_joined(df: pd.DataFrame, k=kind) -> pd.DataFrame:
            hit = df["__bad__"].notna().to_numpy()
            df = df.drop(columns=["__cv__", "__bad__"]).copy()
            df["_ok"] = df["_ok"].astype(bool)
            df.loc[hit & df["_ok"], "reason"] = k
            df.loc[hit, "_ok"] = False
            df["_ok"] = df["_ok"].astype(bool)
            return df

        checked = joined.map_batches(
            mark_joined, batch_format="pandas").materialize()
    return checked


def validate_properties(
    edges: Dataset,
    patterns: pd.DataFrame,
    *,
    emit: str = "pass",
    num_partitions: int = 16,
) -> Dataset:
    """Validate edges against a property-pattern table (full kind list
    in the module docstring).

    ``emit='pass'`` returns conforming rows, ``'reject'`` returns
    violating rows with a ``reason`` column (the reference's
    PASS/EXCLUDE/REPORT action subset, kgtk/io/kgtkreader.py:742-767).
    """
    rules = compile_rules(patterns)
    synthetic_id = "id" not in edges.schema().names
    if synthetic_id:
        edges = edges.map_batches(lambda df: df.assign(id=""),
                                  batch_format="pandas")
    from ._bucket import MIN_BUNDLE_ROWS
    checked = edges.map_batches(
        _RowValidator, fn_constructor_args=(rules,),
        batch_format="pandas", batch_size=MIN_BUNDLE_ROWS,
        concurrency=(1, 8))

    checked = _group_phase(checked, rules, num_partitions)
    checked = _distinct_phase(checked, rules, num_partitions)
    checked = _chain_phase(checked, rules, num_partitions)

    drop = ["_ok", "reason", "_matched"] if emit == "pass" else [
        "_ok", "_matched"]
    if synthetic_id:
        drop.append("id")
    if emit == "pass":
        return checked.filter(expr="_ok == True").drop_columns(drop)
    return checked.filter(expr="_ok == False").drop_columns(drop)