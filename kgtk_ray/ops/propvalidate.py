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
  row-level rules pass matches; no case -> invalid; group-level rules
  attached to a case datatype apply to the rows that matched it via
  the matched-datatype occurrence counts below, mirroring the
  reference's rolled-back occurs scoreboard, :1871-1960);
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
                  "label_pattern", "id_pattern", "id_not_pattern",
                  "matches"}
_NUM_KINDS = {"minval", "maxval", "greater_than", "less_than",
              "minoccurs", "maxoccurs", "mindistinct", "maxdistinct"}
_TRUTH_KINDS = {"node1_is_valid", "node2_is_valid", "node2_blank",
                "node2_not_blank", "id_blank", "id_not_blank",
                "mustoccur", "reject", "node1_allow_list",
                "label_allow_list", "node2_allow_list", "id_allow_list",
                "unknown", "property", "datatype", "groupbyprop"}
_DATE_KINDS = {"mindate", "maxdate", "greater_than_date",
               "less_than_date"}
# single-valued string kinds
_SCALAR_KINDS = {"nextcase", "node2_column"}
# column-name-list kinds
_COLLIST_KINDS = {"not_in_columns"}


def compile_rules(patterns: pd.DataFrame) -> dict[str, dict]:
    """Pattern table -> {prop_or_datatype: {kind: parsed value}}.
    Pattern-kind values arrive KGTK-quoted (``"p.*"``); the quotes are
    stripped like the reference's KgtkValue field access."""
    rules: dict[str, dict] = {}

    def unquote(v: str) -> str:
        if len(v) >= 2 and v[0] == v[-1] == '"':
            return v[1:-1]
        return v

    for prop, kind, value in zip(patterns["prop"], patterns["kind"],
                                 patterns["value"]):
        kind = str(kind)
        r = rules.setdefault(str(prop), {})
        if kind in _LIST_KINDS:
            r.setdefault(kind, [])
            r[kind].extend(split_list(str(value)))
        elif kind in _PATTERN_KINDS:
            r.setdefault(kind, [])
            r[kind].append(unquote(str(value)))
        elif kind in _NUM_KINDS:
            r[kind] = float(value)
        elif kind in _TRUTH_KINDS:
            r[kind] = str(value) in ("True", "true", "1")
        elif kind in _DATE_KINDS:
            r[kind] = str(value)
        elif kind in _SCALAR_KINDS:
            r[kind] = str(value)
        elif kind in _COLLIST_KINDS:
            r.setdefault(kind, [])
            r[kind].extend(split_list(str(value)))
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
        # label regexes that pull rows into another datatype's rules
        self.matches_regex = {p: self.regex[(p, "matches")]
                              for p, r in rules.items() if "matches" in r}
        # datatypes applied to rows whose label matched nothing
        self.unknown_dts = [p for p, r in rules.items() if r.get("unknown")]

    # per-column scalar checks, reusable for list items ------------
    def _col_badlist(self, s: pd.Series, pre: str, dt: str,
                     r: dict) -> list[tuple[np.ndarray, str]]:
        """All (bad-mask, why) checks of logical column ``pre`` of
        datatype ``dt`` applied to a scalar series ``s`` (callers
        handle ``|``-lists separately)."""
        out: list[tuple[np.ndarray, str]] = []
        n = len(s)
        tk = f"{pre}_type"
        if tk in r:
            types = classify(s.to_numpy())
            out.append((~np.isin(types, r[tk]), tk))
        ntk = f"{pre}_not_type"
        if ntk in r:
            types = classify(s.to_numpy())
            out.append((np.isin(types, r[ntk]), ntk))
        vk = f"{pre}_values"
        if vk in r:
            out.append((~s.isin(set(r[vk])).to_numpy(), vk))
        nvk = f"{pre}_not_values"
        if nvk in r:
            out.append((s.isin(set(r[nvk])).to_numpy(), nvk))
        # full-match patterns (inclusion = any matches; exclusion =
        # none may match), reference :1147-1183
        pk = f"{pre}_pattern"
        if (dt, pk) in self.regex:
            hit = np.zeros(n, dtype=bool)
            for rx in self.regex[(dt, pk)]:
                hit |= s.str.fullmatch(rx).to_numpy()
            out.append((~hit, pk))
        npk = f"{pre}_not_pattern"
        if (dt, npk) in self.regex:
            hit = np.zeros(n, dtype=bool)
            for rx in self.regex[(dt, npk)]:
                hit |= s.str.fullmatch(rx).to_numpy()
            out.append((hit, npk))
        bk = f"{pre}_blank"
        if bk in r:
            empty = (s == "").to_numpy()
            out.append((~empty if r[bk] else empty, bk))
        nbk = f"{pre}_not_blank"
        if nbk in r:
            empty = (s == "").to_numpy()
            out.append((empty if r[nbk] else ~empty, nbk))
        ivk = f"{pre}_is_valid"
        if r.get(ivk):
            out.append((~validate(s.to_numpy()), ivk))

        if pre != "node2":
            return out
        # numeric / date rules target the (possibly redirected) node2
        num_kinds = [k for k in ("minval", "maxval", "greater_than",
                                 "less_than", "equal_to", "not_equal_to")
                     if k in r]
        date_kinds = [k for k in ("mindate", "maxdate",
                                  "greater_than_date", "less_than_date",
                                  "equal_to_date", "not_equal_to_date")
                     if k in r]
        if num_kinds or date_kinds:
            fields = explode_fields(s.to_numpy())
            if num_kinds:
                num = pd.to_numeric(fields["number"],
                                    errors="coerce").to_numpy(dtype=float)
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
                    out.append((np.asarray(bad, dtype=bool), k))
            if date_kinds:
                isdate = (fields["data_type"] == "date_and_times") \
                    & fields["valid"].to_numpy(dtype=bool)
                key = s.str.lstrip("^").to_numpy(dtype=object)
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
                    out.append((bad.astype(bool), k))
        return out

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
                "label": df["label"].astype(str)}
        # node2_column: this prop's "node2" checks read another column
        # (reference get_node2_idx); a missing column fails the rows
        n2col = r.get("node2_column", "node2")
        if n2col in df.columns:
            cols["node2"] = df[n2col].fillna("").astype(str)
        else:
            fail(m.copy(), "node2_column_missing")
            return passed
        if "id" in df.columns:
            cols["id"] = df["id"].fillna("").astype(str)

        def has_rules(pre: str) -> bool:
            return any(k.startswith(f"{pre}_") and k != f"{pre}_allow_list"
                       and k != "node2_column" for k in r)

        # label: raw pattern checks only — the reference applies
        # label_patterns directly, with no list screening/autovalidate
        # (validate_prop_or_datatype's label loop)
        if has_rules("label"):
            for bad, why in self._col_badlist(cols["label"], "label",
                                              dt, r):
                fail(bad, why)

        for pre in ("node1", "node2", "id"):
            if pre not in cols:
                continue
            if pre == "node1":
                # validate_node1 runs only when node1 rules or occurs
                # kinds exist (reference :1607-1608)
                if not has_rules("node1") and not any(
                        k in r for k in ("minoccurs", "maxoccurs",
                                         "mustoccur")):
                    continue
            elif pre == "id" and not has_rules("id"):
                continue
            # node2 is ALWAYS screened for a matched datatype
            # (validate_prop_or_datatype calls validate_node2
            # unconditionally): invalid KGTK values and non-allowed
            # lists fail even with zero node2 rules
            s = cols[pre]
            is_list = s.str.contains(r"(?<!\\)\|", regex=True).to_numpy() \
                & (s != "").to_numpy()
            listm = is_list & m
            scalm = m & ~is_list
            if listm.any():
                if not r.get(f"{pre}_allow_list"):
                    # a |-list value is prohibited unless allowed
                    # (reference validate_node1/node2 "prohibited list")
                    fail(listm, f"{pre}_prohibited_list")
                else:
                    # every list item must pass every column check
                    idxs: list[int] = []
                    items: list[str] = []
                    for i in np.where(listm)[0]:
                        for it in split_list(s.iloc[i]):
                            idxs.append(i)
                            items.append(it)
                    sub = pd.Series(items, dtype=object)
                    idx_arr = np.asarray(idxs)
                    bads = [(~validate(sub.to_numpy()), "autovalidate")]
                    bads.extend(self._col_badlist(sub, pre, dt, r))
                    for bad, why in bads:
                        if not bad.any():
                            continue
                        hit = np.zeros(len(df), dtype=bool)
                        hit[idx_arr[bad]] = True
                        fail(hit, why)
            if scalm.any():
                # autovalidate (reference default True): the value must
                # be valid KGTK before any pattern applies
                fail(~validate(s.to_numpy()) & scalm, "autovalidate")
                for bad, why in self._col_badlist(s, pre, dt, r):
                    fail(bad & scalm, why)
        return passed

    def _apply_datatype(self, df: pd.DataFrame, m: np.ndarray, prop: str,
                        ok: np.ndarray, reasons: np.ndarray,
                        matched: np.ndarray) -> None:
        """Validate rows selected by ``m`` against datatype ``prop``:
        its isa closure, then its switch cases (with nextcase
        fallthrough, reference :1871-1941)."""
        # isa: conform to ALL closure datatypes (reference :1829)
        closure = _isa_closure(self.rules, prop)
        for dt in closure:
            self._check_dt(df, m, dt, ok, reasons)
        cstr = "|".join(closure)
        matched[m] = np.array(
            [cstr if v == "" else v + "|" + cstr for v in matched[m]],
            dtype=object)
        # switch: first case whose row rules pass; a failing case with
        # a nextcase rule falls through to it (reference :1899-1934)
        cases = self.rules[prop].get("switch", [])
        if cases:
            unmatched = m.copy()
            for case in cases:
                dt_case = case
                seen: set[str] = set()
                while dt_case and dt_case not in seen and unmatched.any():
                    seen.add(dt_case)
                    case_closure = _isa_closure(self.rules, dt_case)
                    trial = np.ones(len(df), dtype=bool)
                    for dt in case_closure:
                        trial &= self._check_dt(df, unmatched, dt, ok,
                                                reasons, mark=False)
                    hit = unmatched & trial
                    if hit.any():
                        cc = "|".join(case_closure)
                        matched[hit] = np.array(
                            [v + "|" + cc for v in matched[hit]],
                            dtype=object)
                    unmatched &= ~hit
                    dt_case = self.rules.get(dt_case, {}).get("nextcase")
            bad = unmatched & ok
            reasons[bad] = "switch"
            ok &= ~unmatched

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ok = np.ones(len(df), dtype=bool)
        reasons = np.full(len(df), "", dtype=object)
        matched = np.full(len(df), "", dtype=object)
        labels = df["label"].astype(str).to_numpy()
        matched_any = np.zeros(len(df), dtype=bool)

        # not_in_columns: a prop naming prohibited columns fails any
        # row carrying that prop as a cell value there (reference
        # validate_not_in_columns :1075-1093)
        for prop, r in self.rules.items():
            for colname in r.get("not_in_columns", []):
                if colname in df.columns:
                    bad = (df[colname].astype(str) == prop).to_numpy()
                    first = bad & ok
                    reasons[first] = "not_in_columns"
                    ok[bad] = False

        for prop in self.rules:
            m = labels == prop
            if not m.any():
                continue
            matched_any |= m
            self._apply_datatype(df, m, prop, ok, reasons, matched)

        # matches: rows whose LABEL fullmatches a datatype's regex also
        # validate against that datatype (reference :2040-2048)
        for dt, rxs in self.matches_regex.items():
            hit = np.zeros(len(df), dtype=bool)
            lbl = pd.Series(labels)
            for rx in rxs:
                hit |= lbl.str.fullmatch(rx).to_numpy()
            if hit.any():
                matched_any |= hit
                self._apply_datatype(df, hit, dt, ok, reasons, matched)

        # unknown: rows whose label matched nothing validate against
        # each unknown-flagged datatype (reference :2050-2054)
        if self.unknown_dts and not matched_any.all():
            rest = ~matched_any
            for dt in self.unknown_dts:
                self._apply_datatype(df, rest, dt, ok, reasons, matched)

        df = df.copy()
        df["_ok"] = ok
        df["reason"] = reasons
        df["_matched"] = matched
        return df


from ._bucket import schema_pa_fields as _schema_pa_fields  # noqa: E402


def _group_phase(checked: Dataset, rules: dict[str, dict],
                 num_partitions: int, *,
                 count_all_rows: bool = False) -> Dataset:
    """minoccurs / maxoccurs / mustoccur / requires / prohibits: one
    distributed (node1, datatype) count, then a per-node1 bucketed rule
    scan emitting one violation row per bad node1.

    Occurrences are counted per MATCHED datatype (the row phase's
    ``_matched`` column: the label's isa closure plus the matched
    switch case's closure), mirroring the reference's occurs
    scoreboard, which validate_prop_or_datatype increments for every
    datatype a row validates under — with failed switch cases rolled
    back (propertypatternvalidator.py:1656-1672, 1871-1941).  This is
    what makes group rules (minoccurs/mustoccur/...) attached to a
    switch CASE datatype apply to exactly the rows that matched that
    case.

    ``count_all_rows`` counts every row (the reference's grouped mode
    updates the occurs scoreboard during row validation regardless of
    the row's verdict); the default counts only row-valid rows."""
    group_props = {p: r for p, r in rules.items()
                   if any(k in r for k in ("minoccurs", "maxoccurs",
                                           "requires", "prohibits"))}
    must_props = [p for p, r in rules.items() if r.get("mustoccur")]
    if not group_props and not must_props:
        return checked
    # consumed three times below (schema, partial counts, verdict join)
    # — pin it so the row phase doesn't re-execute per consumer
    checked = checked.materialize()
    if checked.count() == 0:
        return checked  # empty datasets can lose their schema

    relevant = frozenset(group_props) | frozenset(must_props)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # src=0: per-(node1, label) counts — the presence table the
        # requires/prohibits scan consults (reference interesting
        # scoreboard, :2056-2063).  src=1: per-(node1, matched
        # datatype) counts — the occurs table (reference occurs
        # scoreboard, :1656-1672), which is what applies min/maxoccurs
        # and mustoccur attached to a switch CASE or isa datatype to
        # the rows that matched it.  c: the occurrence count the rules
        # check (all rows in grouped mode, row-valid rows otherwise);
        # t: total rows, so the scan can tell "never occurs" from
        # "occurs but all rows invalid".
        lbl = pd.DataFrame({"node1": df["node1"].astype(str),
                            "label": df["label"].astype(str),
                            "_ok": df["_ok"].to_numpy()})
        lbl["src"] = 0
        ex = df["_matched"].astype(str).str.split("|").explode()
        ex = ex[ex.isin(relevant)]
        # a row validates a datatype once even when several paths reach
        # it (closure lists can repeat entries)
        mat = pd.DataFrame({
            "node1": df["node1"].reindex(ex.index).astype(str),
            "label": ex.to_numpy(),
            "_ok": df["_ok"].reindex(ex.index).to_numpy(),
        }).reset_index().drop_duplicates(["index", "label"]) \
            .drop(columns="index")
        mat["src"] = 1
        g = (pd.concat([lbl, mat], ignore_index=True)
             .groupby(["node1", "label", "src"], as_index=False)
             .agg(c=("_ok", "size" if count_all_rows else "sum"),
                  t=("_ok", "size")))
        g["c"] = g["c"].astype("int64")
        return g

    from ._bucket import bucketed_group_apply, bucketed_join
    from .agg import grouped_aggregate

    counts = grouped_aggregate(
        checked.map_batches(partial, batch_format="pandas"),
        ["node1", "label", "src"], {"n": ("c", "sum"), "t": ("t", "sum")},
        num_buckets=num_partitions)

    rref = ray.put((group_props, must_props))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        gp, mp = ray.get(rref)
        rows = []
        for node1, sub in df.groupby("node1", sort=False):
            is_m = (sub["src"] == 1).to_numpy()
            # matched-datatype counts drive the occurs family...
            have = dict(zip(sub["label"][is_m], sub["n"][is_m]))
            present = dict(zip(sub["label"][is_m], sub["t"][is_m]))
            # ...label counts drive requires/prohibits presence
            have_lbl = dict(zip(sub["label"][~is_m], sub["n"][~is_m]))
            bad_props: list[str] = []
            whole = False
            for p in mp:
                if p not in have:
                    whole = True
            for p, r in gp.items():
                if present.get(p, 0) == 0:
                    # the datatype never occurs in this group: occurs
                    # rules attach only to groups containing it
                    # (reference occurs_scoreboard entries exist only
                    # for processed rows, :1656-1672)
                    continue
                n = have.get(p, 0)
                if n == 0 and r.get("minoccurs", 0) > 0:
                    # per-row mode counts only row-valid rows: zero
                    # VALID occurrences of a present prop leaves no rows
                    # to mark, so reject the whole group (reference
                    # reports via report_occurance_violations, :2104)
                    whole = True
                    continue
                if n < r.get("minoccurs", 0) or n > r.get("maxoccurs",
                                                          np.inf):
                    bad_props.append(p)
                    continue
                nl = have_lbl.get(p, n)
                if nl > 0 and any(q not in have_lbl
                                  for q in r.get("requires", [])):
                    bad_props.append(p)
                    continue
                if nl > 0 and any(q in have_lbl
                                  for q in r.get("prohibits", [])):
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
        # a violated datatype rejects the rows that counted toward it:
        # the rows whose matched-datatype set contains it
        matched = df["_matched"].astype(str)
        hit = whole.to_numpy()
        for i, (b, mt) in enumerate(zip(bad, matched)):
            if b and not set(b.split("|")).isdisjoint(mt.split("|")):
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

        n_bad = bad.count()
        if n_bad == 0:  # empty datasets can lose their schema
            continue
        if n_bad <= BROADCAST_LIMIT:
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


def _node1_group_phase(checked: Dataset, num_partitions: int) -> Dataset:
    """Reference default (--process-node1-groups True,
    cli/validate-properties.py:43-46): any failing row or group rule
    rejects the WHOLE node1 group.  Distributed: a tiny (node1,
    group_ok) aggregate joined back onto the rows."""
    from ._bucket import bucketed_join
    from .agg import grouped_aggregate

    checked = checked.materialize()
    if checked.count() == 0:
        return checked  # empty datasets can lose their schema
    verdict = grouped_aggregate(
        checked.map_batches(
            lambda df: pd.DataFrame(
                {"node1": df["node1"].astype(str),
                 "g": df["_ok"].astype(bool).astype("int64")}),
            batch_format="pandas"),
        ["node1"], {"g": ("g", "min")}, num_buckets=num_partitions)

    joined = bucketed_join(
        checked, verdict, "node1",
        left_fields=_schema_pa_fields(checked),
        right_fields={"node1": pa.string(), "g": pa.int64()},
        how="left", num_buckets=num_partitions)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        bad = (df["g"].fillna(0) == 0).to_numpy()
        out = df.drop(columns=["g"]).copy()
        out["_ok"] = out["_ok"].astype(bool)
        first = bad & out["_ok"].to_numpy()
        out.loc[first, "reason"] = "node1_group"
        out.loc[bad, "_ok"] = False
        out["_ok"] = out["_ok"].astype(bool)
        return out

    return joined.map_batches(apply, batch_format="pandas")


def validate_properties(
    edges: Dataset,
    patterns: pd.DataFrame,
    *,
    emit: str = "pass",
    reject_node1_groups: bool = True,
    distinct_rejects: bool = False,
    num_partitions: int = 16,
) -> Dataset:
    """Validate edges against a property-pattern table (full kind list
    in the module docstring).

    ``emit='pass'`` returns conforming rows, ``'reject'`` returns
    violating rows with a ``reason`` column (the reference's
    PASS/EXCLUDE/REPORT action subset, kgtk/io/kgtkreader.py:742-767).

    ``reject_node1_groups`` (the reference CLI default,
    --process-node1-groups, cli/validate-properties.py:43-46) rejects
    every row of a node1 group when any of its rows or group rules
    fail; ``False`` is the reference's ungrouped per-row mode, except
    that occurs/requires/prohibits violations still reject the
    violating prop's rows here (the reference only REPORTS them in
    that mode).  ``distinct_rejects`` opts into rejecting
    mindistinct/maxdistinct violations — the reference only reports
    them (report_distinct_violations, :2149)."""
    rules = compile_rules(patterns)
    synthetic_id = "id" not in edges.schema().names
    if synthetic_id:
        edges = edges.map_batches(lambda df: df.assign(id=""),
                                  batch_format="pandas")

    def drop_key_lists(df: pd.DataFrame) -> pd.DataFrame:
        # KGTK format v2 prohibits |-lists in node1/label/node2; the
        # validating reader excludes such rows from BOTH outputs
        # (kgtk/io/kgtkreader.py:1209-1224, COMPLAIN default)
        keep = np.ones(len(df), dtype=bool)
        for c in ("node1", "label", "node2"):
            if c in df.columns:
                keep &= ~(df[c].astype(str)
                          .str.contains(r"(?<!\\)\|", regex=True)
                          .to_numpy())
        return df[keep]

    edges = edges.map_batches(drop_key_lists, batch_format="pandas")
    from ._bucket import MIN_BUNDLE_ROWS
    checked = edges.map_batches(
        _RowValidator, fn_constructor_args=(rules,),
        batch_format="pandas", batch_size=MIN_BUNDLE_ROWS,
        concurrency=(1, 8))

    checked = _group_phase(checked, rules, num_partitions,
                           count_all_rows=reject_node1_groups)
    if distinct_rejects:
        checked = _distinct_phase(checked, rules, num_partitions)
    checked = _chain_phase(checked, rules, num_partitions)
    if reject_node1_groups:
        checked = _node1_group_phase(checked, num_partitions)

    drop = ["_ok", "reason", "_matched"] if emit == "pass" else [
        "_ok", "_matched"]
    if synthetic_id:
        drop.append("id")
    if emit == "pass":
        return checked.filter(expr="_ok == True").drop_columns(drop)
    return checked.filter(expr="_ok == False").drop_columns(drop)