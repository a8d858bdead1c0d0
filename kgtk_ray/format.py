"""KGTK file-format constants and scalar/vector helpers.

Semantics modeled on the reference's file model (see
/root/reference/kgtk/kgtkformat.py:12-131 and
/root/reference/docs/specification.md) — reimplemented from the spec,
vectorized for Arrow/pandas batches.

Key facts of the model:
  * tables are columns of strings; empty string == null
  * edge files require node1/label/node2 (aliases from/subject,
    predicate/relation/relationship, to/object) and optionally id
  * node files require id
  * a cell may hold a ``|``-separated list (escape ``\\|``); lists are
    prohibited in node1/label/node2
"""
from __future__ import annotations

import re
from typing import Iterable, Sequence

import numpy as np
import pandas as pd

COLUMN_SEPARATOR = "\t"
LIST_SEPARATOR = "|"

# Alias groups for the required columns (reference: kgtk/kgtkformat.py:17-28).
NODE1_ALIASES = ("node1", "from", "subject")
LABEL_ALIASES = ("label", "predicate", "relation", "relationship")
NODE2_ALIASES = ("node2", "to", "object")
ID_ALIASES = ("id", "ID")

KGTK_EDGE_COLUMNS = ["id", "node1", "label", "node2"]

# Split on an unescaped "|" (reference regex semantics, kgtk/value/kgtkvalue.py:442).
_LIST_SPLIT_RE = re.compile(r"(?<!\\)\|")

# Escape table used by stringify/unstringify (modeled on
# kgtk/kgtkformat.py:65-131: KGTK strings are double-quoted with
# backslash escapes; pipe must be escaped inside values).
_STRINGIFY_ESCAPES = {
    # reference stringify_translate (kgtk/kgtkformat.py:65-77)
    "\a": "\\a",
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\v": "\\v",
    "\\": "\\\\",
    "'": "\\'",
    '"': '\\"',
    "|": "\\|",
}
_UNSTRINGIFY_ESCAPES = {
    "\\\\": "\\",
    '\\"': '"',
    "\\t": "\t",
    "\\n": "\n",
    "\\r": "\r",
    "\\|": "|",
    "\\'": "'",
    "\\a": "\a",
    "\\b": "\b",
    "\\f": "\f",
    "\\v": "\v",
}
_UNESCAPE_RE = re.compile(r"\\(.)")
_UNESCAPE_MAP = {"\\": "\\", '"': '"', "'": "'", "t": "\t", "n": "\n",
                 "r": "\r", "|": "|", "a": "\a", "b": "\b", "f": "\f",
                 "v": "\v"}


def stringify(s: str) -> str:
    """Python str -> KGTK double-quoted string literal."""
    out = []
    for ch in s:
        out.append(_STRINGIFY_ESCAPES.get(ch, ch))
    return '"' + "".join(out) + '"'


def unstringify(v: str) -> str:
    """KGTK string / lq-string literal -> raw text (drops quotes and @lang)."""
    if not v:
        return v
    if v.startswith('"') and v.endswith('"') and len(v) >= 2:
        body = v[1:-1]
    elif v.startswith("'"):
        m = re.match(r"^'(.*)'@[-A-Za-z0-9]+$", v, re.S)
        body = m.group(1) if m else v
    else:
        return v
    return _UNESCAPE_RE.sub(lambda m: _UNESCAPE_MAP.get(m.group(1), m.group(1)), body)


def split_list(cell: str) -> list[str]:
    """Split a KGTK cell on unescaped | (empty cell -> [])."""
    if not cell:
        return []
    return _LIST_SPLIT_RE.split(cell)


def join_list(values: Iterable[str]) -> str:
    return LIST_SEPARATOR.join(values)


def join_sorted_unique(values: Iterable[str]) -> str:
    """Merge values into the canonical sorted-unique | list (the merge
    rule compact and lift use; reference kgtk/value/kgtkvalue.py:449-501)."""
    uniq = sorted({v for v in values if v != ""})
    return LIST_SEPARATOR.join(uniq)


def merge_list_cells(cells: Iterable[str]) -> str:
    """Merge several cells (each possibly a | list) into one sorted-unique list."""
    acc: set[str] = set()
    for c in cells:
        if c:
            acc.update(v for v in split_list(c) if v != "")
    return LIST_SEPARATOR.join(sorted(acc))


def merge_list_series(s: pd.Series) -> str:
    return merge_list_cells(s.dropna().astype(str))


def merge_lists_grouped(df: pd.DataFrame, keys: Sequence[str],
                        rest: Sequence[str]) -> pd.DataFrame:
    """Vectorized equivalent of
    ``df.groupby(keys).agg({c: merge_list_series for c in rest})``:
    one output row per distinct key, every ``rest`` cell the
    sorted-unique ``|`` union of the group's cells.

    Instead of one Python set-union/sort/join call per (group, column)
    — millions of interpreter dispatches on a compact shuffle bucket —
    each column takes one vectorized pass: regex split (C loop) ->
    explode -> global drop_duplicates -> lexsort -> per-group join.
    """
    keys = list(keys)
    rest = list(rest)
    if not len(df):
        return df[keys + rest].copy()
    gids = df.groupby(keys, sort=False).ngroup()
    first = ~gids.duplicated()
    base = df.loc[first, keys].copy()
    base.index = gids[first].to_numpy()
    base = base.sort_index()
    n = len(base)
    for c in rest:
        s = df[c]
        m = s.notna()
        sc = s[m].astype(str)
        g = gids[m]
        ne = sc != ""
        sc = sc[ne]
        g = g[ne]
        # three split tiers, cheapest first: cells with no "|" are
        # their own single token (the dominant case — e.g. provenance
        # urls), cells with "|" but no backslash take the plain C
        # split, only cells with a potential escaped pipe pay the
        # regex split
        haspipe = sc.str.contains("|", regex=False).to_numpy()
        single = pd.DataFrame({"g": g.to_numpy()[~haspipe],
                               "t": sc.to_numpy()[~haspipe]})
        comp = sc[haspipe]
        gy = g.to_numpy()[haspipe]
        frames = [single]
        if len(comp):
            hasesc = comp.str.contains("\\", regex=False).to_numpy()
            if (~hasesc).any():
                frames.append(pd.DataFrame({
                    "g": gy[~hasesc],
                    "t": comp[~hasesc].str.split("|", regex=False).to_numpy(),
                }).explode("t", ignore_index=True))
            if hasesc.any():
                frames.append(pd.DataFrame({
                    "g": gy[hasesc],
                    "t": comp[hasesc].str.split(_LIST_SPLIT_RE).to_numpy(),
                }).explode("t", ignore_index=True))
        ex = pd.concat(frames, ignore_index=True)
        ex = ex[ex["t"].notna() & (ex["t"] != "")]
        ex = ex.drop_duplicates()
        ex = ex.sort_values(["g", "t"], kind="mergesort")
        joined = ex.groupby("g", sort=True)["t"].agg(LIST_SEPARATOR.join)
        col = np.full(n, "", dtype=object)
        col[joined.index.to_numpy()] = joined.to_numpy()
        base[c] = col
    return base.reset_index(drop=True)


def resolve_column_aliases(columns: Sequence[str]) -> dict[str, str]:
    """Map actual column names to canonical names (node1/label/node2/id).

    First-seen alias in each group wins; other columns map to themselves.
    Reference behavior: kgtk/io/kgtkbase.py:153-191.
    """
    renames: dict[str, str] = {}
    taken: set[str] = set()
    for canon, aliases in (
        ("node1", NODE1_ALIASES),
        ("label", LABEL_ALIASES),
        ("node2", NODE2_ALIASES),
        ("id", ID_ALIASES),
    ):
        for col in columns:
            if col in aliases and canon not in taken:
                renames[col] = canon
                taken.add(canon)
                break
    return renames


def detect_mode(columns: Sequence[str]) -> str:
    """'edge' if a node1-family column is present, else 'node' if id, else
    'none' (reference: kgtk/io/kgtkreader.py:536-555)."""
    cols = set(columns)
    if cols & set(NODE1_ALIASES):
        return "edge"
    if cols & set(ID_ALIASES):
        return "node"
    return "none"


def expand_column_ranges(spec: Sequence[str], columns: Sequence[str]) -> list[str]:
    """Expand the reference's ``..`` / ``...`` column-range DSL
    (kgtk/cli/calc.py:130-199): ``a .. b`` selects the inclusive run of
    columns between a and b in table order."""
    out: list[str] = []
    i = 0
    spec = list(spec)
    while i < len(spec):
        tok = spec[i]
        if tok in ("..", "...") and out and i + 1 < len(spec):
            start = columns.index(out[-1])
            stop = columns.index(spec[i + 1])
            step = 1 if stop >= start else -1
            out.extend(columns[start + step : stop + step : step])
            i += 2
        else:
            out.append(tok)
            i += 1
    return out


def nonempty_mask(arr: pd.Series | np.ndarray) -> np.ndarray:
    """Boolean mask of cells that are neither null nor ''."""
    s = pd.Series(arr)
    return (s.notna() & (s.astype(object) != "")).to_numpy()
