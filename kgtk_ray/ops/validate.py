"""Dataset-level validate / clean / explode / implode.

Built on the vectorized value kernels in ``kgtk_ray.values``;
reference semantics: kgtk/cli/validate.py, kgtk/cli/clean_data.py,
kgtk/reshape/kgtkexplode.py, kgtk/reshape/kgtkimplode.py.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray.data

from .. import values as V

Dataset = ray.data.Dataset

EXPLODE_PREFIX = ";kgtk:"  # reference: kgtk/reshape/kgtkexplode.py:32

# reference kgtk/io/kgtkreader.py:53 ERROR_LIMIT_DEFAULT — after this
# many reported data errors the reader aborts ("Too many data errors")
ERROR_LIMIT_DEFAULT = 1000


def _error_counts(ds: Dataset, cols: Sequence[str],
                  options: "V.ValueOptions | None") -> dict:
    """Per-column invalid-row counters + the any-column total, computed
    in one distributed pass (per-batch partial counts, tiny driver
    sum).  The distributed equivalent of the reference reader's
    ``data_errors_reported`` counter (kgtk/io/kgtkreader.py:763-766)."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        bad_any = None
        out = {}
        for c in cols:
            arr = df[c].fillna("").to_numpy(dtype=object)
            v = V.validate(arr) if options is None \
                else V.validate_with_options(arr, options)[0]
            out[c] = [int((~v).sum())]
            bad_any = ~v if bad_any is None else (bad_any | ~v)
        out["total"] = [int(bad_any.sum()) if bad_any is not None else 0]
        return pd.DataFrame(out)

    parts = ds.map_batches(counts, batch_format="pandas").to_pandas()
    if not len(parts):  # empty dataset: zero everywhere
        return {**{c: 0 for c in cols}, "total": 0}
    return {c: int(parts[c].sum()) for c in parts.columns}


def validate_edges(ds: Dataset, columns: Sequence[str] = ("node1", "label", "node2"),
                   *, invalid_action: str = "exclude",
                   options: "V.ValueOptions | None" = None,
                   error_limit: int = ERROR_LIMIT_DEFAULT):
    """Classify + validate the given columns per the KGTK value grammar.

    ``invalid_action`` maps the reference's ValidationAction set
    (kgtk/io/kgtkreader.py:742-767):

    - ``"exclude"`` — silently drop invalid rows (EXCLUDE); lazy.
    - ``"mark"`` — append a boolean ``valid`` column; lazy.
    - ``"pass"`` — return the input unchanged (PASS); lazy.
    - ``"report"`` / ``"complain"`` — REPORT keeps all rows, COMPLAIN
      drops the invalid ones; both EAGERLY count errors and return
      ``(dataset, counters)`` where counters maps each column to its
      invalid-row count plus ``"total"`` (rows with any invalid
      column).  If ``error_limit > 0`` and total >= limit, raises
      ``ValueError("Too many data errors...")`` — the reference
      reader's 1000-error abort (kgtkreader.py:53,763-766).
    - ``"error"`` — raise on the FIRST invalid row (ERROR/EXIT; in a
      streaming engine the whole pass runs before the raise).

    ``options`` (a :class:`kgtk_ray.values.ValueOptions`) selects the
    reference's KgtkValueOptions lax/repair matrix; None = strict
    defaults.  Repair options mutate the cell in place, as the
    reference does (kgtk/io/kgtkreader.py:1179-1183).
    """
    cols = list(columns)

    if invalid_action in ("report", "complain", "error"):
        counters = _error_counts(ds, cols, options)
        total = counters["total"]
        if invalid_action == "error":
            if total:
                raise ValueError(
                    f"In input data: {total} invalid rows ({counters})")
            return ds
        if error_limit > 0 and total >= error_limit:
            raise ValueError(
                f"Too many data errors, exiting. ({total} >= {error_limit})")
        out = ds if invalid_action == "report" else validate_edges(
            ds, cols, invalid_action="exclude", options=options)
        return out, counters

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ok = None
        repaired_cols = {}
        for c in cols:
            arr = df[c].fillna("").to_numpy(dtype=object)
            if options is None:
                v = V.validate(arr)
            else:
                v, rep = V.validate_with_options(arr, options)
                repaired_cols[c] = rep
            ok = v if ok is None else (ok & v)
        if repaired_cols:
            df = df.copy()
            for c, rep in repaired_cols.items():
                df[c] = rep
        if invalid_action == "exclude":
            return df[ok]
        if invalid_action == "mark":
            df = df.copy()
            df["valid"] = ok
            return df
        return df

    return ds.map_batches(f, batch_format="pandas")


def clean_edges(ds: Dataset, columns: Sequence[str] = ("node2",),
                *, with_rejects: bool = False,
                options: "V.ValueOptions | None" = None,
                error_limit: int = 0):
    """validate + repair + keep-valid (the reference's clean-data:
    repairs month/day-zero dates and out-of-range coordinates, then
    excludes rows that remain invalid).

    ``options`` switches to the reference-exact KgtkValueOptions
    matrix (which repairs exactly the configured knobs); the default
    keeps the legacy always-repair behavior.

    With ``with_rejects=True`` returns ``(clean, rejects)`` — the
    reference's reject-file routing (kgtk/io/kgtkreader.py:769-783) as
    a second Dataset instead of process death.  Each branch is an
    independent lazy pipeline over the input; consume both from a
    materialized upstream if the input is expensive to recompute.

    ``error_limit > 0`` enables the reference reader's error budget
    (kgtkreader.py:53,763-766): rows still invalid AFTER repair are
    counted eagerly (one distributed pass) and ``ValueError("Too many
    data errors...")`` is raised when the count reaches the limit.
    """
    cols = list(columns)

    if error_limit > 0:
        # count post-repair invalids: rows the clean pass would drop
        repaired = ds if options is not None else ds.map_batches(
            lambda df: df.assign(**{
                c: V.repair(df[c].fillna("").to_numpy(dtype=object))
                for c in cols}),
            batch_format="pandas")
        counters = _error_counts(repaired, cols, options)
        if counters["total"] >= error_limit:
            raise ValueError(
                f"Too many data errors, exiting. "
                f"({counters['total']} >= {error_limit}; {counters})")

    def split(df: pd.DataFrame, keep_valid: bool) -> pd.DataFrame:
        df = df.copy()
        ok = None
        for c in cols:
            arr = df[c].fillna("").to_numpy(dtype=object)
            if options is None:
                repaired = V.repair(arr)
                v = V.validate(repaired)
            else:
                v, repaired = V.validate_with_options(arr, options)
            df[c] = repaired
            ok = v if ok is None else (ok & v)
        return df[ok] if keep_valid else df[~ok]

    clean = ds.map_batches(lambda df: split(df, True), batch_format="pandas")
    if not with_rejects:
        return clean
    rejects = ds.map_batches(lambda df: split(df, False), batch_format="pandas")
    return clean, rejects


def explode_node2(ds: Dataset, column: str = "node2",
                  fields: Sequence[str] | None = None, *,
                  expand_list: bool = False,
                  kgtk_cells: bool = False) -> Dataset:
    """Split ``column`` into typed subfield columns named
    ``<column>;kgtk:<field>`` (reference kgtk/reshape/kgtkexplode.py).
    Fields the reference formats as KGTK strings (text, zonestr,
    date_and_time — kgtkexplode.py:203-215) are emitted ``"``-quoted,
    matching the reference's exploded cells byte-for-byte.
    ``expand_list`` first expands ``|``-list cells into one row per
    item (the reference's opt-in ``--expand``, kgtkexplode.py:45,173 —
    default False there and here; unexpanded lists carry only
    data_type/valid/list_len).

    The default field set matches the reference's (values.py
    DEFAULT_EXPLODE_FIELDS; date components are opt-in).  Output cells
    are typed (floats/bools, null when absent) — the Ray-native form
    downstream kernels want.  ``kgtk_cells=True`` instead renders every
    field as the reference's TSV cell string: "" for absent, True/False
    booleans, integral numbers without a trailing .0, and ALL fields
    blank when the value is invalid (kgtkexplode.py leaves the entire
    row's subfields unset then)."""
    if expand_list:
        from .core import expand_lists
        ds = expand_lists(ds, [column])
    want = list(fields) if fields else V.DEFAULT_EXPLODE_FIELDS

    # the reference renders each field through its parsed type
    # (kgtk/value/kgtkvalue.py field parses): number -> int when the
    # token is integral else float (so 186.2e04 prints 1862000.0),
    # tolerances/coordinates -> float always (84 prints 84.0),
    # precision/list_len -> int, truth -> True/False
    import re
    _FLOAT_FIELDS = {"low_tolerance", "high_tolerance",
                     "latitude", "longitude"}
    _INT_FIELDS = {"precision", "list_len",
                   "year", "month", "day", "hour", "minutes", "seconds"}
    _INT_TOKEN = re.compile(r"^[-+]?(?:\d+|0[xX][0-9a-fA-F]+|0[oO][0-7]+|0[bB][01]+)$")

    def _cell(fld, v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return ""
        if isinstance(v, (bool, np.bool_)):
            return "True" if v else "False"
        s = str(v)
        if s == "":
            return ""
        if fld == "number":
            if _INT_TOKEN.match(s):
                try:
                    return str(int(s, 0))
                except ValueError:  # leading zeros reject base-0
                    return str(int(s))
            return str(float(s))
        if fld in _FLOAT_FIELDS:
            return str(float(s))
        if fld in _INT_FIELDS:
            return str(int(float(s)))
        return s

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ex = V.explode_fields(df[column].fillna("").to_numpy(dtype=object))
        invalid = ~ex["valid"].to_numpy(dtype=bool)
        df = df.reset_index(drop=True).copy()
        for fld in want:
            col = ex[fld]
            if fld in V.STR_CELL_FIELDS:
                col = col.map(lambda v: f'"{v}"' if isinstance(v, str) else v)
            if kgtk_cells:
                vals = col.map(lambda v, fld=fld: _cell(fld, v)).to_numpy(dtype=object)
                vals[invalid] = ""
                df[f"{column}{EXPLODE_PREFIX}{fld}"] = vals
            elif fld == "number":
                # pin to float64: the token-faithful int/float mix would
                # give different Arrow schemas per block
                df[f"{column}{EXPLODE_PREFIX}{fld}"] = pd.to_numeric(
                    col, errors="coerce").to_numpy(dtype="float64")
            else:
                df[f"{column}{EXPLODE_PREFIX}{fld}"] = col.to_numpy()
        return df

    return ds.map_batches(f, batch_format="pandas")


def implode_node2(ds: Dataset, column: str = "node2",
                  *, drop_fields: bool = True) -> Dataset:
    """Rebuild ``column`` from its exploded ``<column>;kgtk:*`` subfields
    (reference kgtk/reshape/kgtkimplode.py)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        prefix = f"{column}{EXPLODE_PREFIX}"
        sub = {c[len(prefix):]: df[c] for c in df.columns if c.startswith(prefix)}
        # tolerate partially exploded input (the reference implodes from
        # whichever kgtk: columns exist, kgtkimplode.py; e.g. the
        # docs/transform/implode.md table omits year/month/day/...)
        for fld in V.ALL_FIELDS:
            if fld not in sub:
                sub[fld] = pd.Series(np.nan, index=df.index, dtype=object)
        for fld in V.STR_CELL_FIELDS & sub.keys():
            # exploded str-format cells carry KGTK quotes; strip them
            # back to the raw field value (reference kgtkimplode.py
            # unwrap, incl. triple-quote wrappers)
            sub[fld] = sub[fld].map(
                lambda v: V._unwrap_field(v) if isinstance(v, str) else v)
        fields = pd.DataFrame(sub)
        df = df.copy()
        df[column] = V.implode_fields(fields).to_numpy()
        if drop_fields:
            df = df.drop(columns=[c for c in df.columns if c.startswith(prefix)])
        return df

    return ds.map_batches(f, batch_format="pandas")
