"""Vectorized KGTK value type system.

Reimplements the semantics of the reference's per-cell classifier
(/root/reference/kgtk/value/kgtkvalue.py:1718-1800 ``classify``/
``validate`` and the type regexes built at :592-1373) as vectorized
numpy/pandas kernels suitable for ``map_batches`` over Arrow blocks.

Every cell is a string whose first character determines its type:

  EMPTY      ""                       LIST    a|b|c (unescaped |)
  STRING     "..."                    LQ      '...'@lang[-suffix]
  NUMBER     1, -3.14e2, 0xff         QUANTITY 10m, -1.2e2[-1,1]kg.m/s2, +17Q42
  COORDS     @LAT/LON                 DATE    ^ISO8601[/precision]
  EXTENSION  !...                     BOOLEAN True/False
  SYMBOL     anything else (Q42, foo)

Classification precedence follows the reference: empty -> list ->
string -> lq-string -> number/quantity -> coordinates -> date ->
extension -> boolean -> symbol.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

DATA_TYPES = [
    "empty",
    "list",
    "number",
    "quantity",
    "string",
    "language_qualified_string",
    "location_coordinates",
    "date_and_times",
    "extension",
    "boolean",
    "symbol",
]

# Strict number grammar mirroring the reference's number_re
# (kgtk/value/kgtkvalue.py:592-643): Python decimal int (with ``_``
# separators and [lL] suffix), float, imaginary.  Hex/octal/binary are
# intentionally ABSENT: the reference's bin/oct/hex integer patterns
# contain a quoting typo (`(":_?...` at :604-610) so they never match
# its strict number_re either — such values classify as quantity and
# fail quantity validation, and we reproduce that observable behavior.
_DIGITPART = r"\d(?:_?\d)*"
_POINTFLOAT = rf"(?:(?:{_DIGITPART})?\.{_DIGITPART}|{_DIGITPART}\.)"
_EXPFLOAT = rf"(?:{_DIGITPART}|{_POINTFLOAT})[eE][+-]?{_DIGITPART}"
_FLOAT = rf"(?:{_POINTFLOAT}|{_EXPFLOAT})"
_NUMERIC = rf"[+-]?(?:{_DIGITPART}[lL]?|{_FLOAT}|(?:{_FLOAT}|{_DIGITPART})[jJ])"
NUMBER_RE = re.compile(rf"^{_NUMERIC}$")
_DEC = r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
# quantity = number [low,high]? (SI-unit | Qnode)?
_TOL = rf"\[(?P<low>{_DEC}),(?P<high>{_DEC})\]"
# SI units exactly as the reference enumerates them
# (kgtk/value/kgtkvalue.py:650-658: unit list, powers -1|2|3, ./ combiner)
_SI_UNIT = r"(?:m|kg|s|C|K|mol|cd|F|M|A|N|ohms|V|J|Hz|lx|H|Wb|W|Pa)"
_SI = rf"{_SI_UNIT}(?:-1|2|3)?(?:[./]{_SI_UNIT}(?:-1|2|3)?)*"
_QNODE = r"Q[1-9][0-9]*"
QUANTITY_RE = re.compile(
    rf"^(?P<number>{_NUMERIC})(?:{_TOL})?(?:(?P<units_node>{_QNODE})|(?P<si_units>{_SI}))?$"
)
STRING_RE = re.compile(r'^"(?:[^"\\]|\\.)*"$', re.S)
LQSTRING_RE = re.compile(
    r"^'(?P<text>(?:[^'\\]|\\.)*)'@(?P<language>[a-zA-Z]{2,3}|mul|und)(?:-(?P<language_suffix>[-a-zA-Z0-9]+))?$",
    re.S,
)
COORDS_RE = re.compile(rf"^@(?P<latitude>{_DEC})/(?P<longitude>{_DEC})$")
DATE_RE = re.compile(
    r"^\^(?P<year>[+-]?\d{3,4})(?:-?(?P<month>\d{2})(?:-?(?P<day>\d{2}))?)?"
    r"(?:T(?P<hour>\d{2})(?::?(?P<minutes>\d{2})(?::?(?P<seconds>\d{2}))?)?"
    r"(?P<zonestr>Z|[+-]\d{2}(?::?\d{2})?)?)?"
    r"(?:/(?P<precision>\d{1,2}))?$"
)
_LIST_RE = re.compile(r"(?<!\\)\|")

# --- KgtkValueOptions matrix (kgtk/value/kgtkvalueoptions.py:15-105) ---
# Option-dependent regex variants, byte-for-byte per the reference:
# lax string (kgtkvalue.py:981, non-DOTALL .*), strict/lax/wikidata
# lq-strings (:1080-1084), lax quantity Qnode (:668), strict/lax
# coordinate degrees (:1146-1154), the always-lax date grammar
# (:1333-1373, hyphen-conditional basic/extended forms).
LAX_STRING_RE = re.compile(r'^"(?P<text>.*)"$')
STRICT_LQ_RE = re.compile(
    r"^'(?P<text>(?:[^'\\]|\\.)*)'@(?P<language>[a-zA-Z]{2,3})"
    r"(?:-(?P<language_suffix>[a-zA-Z0-9]+))?$")
LAX_LQ_RE = re.compile(
    r"^'(?P<text>.*)'@(?P<language>[a-zA-Z]{2,3})"
    r"(?:-(?P<language_suffix>[a-zA-Z0-9]+))?$")
WIKIDATA_LQ_RE = re.compile(
    r"^'(?P<text>(?:[^'\\]|\\.)*)'@(?P<language>[a-zA-Z]{2,})"
    r"(?:-(?P<language_suffix>[-a-zA-Z0-9]+))?$")
_LAX_QNODE = r"Q[-_0-9A-Za-z]+"
LAX_QUANTITY_RE = re.compile(
    rf"^(?P<number>{_NUMERIC})(?:{_TOL})?"
    rf"(?:(?P<units_node>{_LAX_QNODE})|(?P<si_units>{_SI}))?$")
_STRICT_DEGREES = r"(?:[-+]?(?:\d+(?:\.\d*)?)|(?:\.\d+))"
STRICT_COORDS_RE = re.compile(
    rf"^@(?P<latitude>{_STRICT_DEGREES})/(?P<longitude>{_STRICT_DEGREES})$")
_LAX_DEGREES = rf"(?:[-+]?(?:{_DIGITPART}|{_FLOAT}))"
LAX_COORDS_RE = re.compile(
    rf"^@(?P<latitude>{_LAX_DEGREES})/(?P<longitude>{_LAX_DEGREES})$")
REF_DATE_RE = re.compile(
    r"^\^(?P<year>[-+]?[0-9]{4}(?:[0-9]+(?=-))?)"
    r"(?:(?P<hyphen>-)?(?P<month>1[0-2]|0[0-9])"
    r"(?:(?(hyphen)-)(?P<day>3[01]|0[0-9]|[12][0-9]))?)?"
    r"(?:T(?P<hour>2[0-4]|[01][0-9])"
    r"(?:(?(hyphen):)(?P<minutes>[0-5][0-9])"
    r"(?:(?(hyphen):)(?P<seconds>[0-5][0-9]))?)?"
    r"(?P<zonestr>Z|[-+][01][0-9](?::?[0-5][0-9])?)?)?"
    r"(?:/(?P<precision>[0-1]?[0-9]))?$")


class ValueOptions:
    """Mirror of the reference's KgtkValueOptions knobs
    (kgtk/value/kgtkvalueoptions.py:15-105), strict defaults."""

    __slots__ = (
        "allow_lax_qnodes", "allow_month_or_day_zero",
        "repair_month_or_day_zero", "allow_end_of_day",
        "allow_lax_strings", "allow_lax_lq_strings",
        "allow_wikidata_lq_strings", "allow_lax_coordinates",
        "repair_lax_coordinates", "allow_out_of_range_coordinates",
        "minimum_valid_year", "clamp_minimum_year", "ignore_minimum_year",
        "maximum_valid_year", "clamp_maximum_year", "ignore_maximum_year",
        "minimum_valid_lat", "clamp_minimum_lat",
        "maximum_valid_lat", "clamp_maximum_lat",
        "minimum_valid_lon", "clamp_minimum_lon",
        "maximum_valid_lon", "clamp_maximum_lon",
        "modulo_repair_lon",
    )

    def __init__(self, **kw):
        defaults = dict(
            allow_lax_qnodes=False, allow_month_or_day_zero=False,
            repair_month_or_day_zero=False, allow_end_of_day=True,
            allow_lax_strings=False, allow_lax_lq_strings=False,
            allow_wikidata_lq_strings=False, allow_lax_coordinates=False,
            repair_lax_coordinates=False,
            allow_out_of_range_coordinates=False,
            minimum_valid_year=1583, clamp_minimum_year=False,
            ignore_minimum_year=False,
            maximum_valid_year=2100, clamp_maximum_year=False,
            ignore_maximum_year=False,
            minimum_valid_lat=-90.0, clamp_minimum_lat=False,
            maximum_valid_lat=90.0, clamp_maximum_lat=False,
            minimum_valid_lon=-180.0, clamp_minimum_lon=False,
            maximum_valid_lon=180.0, clamp_maximum_lon=False,
            modulo_repair_lon=False,
        )
        defaults.update(kw)
        for k, v in defaults.items():
            setattr(self, k, v)


def _wrap_longitude(lon: float) -> float:
    """Reference wrap_longitude (kgtkvalue.py:1309-1320): fmod into
    (-180, 180]."""
    import math
    r = math.fmod(lon, 360.0)
    if r > 180.0:
        r -= 360.0
    elif r <= -180.0:
        r += 360.0
    return r


def _format_degrees(num: float) -> str:
    """Reference format_degrees (kgtkvalue.py:1156): '{:011.6f}'."""
    return "{:011.6f}".format(num)


def validate_with_options(values, options: "ValueOptions"):
    """Option-aware validate + repair: returns (valid: bool[], value:
    object[] with in-place repairs applied), matching the reference's
    KgtkValue.validate() observable behavior under KgtkValueOptions
    (repairs mutate the value, kgtk/io/kgtkreader.py:1179-1183)."""
    s = pd.Series(np.asarray(values, dtype=object)).fillna("").astype(str)
    types = classify(s.to_numpy())
    n = len(s)
    ok = np.ones(n, dtype=bool)
    out = s.to_numpy(dtype=object).copy()

    # strings
    m = types == "string"
    if m.any():
        rx = LAX_STRING_RE if options.allow_lax_strings else STRING_RE
        ok &= ~(m & ~_match_mask(s, rx))
    # lq strings
    m = types == "language_qualified_string"
    if m.any():
        if options.allow_wikidata_lq_strings:
            rx = WIKIDATA_LQ_RE
        elif options.allow_lax_lq_strings:
            rx = LAX_LQ_RE
        else:
            rx = STRICT_LQ_RE
        ok &= ~(m & ~_match_mask(s, rx))
    # quantities
    m = types == "quantity"
    if m.any():
        rx = LAX_QUANTITY_RE if options.allow_lax_qnodes else QUANTITY_RE
        ok &= ~(m & ~_match_mask(s, rx))
    # extensions always invalid
    ok &= ~(types == "extension")
    # symbols: no tabs/newlines
    sym = types == "symbol"
    ok &= ~(sym & s.str.contains(r"[\t\n\r]", regex=True)
            .fillna(False).to_numpy(dtype=bool))

    # coordinates, per-row (option branches are value-dependent)
    for i in np.flatnonzero(types == "location_coordinates"):
        v = s.iloc[i]
        mt = STRICT_COORDS_RE.match(v)
        rewrite = False
        if mt is None and (options.allow_lax_coordinates
                           or options.repair_lax_coordinates):
            mt = LAX_COORDS_RE.match(v)
            rewrite = options.repair_lax_coordinates
        if mt is None:
            ok[i] = False
            continue
        latstr, lonstr = mt.group("latitude"), mt.group("longitude")
        fix = False
        lat = float(latstr)
        if options.allow_out_of_range_coordinates:
            pass
        elif lat < options.minimum_valid_lat:
            if options.clamp_minimum_lat:
                lat = options.minimum_valid_lat
                latstr, fix = str(lat), True
            else:
                ok[i] = False
                continue
        elif lat > options.maximum_valid_lat:
            if options.clamp_maximum_lat:
                lat = options.maximum_valid_lat
                latstr, fix = str(lat), True
            else:
                ok[i] = False
                continue
        if rewrite:
            latstr, fix = _format_degrees(lat), True
        lon = float(lonstr)
        if options.allow_out_of_range_coordinates:
            pass
        elif lon < options.minimum_valid_lon:
            if options.modulo_repair_lon:
                lon = _wrap_longitude(lon)
                lonstr, fix = str(lon), True
            elif options.clamp_minimum_lon:
                lon = options.minimum_valid_lon
                lonstr, fix = str(lon), True
            else:
                ok[i] = False
                continue
        elif lon > options.maximum_valid_lon:
            if options.modulo_repair_lon:
                lon = _wrap_longitude(lon)
                lonstr, fix = str(lon), True
            elif options.clamp_maximum_lon:
                lon = options.maximum_valid_lon
                lonstr, fix = str(lon), True
            else:
                ok[i] = False
                continue
        if rewrite:
            lonstr, fix = _format_degrees(lon), True
        if fix:
            out[i] = "@" + latstr + "/" + lonstr

    # dates, per-row (reference is_date_and_times, :1376-1650)
    for i in np.flatnonzero(types == "date_and_times"):
        v = s.iloc[i]
        mt = REF_DATE_RE.match(v)
        if mt is None:
            ok[i] = False
            continue
        yearstr = mt.group("year")
        monthstr, daystr = mt.group("month"), mt.group("day")
        fix = False
        year = int(yearstr)
        if year < options.minimum_valid_year \
                and not options.ignore_minimum_year:
            if options.clamp_minimum_year:
                year = options.minimum_valid_year
                yearstr = str(year).zfill(4 if year >= 0 else 5)
                fix = True
            else:
                ok[i] = False
                continue
        elif year > options.maximum_valid_year \
                and not options.ignore_maximum_year:
            if options.clamp_maximum_year:
                year = options.maximum_valid_year
                yearstr = str(year).zfill(4 if year >= 0 else 5)
                fix = True
            else:
                ok[i] = False
                continue
        if monthstr is not None and int(monthstr) == 0:
            if options.repair_month_or_day_zero:
                monthstr, fix = "01", True
            elif not options.allow_month_or_day_zero:
                ok[i] = False
                continue
        if daystr is not None and int(daystr) == 0:
            if options.repair_month_or_day_zero:
                daystr, fix = "01", True
            elif not options.allow_month_or_day_zero:
                ok[i] = False
                continue
        hour = mt.group("hour")
        if hour is not None and int(hour) == 24:
            minutes, seconds = mt.group("minutes"), mt.group("seconds")
            if (minutes is not None and int(minutes) > 0) or \
                    (seconds is not None and int(seconds) > 0):
                ok[i] = False
                continue
            if not options.allow_end_of_day:
                ok[i] = False
                continue
        if fix:
            hyphen = "-" if mt.group("hyphen") else ""
            rebuilt = "^" + yearstr
            if monthstr is not None:
                rebuilt += hyphen + monthstr
                if daystr is not None:
                    rebuilt += hyphen + daystr
            time_start = mt.end("day") if daystr is not None else (
                mt.end("month") if monthstr is not None else mt.end("year"))
            rebuilt += v[time_start:]
            out[i] = rebuilt

    # lists: every element must be valid under the same options
    for i in np.flatnonzero(types == "list"):
        parts = _LIST_RE.split(s.iloc[i])
        if not parts:
            ok[i] = False
            continue
        pv, pr = validate_with_options(np.array(parts, dtype=object),
                                       options)
        ok[i] = bool(pv.all())
        if ok[i] and not np.array_equal(pr, np.array(parts, dtype=object)):
            out[i] = "|".join(map(str, pr))

    return ok, out


def _match_mask(s: pd.Series, pattern: re.Pattern) -> np.ndarray:
    return s.str.match(pattern).fillna(False).to_numpy(dtype=bool)


def classify(values) -> np.ndarray:
    """Classify an array of KGTK value strings -> array of type names.

    Vectorized equivalent of the reference's per-cell ``classify()``,
    same precedence order.
    """
    s = pd.Series(np.asarray(values, dtype=object)).fillna("").astype(str)
    n = len(s)
    out = np.full(n, "symbol", dtype=object)
    undecided = np.ones(n, dtype=bool)

    def assign(mask: np.ndarray, t: str) -> None:
        nonlocal undecided
        m = mask & undecided
        out[m] = t
        undecided &= ~m

    # Sigil dispatch, as in the reference: classify() decides the type
    # from the first character alone (is_string :984-997 etc.); whether
    # the value is VALID for that type is validate()'s job.  The only
    # content-sensitive split is number-vs-quantity (:1732-1737 — a
    # number_or_quantity that fails the strict number grammar is a
    # quantity).
    assign((s == "").to_numpy(), "empty")
    assign(s.str.contains(_LIST_RE, regex=True).fillna(False).to_numpy(dtype=bool), "list")
    first = s.str[0].fillna("").to_numpy(dtype=object)
    assign(first == '"', "string")
    assign(first == "'", "language_qualified_string")
    numberish = np.isin(first, list("+-.0123456789"))
    assign(numberish & _match_mask(s, NUMBER_RE), "number")
    assign(numberish, "quantity")
    assign(first == "@", "location_coordinates")
    assign(first == "^", "date_and_times")
    assign(first == "!", "extension")
    assign(np.isin(s.to_numpy(dtype=object), ["True", "False"]), "boolean")
    # remainder stays "symbol"
    return out


def validate(values) -> np.ndarray:
    """True where the cell is a valid KGTK value.

    Invalid cases are the sigil-typed strings that fail their type's
    grammar (a cell starting with ``"`` that is not a proper string,
    ``@`` not proper coordinates, ``^`` not a proper date, etc.) plus
    out-of-range coordinates/dates. Symbols are valid unless they
    contain whitespace or unescaped list separators.
    """
    s = pd.Series(np.asarray(values, dtype=object)).fillna("").astype(str)
    types = classify(s.to_numpy())
    ok = np.ones(len(s), dtype=bool)
    sym = types == "symbol"
    # sigil-classified values must satisfy their type's grammar
    for t, rx in (("string", STRING_RE),
                  ("language_qualified_string", LQSTRING_RE),
                  ("quantity", QUANTITY_RE)):
        m = types == t
        if m.any():
            ok &= ~(m & ~_match_mask(s, rx))
    # symbols must not contain tabs/newlines
    ok &= ~(sym & s.str.contains(r"[\t\n\r]", regex=True).fillna(False).to_numpy(dtype=bool))
    # grammar + range checks on coordinates
    coords = types == "location_coordinates"
    if coords.any():
        ok &= ~(coords & ~_match_mask(s, COORDS_RE))
        ext = s[coords].str.extract(COORDS_RE)
        lat = pd.to_numeric(ext["latitude"], errors="coerce")
        lon = pd.to_numeric(ext["longitude"], errors="coerce")
        good = ((lat >= -90) & (lat <= 90) & (lon >= -180) & (lon <= 180)
                ).fillna(False).to_numpy()
        idx = np.where(coords)[0]
        ok[idx] &= good
    # extensions are reserved and always invalid
    # (kgtk/value/kgtkvalue.py:1695-1707)
    ok &= ~(types == "extension")
    # grammar + range checks on dates: strict defaults of
    # KgtkValueOptions — month/day zero invalid (repairable), year in
    # [1583, 2100] (kgtk/value/kgtkvalueoptions.py:32,79-85)
    dates = types == "date_and_times"
    if dates.any():
        ok &= ~(dates & ~_match_mask(s, DATE_RE))
        ext = s[dates].str.extract(DATE_RE)
        year = pd.to_numeric(ext["year"], errors="coerce")
        month = pd.to_numeric(ext["month"], errors="coerce")
        day = pd.to_numeric(ext["day"], errors="coerce")
        hour = pd.to_numeric(ext["hour"], errors="coerce")
        good = (
            (year.isna() | ((year >= 1583) & (year <= 2100)))
            & (month.isna() | ((month >= 1) & (month <= 12)))
            & (day.isna() | ((day >= 1) & (day <= 31)))
            & (hour.isna() | ((hour >= 0) & (hour <= 24)))
        ).to_numpy()
        idx = np.where(dates)[0]
        ok[idx] &= good
    # each element of a list must itself be valid (lists of lists impossible)
    lists = types == "list"
    if lists.any():
        for i in np.where(lists)[0]:
            parts = _LIST_RE.split(s.iloc[i])
            ok[i] = bool(parts) and validate(np.array(parts, dtype=object)).all()
    return ok


def repair(values) -> np.ndarray:
    """Apply the reference's default repairs vectorized:
    month/day zero -> 01 in dates (kgtk/value/kgtkvalue.py:1529-1560),
    longitude wrap to [-180,180], latitude clamp to [-90,90]
    (kgtk/value/kgtkvalueoptions.py:89-105)."""
    s = pd.Series(np.asarray(values, dtype=object)).fillna("").astype(str)
    types = classify(s.to_numpy())
    out = s.to_numpy(dtype=object).copy()

    dates = types == "date_and_times"
    if dates.any():
        fixed = s[dates].str.replace(r"^(\^[+-]?\d{3,4})-00", r"\g<1>-01", regex=True)
        fixed = fixed.str.replace(r"^(\^[+-]?\d{3,4}-\d{2})-00", r"\g<1>-01", regex=True)
        out[np.where(dates)[0]] = fixed.to_numpy(dtype=object)

    coords = np.isin(classify(out), ["location_coordinates"]) | (
        pd.Series(out).str.match(r"^@[+-]?\d").fillna(False).to_numpy(dtype=bool)
    )
    if coords.any():
        sub = pd.Series(out[coords]).str.extract(r"^@(?P<lat>[^/]+)/(?P<lon>.+)$")
        lat = pd.to_numeric(sub["lat"], errors="coerce").clip(-90, 90)
        lon = pd.to_numeric(sub["lon"], errors="coerce")
        lon = ((lon + 180) % 360) - 180
        okm = lat.notna() & lon.notna()
        fixed = "@" + lat.map(lambda v: f"{v:.6f}".rstrip("0").rstrip(".") if v == v else "") + "/" + lon.map(
            lambda v: f"{v:.6f}".rstrip("0").rstrip(".") if v == v else ""
        )
        vals = out[coords]
        vals[okm.to_numpy()] = fixed[okm].to_numpy(dtype=object)
        out[np.where(coords)[0]] = vals
    return out


# Field lists per data type, mirroring the reference's DATA_TYPE_FIELDS
# (kgtk/value/kgtkvalue.py:240-272): these are the columns explode emits.
DATA_TYPE_FIELDS: dict[str, list[str]] = {
    "empty": [],
    "list": [],
    "number": ["number"],
    "quantity": ["number", "low_tolerance", "high_tolerance", "si_units", "units_node"],
    "string": ["text"],
    "language_qualified_string": ["text", "language", "language_suffix"],
    "location_coordinates": ["latitude", "longitude"],
    "date_and_times": [
        "year", "month", "day", "hour", "minutes", "seconds", "zonestr", "precision",
    ],
    "extension": [],
    "boolean": ["truth"],
    "symbol": ["symbol"],
}
ALL_FIELDS = [
    "data_type", "valid", "list_len", "number", "low_tolerance",
    "high_tolerance", "si_units",
    "units_node", "text", "language", "language_suffix", "latitude", "longitude",
    "date_and_time",
    "year", "month", "day", "hour", "minutes", "seconds", "zonestr", "precision",
    "truth", "symbol",
]
# The reference explode's default field selection
# (kgtk/value/kgtkvalue.py:169-187 DEFAULT_FIELD_NAMES) — the date
# component fields (year..zonestr) are opt-in there too.
DEFAULT_EXPLODE_FIELDS = [
    "data_type", "valid", "list_len", "text", "language",
    "language_suffix", "number", "low_tolerance", "high_tolerance",
    "si_units", "units_node", "latitude", "longitude", "date_and_time",
    "precision", "truth", "symbol",
]
_NUMERIC_FIELDS = {
    "number", "low_tolerance", "high_tolerance", "latitude", "longitude",
    "year", "month", "day", "hour", "minutes", "seconds", "precision",
    "list_len",
}

# Fields the reference renders as KGTK strings ('"'+v+'"') when exploded
# into output cells (kgtk/value/kgtkvalue.py:198-238 FIELD_NAME_FORMATS
# "str" entries, applied at kgtk/reshape/kgtkexplode.py:203-215).
STR_CELL_FIELDS = {"text", "zonestr", "date_and_time"}


def explode_fields(values) -> pd.DataFrame:
    """Decompose an array of KGTK values into typed field columns
    (the reference's explode, kgtk/reshape/kgtkexplode.py)."""
    s = pd.Series(np.asarray(values, dtype=object)).fillna("").astype(str).reset_index(drop=True)
    types = classify(s.to_numpy())
    valid = validate(s.to_numpy())
    df = pd.DataFrame(index=s.index)
    df["data_type"] = types
    df["valid"] = valid

    def put(mask: np.ndarray, ext: pd.DataFrame) -> None:
        for col in ext.columns:
            if col not in df.columns:
                df[col] = pd.Series([None] * len(s), dtype=object)
            df.loc[mask, col] = ext[col].to_numpy(dtype=object)

    m = types == "number"
    if m.any():
        put(m, pd.DataFrame({"number": s[m].to_numpy(dtype=object)}, index=s.index[m]))
    m = types == "quantity"
    if m.any():
        ext = s[m].str.extract(QUANTITY_RE)
        put(m, ext[["number", "low", "high", "si_units", "units_node"]].rename(
            columns={"low": "low_tolerance", "high": "high_tolerance"}))
    m = types == "string"
    if m.any():
        put(m, pd.DataFrame({"text": s[m].str.slice(1, -1).to_numpy(dtype=object)},
                            index=s.index[m]))
    m = types == "language_qualified_string"
    if m.any():
        ext = s[m].str.extract(LQSTRING_RE)
        put(m, ext[["text", "language", "language_suffix"]])
    m = types == "location_coordinates"
    if m.any():
        put(m, s[m].str.extract(COORDS_RE)[["latitude", "longitude"]])
    m = types == "date_and_times"
    if m.any():
        ext = s[m].str.extract(DATE_RE)
        put(m, ext[["year", "month", "day", "hour", "minutes", "seconds", "zonestr",
                    "precision"]])
        # reference DATE_AND_TIMES_FIELD_NAME: the datetime string minus
        # the '^' sigil and any '/precision' suffix
        dt = s[m].str.slice(1).str.replace(r"/\d+$", "", regex=True)
        put(m, pd.DataFrame({"date_and_time": dt.to_numpy(dtype=object)},
                            index=s.index[m]))

    # reference LIST_LEN_FIELD_NAME: 0 for non-lists, item count for lists
    df["list_len"] = 0
    m = types == "list"
    if m.any():
        df.loc[m, "list_len"] = s[m].map(lambda v: len(_LIST_RE.split(v)))
    m = types == "boolean"
    if m.any():
        put(m, pd.DataFrame({"truth": (s[m] == "True").to_numpy(dtype=object)},
                            index=s.index[m]))
    m = types == "symbol"
    if m.any():
        put(m, pd.DataFrame({"symbol": s[m].to_numpy(dtype=object)}, index=s.index[m]))

    for col in ALL_FIELDS:
        if col not in df.columns:
            df[col] = pd.Series([None] * len(s), dtype=object)
    for col in _NUMERIC_FIELDS:
        if col == "number":
            continue
        df[col] = pd.to_numeric(df[col], errors="coerce")
    # the reference parses the number token as int when it matches the
    # int grammar, float otherwise (kgtk/value/kgtkvalue.py fields.number
    # = int(numberstr) or float(numberstr)) — keep that distinction so
    # 12345 renders "12345" but 186.2e04 renders "1862000.0"
    df["number"] = pd.Series(
        [_parse_number_token(v) for v in df["number"]],
        dtype=object, index=df.index)  # keep int/float mixed (map() would refloat)
    return df[ALL_FIELDS]


_INT_TOKEN_RE = re.compile(
    r"^[-+]?(?:\d+|0[xX][0-9a-fA-F]+|0[oO][0-7]+|0[bB][01]+)$")


def _parse_number_token(v):
    if v is None or not isinstance(v, str) or v == "":
        return None
    if _INT_TOKEN_RE.match(v):
        try:
            return int(v, 0)
        except ValueError:  # leading zeros reject base 0
            return int(v)
    try:
        return float(v)
    except ValueError:
        return None


def _unwrap_field(v: str) -> str:
    """Strip one optional outer string wrapper from an exploded field
    (reference kgtk/reshape/kgtkimplode.py:74-101 unwrap: triple
    double/single quotes first, then one double/single-quote layer; no
    unescaping, no undoubling)."""
    if len(v) >= 6 and (v[:3] == '"""' and v[-3:] == '"""'
                        or v[:3] == "'''" and v[-3:] == "'''"):
        return v[3:-3]
    if len(v) >= 2 and (v[0] == v[-1] == '"' or v[0] == v[-1] == "'"):
        return v[1:-1]
    return v


# a raw | inside an imploded value must come out pipe-escaped (the
# reference's stringify / escape_pipes=True default); already-escaped
# pipes pass through
_RAW_PIPE_RE = re.compile(r"(?<!\\)\|")


def implode_fields(df: pd.DataFrame) -> pd.Series:
    """Rebuild KGTK value strings from exploded field columns
    (inverse of explode; reference kgtk/reshape/kgtkimplode.py).
    Numeric fields may arrive as numbers (our explode) or as the
    reference's field strings (partially exploded input) — strings are
    emitted verbatim after unwrapping, as the reference does
    (implode_number kgtkimplode.py:125-149)."""
    n = len(df)
    out = pd.Series([""] * n, dtype=object, index=df.index)
    t = df["data_type"].astype(str)

    def numfmt(v) -> str:
        if pd.isna(v):
            return ""
        if isinstance(v, str):
            return _unwrap_field(v)
        f = float(v)
        return str(int(f)) if f == int(f) else repr(f)

    m = t == "number"
    out[m] = df.loc[m, "number"].map(numfmt)
    m = t == "quantity"
    if m.any():
        def has(x) -> bool:
            # empty strings mean "field absent" (TSV-read exploded
            # inputs carry "" rather than null)
            return pd.notna(x) and (not isinstance(x, str) or x != "")

        def q(row):
            v = numfmt(row["number"])
            if has(row.get("low_tolerance")) and has(row.get("high_tolerance")):
                v += f"[{numfmt(row['low_tolerance'])},{numfmt(row['high_tolerance'])}]"
            if isinstance(row.get("units_node"), str) and row["units_node"]:
                v += row["units_node"]
            elif isinstance(row.get("si_units"), str) and row["si_units"]:
                v += row["si_units"]
            return v
        out[m] = df[m].apply(q, axis=1)
    def body(texts: pd.Series) -> pd.Series:
        return texts.fillna("").astype(str).map(
            lambda s: _RAW_PIPE_RE.sub(r"\\|", s))

    m = t == "string"
    out[m] = '"' + body(df.loc[m, "text"]) + '"'
    m = t == "language_qualified_string"
    if m.any():
        suffix = df.loc[m, "language_suffix"]
        suf = suffix.map(lambda x: f"-{x}" if isinstance(x, str) and x else "")
        out[m] = ("'" + body(df.loc[m, "text"]) + "'@"
                  + df.loc[m, "language"].fillna("").astype(str) + suf)
    m = t == "location_coordinates"
    if m.any():
        out[m] = ("@" + df.loc[m, "latitude"].map(numfmt) + "/"
                  + df.loc[m, "longitude"].map(numfmt))
    m = t == "date_and_times"
    if m.any():
        def d(row):
            # the reference implodes from the date_and_time STRING
            # field + precision (kgtk/reshape/kgtkimplode.py:365-390),
            # not from the numeric parts; fall back to numeric
            # reconstruction only when that field is absent/empty
            dt = row.get("date_and_time")
            if isinstance(dt, str) and dt:
                v = "^" + dt
                p = row.get("precision")
                if pd.notna(p) and str(p) != "":
                    v += f"/{int(float(p))}"
                return v

            def i2(v):
                return f"{int(v):02d}" if pd.notna(v) else None
            v = "^" + f"{int(row['year']):04d}"
            if i2(row.get("month")):
                v += "-" + i2(row["month"])
                if i2(row.get("day")):
                    v += "-" + i2(row["day"])
            if i2(row.get("hour")):
                v += "T" + i2(row["hour"])
                if i2(row.get("minutes")):
                    v += ":" + i2(row["minutes"])
                    if i2(row.get("seconds")):
                        v += ":" + i2(row["seconds"])
                z = row.get("zonestr")
                if isinstance(z, str) and z:
                    v += z
            if pd.notna(row.get("precision")):
                v += f"/{int(row['precision'])}"
            return v
        out[m] = df[m].apply(d, axis=1)
    m = t == "boolean"
    out[m] = df.loc[m, "truth"].map(lambda b: "True" if b else "False")
    m = t == "symbol"
    # reference implode_symbol unwraps an optionally-quoted field
    # (kgtkimplode.py:434-449)
    out[m] = df.loc[m, "symbol"].fillna("").astype(str).map(_unwrap_field)
    return out
