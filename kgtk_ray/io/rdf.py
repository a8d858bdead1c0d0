"""RDF N-triples import/export as Ray Data batch transforms.

Reimplements the semantics of the reference's ``import-ntriples``
(/root/reference/kgtk/imports/kgtkntriples.py) and the spirit of
``generate-wikidata-triples`` (/root/reference/kgtk/generator.py) —
but as vectorized ``map_batches`` stages over Arrow/pandas batches
instead of a row loop, and with the namespace table supplied up front
(broadcast into the batch closure) rather than evolved in-process
(reference kgtk/imports/kgtkntriples.py:419-512).  At 100 TB an
evolving shared mutable prefix map would serialize the pipeline; a
two-pass design (optional discovery pass -> broadcast map) keeps the
import embarrassingly parallel.

Conversion rules mirror the reference:

* ``<uri>``           -> longest-matching namespace prefix ``ns:suffix``
  (kgtk/imports/kgtkntriples.py:199-262); unmatched URIs keep the
  longest slash/hash-terminated section as an on-the-fly prefix is NOT
  done here — they stay as ``<uri>`` symbols (lax mode).
* ``_:b``             -> local namespace prefix + ``:b``
  (kgtk/imports/kgtkntriples.py:192-197).
* ``"s"``             -> KGTK string ``"s"`` (pipes escaped).
* ``"s"@lang``        -> KGTK lq-string ``'s'@lang``.
* ``"v"^^xsd:int/double/float/decimal`` -> bare number
  (kgtk/imports/kgtkntriples.py:331-343).
* ``"v"^^xsd:boolean``-> ``True``/``False`` symbols (:301-309).
* ``"v"^^xsd:dateTime``-> ``^v`` date-and-times (:348-353).
* ``"v"^^xsd:string`` -> KGTK string (:329-330).
"""
from __future__ import annotations

import re

import pandas as pd
import ray.data

Dataset = ray.data.Dataset

# One N-triples line, mirroring the reference row grammar
# (kgtk/imports/kgtkntriples.py:100-120): each field is a URI, blank
# node, string literal with optional ^^<datatype>, or bare numeric;
# single-whitespace separators and a trailing " .".  Extension: we also
# accept "text"@lang literals (the reference grammar omits them and
# rejects such lines).
_URI = r'(?:<[^>]+>)'
_BNODE = r'(?:_:[0-9a-zA-Z_]+)'
_STRING = r'"(?:[^"\\]|\\.)*"'
_NUMBER = r'(?:[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)'
_FIELD = rf'(?:{_URI}|{_BNODE}|{_STRING}(?:@[A-Za-z0-9-]+|\^\^{_URI})?|{_NUMBER})'
_NT_RE = re.compile(rf'^({_FIELD})\s({_FIELD})\s({_FIELD})\s\.$')

XSD = "http://www.w3.org/2001/XMLSchema#"
# the reference's structured-literal shortcuts
# (kgtkntriples.py:328-340): ONLY these four datatypes become bare
# KGTK numbers (integer/long/short literals reify instead)
_NUMERIC_TYPES = {XSD + t for t in ("int", "double", "float", "decimal")}

DEFAULT_NAMESPACES = {
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#": "rdf",
    "http://www.w3.org/2000/01/rdf-schema#": "rdfs",
    "http://www.w3.org/2001/XMLSchema#": "xsd",
    "http://www.w3.org/2002/07/owl#": "owl",
    "http://schema.org/": "schema",
}

_SLASH_HASH = re.compile(r"[/#]")


def _uri_sections(body: str) -> list[str]:
    """Slash/hash-terminated prefixes of ``body`` after the scheme,
    longest first (reference kgtkntriples.py:226-238)."""
    ss = body.rfind("://")
    start = ss + 3 if ss >= 1 else 0
    ends = [m.end(0) for m in _SLASH_HASH.finditer(body, start)]
    return [body[:e] for e in reversed(ends)]


def _convert_uri(body: str, namespaces: dict[str, str]) -> str:
    """Reference convert_uri (kgtkntriples.py:199-262): exact body
    match, then right-to-left longest section match; unmatched bodies
    keep their angle brackets (namespace allocation happens in
    import_ntriples' discovery pass)."""
    if body in namespaces:
        return namespaces[body] + ":"
    for sect in _uri_sections(body):
        if sect in namespaces:
            return namespaces[sect] + ":" + body[len(sect):]
    return "<" + body + ">"


def _escape_pipes(s: str) -> str:
    return s.replace("|", "\\|")


def _convert_term(item: str, namespaces: dict[str, str],
                  local_ns: str = "X",
                  newnodes: dict | None = None,
                  pos: int | None = None,
                  extra_rows: list | None = None) -> str:
    """Reference convert() (kgtkntriples.py:372-392).  ``newnodes``
    maps a term position to its reified node symbol for
    unknown-datatype structured literals; the two reification rows are
    appended to ``extra_rows``."""
    if item.startswith("_:"):
        return local_ns + item[1:]
    if item.startswith("<"):
        return _convert_uri(item[1:-1], namespaces)
    if item.startswith('"'):
        if item.endswith('"'):
            return _escape_pipes(item)  # plain KGTK string
        up = item.rfind('"^^<')
        if up >= 0:
            value = item[1:up]
            dtype = item[up + 4:-1]
            if dtype == XSD + "string":
                return _escape_pipes('"' + value + '"')
            if dtype in _NUMERIC_TYPES:
                return value
            if dtype == XSD + "boolean":
                if value in ("true", "1"):
                    return "True"
                if value in ("false", "0"):
                    return "False"
                return item  # reference keeps the raw literal
            if dtype == XSD + "dateTime":
                return "^" + value
            # unknown datatype: reify (kgtkntriples.py:348-365)
            conv = _convert_uri(dtype, namespaces)
            if newnodes is not None and pos in newnodes:
                sym = newnodes[pos]
                if extra_rows is not None:
                    extra_rows.append((sym, "kgtk:structured_value",
                                       _escape_pipes('"' + value + '"')))
                    extra_rows.append((sym, "kgtk:structured_uri", conv))
                return sym
            return item
        at = item.rfind('"@')
        if at >= 0:  # extension: lang-tagged literal -> lq-string
            return "'" + item[1:at] + "'@" + item[at + 2:]
    return item  # bare numeric (reference convert_numeric passes through)


def _parse_batch(df: pd.DataFrame, line_col: str) -> pd.DataFrame:
    ext = df[line_col].astype(str).str.rstrip("\r\n").str.extract(_NT_RE)
    ext.columns = ["s", "p", "o"]
    out = ext.dropna().reset_index(drop=True)
    return out


def _unknown_dtype_pos(term: str, namespaces: dict[str, str]) -> bool:
    """True when the term is a structured literal whose datatype URI is
    not one of the built-in conversions (it will reify)."""
    if not term.startswith('"') or not term.endswith(">"):
        return False
    up = term.rfind('"^^<')
    if up < 0:
        return False
    dtype = term[up + 4:-1]
    return not (dtype == XSD + "string" or dtype in _NUMERIC_TYPES
                or dtype == XSD + "boolean" or dtype == XSD + "dateTime")


def import_ntriples(lines: Dataset, *, line_col: str = "line",
                    namespaces: dict[str, str] | None = None,
                    allocate_namespaces: bool = True,
                    output_namespaces: bool = True,
                    local_namespace_prefix: str = "X",
                    namespace_id_prefix: str = "n",
                    newnode_prefix: str = "kgtk:node") -> Dataset:
    """Parse a Dataset of N-triples text lines into KGTK edges
    ``(node1, label, node2)`` per the reference importer
    (kgtk/imports/kgtkntriples.py, --local-namespace-use-uuid False):

    * blank nodes get ``local_namespace_prefix``;
    * URIs match the namespace table (exact body, then right-to-left
      longest slash/hash section); unmatched URIs allocate new
      namespace ids ``n1, n2, ...`` in first-occurrence order
      (``allocate_namespaces``);
    * structured literals convert per datatype: xsd int/double/float/
      decimal -> bare number, boolean -> True/False (invalid booleans
      keep the raw literal, matching the reference's pass-through),
      dateTime -> ``^value``, string -> KGTK string; UNKNOWN datatypes
      reify into ``kgtk:nodeN`` plus two rows (kgtk:structured_value /
      kgtk:structured_uri), numbered in first-occurrence order;
    * used namespaces append as ``(nsid, prefix_expansion, "uri")``
      rows (``output_namespaces``, reference used-only default);
    * unparseable lines drop (the reference routes them to a reject
      file).  Extension: ``"text"@lang`` literals import as KGTK
      lq-strings instead of being rejected by the row grammar.

    Scale shape: the discovery pass reduces to a namespace-count-sized
    driver table (distinct longest-sections + min first-position) and a
    reified-literal position table; conversion is one stateless pass
    with the final namespace map broadcast.
    """
    ns = dict(DEFAULT_NAMESPACES if namespaces is None else namespaces)

    if not allocate_namespaces:
        def parse_simple(df: pd.DataFrame) -> pd.DataFrame:
            ext = _parse_batch(df, line_col)
            return pd.DataFrame({
                "node1": ext.s.map(lambda t: _convert_term(
                    t, ns, local_namespace_prefix)),
                "label": ext.p.map(lambda t: _convert_term(
                    t, ns, local_namespace_prefix)),
                "node2": ext.o.map(lambda t: _convert_term(
                    t, ns, local_namespace_prefix)),
            })
        return lines.map_batches(parse_simple, batch_format="pandas")

    from ..ops._rowindex import add_row_index

    idx = add_row_index(lines, "__order__")

    # ---- discovery pass: namespace sections + reified positions ----
    def discover(df: pd.DataFrame) -> pd.DataFrame:
        ext = df[line_col].astype(str).str.rstrip("\r\n").str.extract(_NT_RE)
        ext.columns = ["s", "p", "o"]
        ext["__order__"] = df["__order__"].to_numpy()
        ext = ext.dropna()
        rows = []
        for s, p, o, order in ext.itertuples(index=False):
            for slot, term in enumerate((s, p, o)):
                pos = int(order) * 3 + slot
                bodies = []
                if term.startswith("<"):
                    bodies.append(term[1:-1])
                elif _unknown_dtype_pos(term, {}):
                    up = term.rfind('"^^<')
                    dtype = term[up + 4:-1]
                    if not (dtype == XSD + "string"
                            or dtype in _NUMERIC_TYPES
                            or dtype == XSD + "boolean"
                            or dtype == XSD + "dateTime"):
                        bodies.append(dtype)
                    rows.append(("", pos, 1))  # reified literal marker
                for body in bodies:
                    if body in ns:
                        continue
                    sects = _uri_sections(body)
                    if any(s_ in ns for s_ in sects):
                        continue  # resolves against the initial table
                    key = sects[0] if sects else body
                    rows.append((key, pos, 0))
        return pd.DataFrame(rows, columns=["pfx", "pos", "reify"])

    found = idx.map_batches(discover, batch_format="pandas")
    from ..ops.agg import grouped_aggregate
    firsts = grouped_aggregate(
        found.map_batches(
            lambda df: df[df["reify"] == 0]
            .groupby("pfx", as_index=False).agg(pos=("pos", "min")),
            batch_format="pandas"),
        ["pfx"], {"pos": ("pos", "min")}).to_pandas()

    # emulate the reference's incremental allocation over the (small)
    # distinct longest-section table in first-occurrence order
    counter = 1
    order = firsts.sort_values("pos")["pfx"] if len(firsts) else []
    for pfx in order:
        if pfx in ns:
            continue
        if any(s_ in ns for s_ in _uri_sections(pfx)):
            continue  # an earlier allocation's section covers it
        while f"{namespace_id_prefix}{counter}" in ns.values():
            counter += 1
        ns[pfx] = f"{namespace_id_prefix}{counter}"
        counter += 1

    # reified-literal numbering: rank by first-occurrence position
    rp = found.map_batches(
        lambda df: df.loc[df["reify"] == 1, ["pos"]],
        batch_format="pandas").to_pandas()
    reify_pos = sorted(rp["pos"]) if len(rp) else []
    newnodes = {int(p): f"{newnode_prefix}{i + 1}"
                for i, p in enumerate(reify_pos)}
    nref = ray.put((ns, newnodes))

    used: set[str] = set()

    def convert(df: pd.DataFrame) -> pd.DataFrame:
        nsm, nn = ray.get(nref)
        ext = df[line_col].astype(str).str.rstrip("\r\n").str.extract(_NT_RE)
        ext.columns = ["s", "p", "o"]
        ext["__order__"] = df["__order__"].to_numpy()
        ext = ext.dropna()
        extra: list = []
        out = {"node1": [], "label": [], "node2": []}
        for s, p, o, order in ext.itertuples(index=False):
            base = int(order) * 3
            out["node1"].append(_convert_term(
                s, nsm, local_namespace_prefix, nn, base, extra))
            out["label"].append(_convert_term(
                p, nsm, local_namespace_prefix, nn, base + 1, extra))
            out["node2"].append(_convert_term(
                o, nsm, local_namespace_prefix, nn, base + 2, extra))
        res = pd.DataFrame(out)
        if extra:
            res = pd.concat(
                [pd.DataFrame(extra, columns=["node1", "label", "node2"]),
                 res], ignore_index=True)
        return res

    out = idx.map_batches(convert, batch_format="pandas")

    if output_namespaces:
        out = out.materialize()  # consumed twice: rows + used-id scan
        # used-only namespace rows (reference write_namespaces_to_output
        # :476-484, sorted by namespace id).  "used" = any body/section
        # hit — recompute from the tiny allocation table + one distinct
        # scan of converted prefixes.
        def used_ids(df: pd.DataFrame) -> pd.DataFrame:
            ids = set()
            for col in ("node1", "label", "node2"):
                pre = df[col].astype(str).str.split(":", n=1).str[0]
                ids.update(pre.unique())
            return pd.DataFrame({"nsid": sorted(ids)})

        inv = {v: k for k, v in ns.items()}
        udf = out.map_batches(used_ids, batch_format="pandas").to_pandas()
        uids = sorted(set(udf["nsid"]) & set(inv)) if len(udf) else []
        if uids:
            nsrows = pd.DataFrame({
                "node1": uids, "label": "prefix_expansion",
                "node2": ['"' + inv[u] + '"' for u in uids]})
            out = out.union(ray.data.from_pandas(nsrows))
    return out


def _expand_term(term: str, namespaces_inv: dict[str, str]) -> str:
    """KGTK symbol/value -> N-triples term (inverse of _convert_term)."""
    if term.startswith('"'):
        return term
    if term.startswith("'"):
        at = term.rfind("'@")
        return '"' + term[1:at] + '"@' + term[at + 2:]
    if term.startswith("^"):
        return '"' + term[1:] + '"^^<' + XSD + 'dateTime>'
    if term in ("True", "False"):
        return '"' + term.lower() + '"^^<' + XSD + 'boolean>'
    colon = term.find(":")
    if colon > 0:
        nsid, suffix = term[:colon], term[colon + 1:]
        if nsid in namespaces_inv:
            return "<" + namespaces_inv[nsid] + suffix + ">"
    try:
        float(term)
        return '"' + term + '"^^<' + XSD + 'decimal>'
    except ValueError:
        pass
    return "<" + term + ">"  # bare symbol: treat as relative URI


def generate_ntriples(edges: Dataset, *, namespaces: dict[str, str] | None = None,
                      base_uri: str = "http://example.org/") -> Dataset:
    """KGTK edges -> N-triples lines (the scale path of the reference's
    generate-wikidata-triples, kgtk/generator.py:264-272, minus the
    etk/Wikidata-specific statement grouping).

    Symbols without a known namespace prefix are minted under
    ``base_uri``.  Pure ``map_batches`` — embarrassingly parallel.
    """
    ns = dict(DEFAULT_NAMESPACES if namespaces is None else namespaces)
    inv = {v: k for k, v in ns.items()}

    def to_uri(sym: pd.Series) -> pd.Series:
        return sym.map(lambda t: _expand_sym(t, inv, base_uri))

    def _expand_sym(term: str, inv: dict[str, str], base: str) -> str:
        colon = term.find(":")
        if colon > 0 and term[:colon] in inv:
            return "<" + inv[term[:colon]] + term[colon + 1:] + ">"
        return "<" + base + term + ">"

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        s = df["node1"].map(lambda t: _expand_sym(t, inv, base_uri))
        p = df["label"].map(lambda t: _expand_sym(t, inv, base_uri))
        o = df["node2"].map(lambda t: _expand_term(t, inv)
                            if (t[:1] in '"\'^' or t in ("True", "False")
                                or _is_num(t))
                            else _expand_sym(t, inv, base_uri))
        return pd.DataFrame({"line": s + " " + p + " " + o + " ."})

    def _is_num(t: str) -> bool:
        try:
            float(t)
            return True
        except ValueError:
            return False

    return edges.map_batches(gen, batch_format="pandas")


# ---------------------------------------------------------------------------
# etk-faithful Turtle generation (generate-wikidata-triples)
# ---------------------------------------------------------------------------
# Byte-exact re-implementation of the reference TripleGenerator's truthy
# ttl output (/root/reference/kgtk/generator.py:222-447 + etk/rdflib
# serialization, golden files kgtk/tests/data/P10_truthy.ttl and
# Q57160439_truthy.ttl): qualifier edges group with their statement edge
# by id prefix, predicates sort rdf:type -> rdfs:label -> full-URI
# order, object lists sort by token, referenced items close the block
# list as sorted `wd:Q... a wikibase:Item .` stanzas.

TTL_HEADER = """@prefix wikibase: <http://wikiba.se/ontology#> .
@prefix wd: <http://www.wikidata.org/entity/> .
@prefix wdt: <http://www.wikidata.org/prop/direct/> .
@prefix wdtn: <http://www.wikidata.org/prop/direct-normalized/> .
@prefix wdno: <http://www.wikidata.org/prop/novalue/> .
@prefix wds: <http://www.wikidata.org/entity/statement/> .
@prefix wdv: <http://www.wikidata.org/value/> .
@prefix wdref: <http://www.wikidata.org/reference/> .
@prefix p: <http://www.wikidata.org/prop/> .
@prefix pr: <http://www.wikidata.org/prop/reference/> .
@prefix prv: <http://www.wikidata.org/prop/reference/value/> .
@prefix prn: <http://www.wikidata.org/prop/reference/value-normalized/> .
@prefix ps: <http://www.wikidata.org/prop/statement/> .
@prefix psv: <http://www.wikidata.org/prop/statement/value/> .
@prefix psn: <http://www.wikidata.org/prop/statement/value-normalized/> .
@prefix pq: <http://www.wikidata.org/prop/qualifier/> .
@prefix pqv: <http://www.wikidata.org/prop/qualifier/value/> .
@prefix pqn: <http://www.wikidata.org/prop/qualifier/value-normalized/> .
@prefix prov: <http://www.w3.org/ns/prov#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix schema: <http://schema.org/> .

"""

_TTL_NS = {
    "wikibase": "http://wikiba.se/ontology#",
    "wd": "http://www.wikidata.org/entity/",
    "wdt": "http://www.wikidata.org/prop/direct/",
    "wdtn": "http://www.wikidata.org/prop/direct-normalized/",
    "wdno": "http://www.wikidata.org/prop/novalue/",
    "wds": "http://www.wikidata.org/entity/statement/",
    "p": "http://www.wikidata.org/prop/",
    "pr": "http://www.wikidata.org/prop/reference/",
    "prv": "http://www.wikidata.org/prop/reference/value/",
    "prn": "http://www.wikidata.org/prop/reference/value-normalized/",
    "ps": "http://www.wikidata.org/prop/statement/",
    "psv": "http://www.wikidata.org/prop/statement/value/",
    "psn": "http://www.wikidata.org/prop/statement/value-normalized/",
    "pq": "http://www.wikidata.org/prop/qualifier/",
    "pqv": "http://www.wikidata.org/prop/qualifier/value/",
    "pqn": "http://www.wikidata.org/prop/qualifier/value-normalized/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "schema": "http://schema.org/",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

_TTL_PROPERTY_TYPES = {
    "string": "wikibase:String", "item": "wikibase:WikibaseItem",
    "url": "wikibase:Url", "external-identifier": "wikibase:ExternalId",
    "monolingualtext": "wikibase:Monolingualtext", "time": "wikibase:Time",
    "quantity": "wikibase:Quantity",
    "globe-coordinate": "wikibase:GlobeCoordinate",
}


def _ttl_pred_uri(token: str) -> str:
    """Expand a prefixed token / <uri> for rdflib-style predicate
    sorting (rdf:type first, rdfs:label second, then full-URI order)."""
    if token == "a":
        return ""  # sorts first
    if token == "rdfs:label":
        return "!"  # sorts second
    if token.startswith("<"):
        return token[1:-1]
    pfx, local = token.split(":", 1)
    return _TTL_NS[pfx] + local


def _ttl_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r"))


def _ttl_text(value: str) -> tuple[str, str]:
    """reference process_text_string (generator.py:97-114): strip all
    quote characters, language from the last @ (default en, >2-char
    codes coerced to en)."""
    if not value:
        return "", "en"
    if "@" in value:
        parts = value.split("@")
        text = "@".join(parts[:-1]).replace('"', "").replace("'", "")
        lang = parts[-1].replace('"', "").replace("'", "")
        if len(lang) > 2:
            lang = "en"
    else:
        text = value.replace('"', "").replace("'", "")
        lang = "en"
    return text, lang


_YYYY_MM_DD_RE = re.compile(r"\d{4}-\d{2}-\d{2}$")
_YYYY_RE = re.compile(r"\d{4}$")


def _ttl_time(value: str) -> tuple[str, str] | None:
    """Time parse per the reference's TimeValue branch
    (generator.py:340-380): bare yyyy-mm-dd -> itself at year
    precision (9); bare yyyy -> yyyy-01-01 at year precision; else
    ^ISO8601Z/precision (strip ^ and +, require the /precision, strip
    the trailing Z).  Anything else is "corrupted" — None, and the
    caller drops the statement with its qualifiers (golden
    corrupted.ttl / corrupted_warning.log)."""
    if _YYYY_MM_DD_RE.fullmatch(value):
        return value, "9"
    if _YYYY_RE.fullmatch(value):
        return value + "-01-01", "9"
    v = value
    if not v.startswith("^"):
        return None
    v = v[1:]
    if v.startswith("+"):
        v = v[1:]
    if "/" not in v:
        return None
    v, precision = v.rsplit("/", 1)
    if v.endswith("Z"):
        v = v[:-1]
    return v, precision


def _ttl_time_node(dt: str, precision: str) -> str:
    """etk's Time value-node id: 'Time_{dt}_Q_{precision}_0' with
    colons removed and underscores replaced by 'c' (observed in
    Q57160439_truthy.ttl: wdv:Timec1996-03-05T000000cQc11c0)."""
    raw = f"Time_{dt}_Q_{precision}_0".replace(":", "")
    return "wdv:" + raw.replace("_", "c")


def _ttl_value(value: str, prop_type: str, items: set) -> str | None:
    """Serialize a node2 per its property datatype; collects referenced
    items.  Returns None for values the reference rejects."""
    if prop_type == "item":
        items.add(value)
        return "wd:" + value
    if prop_type == "monolingualtext":
        text, lang = _ttl_text(value)
        return f'"{_ttl_escape(text)}"@{lang}'
    if prop_type == "time":
        parsed = _ttl_time(value)
        return f'"{parsed[0]}"^^xsd:dateTime' if parsed else None
    if prop_type == "quantity":
        from ..values import QUANTITY_RE
        m = QUANTITY_RE.match(value)
        if not m:
            return None
        return _ttl_qty_literal(float(m.group("number")))
    # string / external-identifier / url / fallback
    return f'"{_ttl_escape(value)}"^^xsd:string'


def _ttl_qty_literal(x: float) -> str:
    """Bare Turtle numeric literal for a quantity amount, as rdflib
    serializes the reference's QuantityValue (golden small_values.ttl):
    plain decimal when repr has no exponent (xsd:decimal shorthand,
    "7.0"), else uppercase-E scientific with unpadded exponent
    (xsd:double shorthand, "1.9860001065575846E-7")."""
    r = repr(float(x))
    if "e" not in r and "E" not in r:
        return r
    mant, exp = r.split("e")
    return f"{mant}E{int(exp)}"


def _ttl_qty_node(m) -> str:
    """wdv: value-node name for a quantity match (golden
    small_values.ttl: wdv:Quantityc7c0c0c0 — positional amount with
    '.' -> '-', then three 0 slots for the absent unit/bounds; the
    slot order beyond the golden's all-absent case follows the
    (unit, lower, upper) field order of the reference's
    QuantityValue construction, generator.py:389-410)."""
    import numpy as np
    amount = np.format_float_positional(float(m.group("number")),
                                        trim="-").replace(".", "-") \
        .replace("+", "")
    unit = m.group("units_node") or "0"
    low = m.group("low")
    high = m.group("high")
    fmt = lambda v: (np.format_float_positional(float(v), trim="-")
                     .replace(".", "-").replace("+", "")
                     if v is not None else "0")
    return f"wdv:Quantityc{amount}c{unit}c{fmt(low)}c{fmt(high)}"


def _ttl_block(subject: str, preds: list) -> str:
    """One Turtle stanza in the goldens' rdflib layout: 4-space pred
    indent, 8-space object continuations, sorted predicates/objects."""
    order = sorted(preds, key=lambda po: _ttl_pred_uri(po[0]))
    parts = []
    for pred, objs in order:
        objs = sorted(objs)
        parts.append(pred + " " + ",\n        ".join(objs))
    return subject + " " + " ;\n    ".join(parts) + " .\n"


def _entity_sections(entity: str, rows: pd.DataFrame, prop_types: dict,
                     *, label_set: str = "label",
                     alias_set: str = "aliases",
                     description_set: str = "descriptions",
                     truthy: bool = True):
    """Serialize one entity's edge group (statement edges with
    node1 == entity, qualifier edges with node1 == a statement id)
    into its Turtle sections: ``(entity_block | None, stmt_blocks,
    value_blocks, item_names)``.  The entity block is None when
    nothing serialized for it — the reference only registers an entity
    subject on a successful statement/label (generator.py:443), so an
    entity whose every edge was corrupted vanishes from the output
    (golden corrupted.ttl has no wd:Q1)."""
    import re as _re

    is_prop = bool(_re.fullmatch(r"P\d+", entity))
    ent_tok = "wd:" + entity
    items: set = set()
    preds: list = [("a", ["wikibase:Property" if is_prop
                          else "wikibase:Item"])]

    stmts = rows[rows["node1"] == entity]
    quals = rows[rows["node1"] != entity]
    qual_map: dict = {}
    for _, q in quals.iterrows():
        qual_map.setdefault(q["node1"], []).append((q["label"], q["node2"]))

    def add(pred: str, obj: str) -> None:
        for p, objs in preds:
            if p == pred:
                objs.append(obj)
                return
        preds.append((pred, [obj]))

    if is_prop:
        ptype = _TTL_PROPERTY_TYPES.get(prop_types.get(entity, "string"),
                                        "wikibase:String")
        for wpred, pfx in (("claim", "p"), ("directClaim", "wdt"),
                           ("directClaimNormalized", "wdtn"),
                           ("novalue", "wdno"),
                           ("qualifier", "pq"), ("qualifierValue", "pqv"),
                           ("qualifierValueNormalized", "pqn"),
                           ("reference", "pr"), ("referenceValue", "prv"),
                           ("referenceValueNormalized", "prn"),
                           ("statementProperty", "ps"),
                           ("statementValue", "psv"),
                           ("statementValueNormalized", "psn")):
            add("wikibase:" + wpred, f"{pfx}:{entity}")
        add("wikibase:propertyType", ptype)

    stmt_blocks: list = []
    value_blocks: list = []
    for _, e in stmts.sort_values("id", kind="mergesort").iterrows():
        prop, value, e_id = e["label"], e["node2"], e["id"]
        if prop == label_set:
            text, lang = _ttl_text(value)
            lit = f'"{_ttl_escape(text)}"@{lang}'
            add("rdfs:label", lit)
            add("schema:name", lit)
            add("skos:prefLabel", lit)
            continue
        if prop == description_set:
            text, lang = _ttl_text(value)
            add("schema:description", f'"{_ttl_escape(text)}"@{lang}')
            continue
        if prop == alias_set:
            text, lang = _ttl_text(value)
            add("skos:altLabel", f'"{_ttl_escape(text)}"@{lang}')
            continue
        ptype = prop_types.get(prop, "string")
        vtok = _ttl_value(value, ptype, items)
        if vtok is None:
            continue
        stmt_subj = f"wds:{entity}-{e_id}"
        add("p:" + prop, stmt_subj)
        if truthy:
            # non-truthy mode (reference generator.py:437-443
            # add_statement vs add_truthy_statement; goldens
            # P10_not_truthy.ttl/Q57160439_not_truthy.ttl) emits no
            # direct wdt: claims and ranks NormalRank
            add("wdt:" + prop, vtok)
        spreds = [("a", ["wikibase:Statement"]),
                  ("wikibase:rank", ["wikibase:BestRank" if truthy
                                     else "wikibase:NormalRank"]),
                  ("<http://www.isi.edu/etk/createdBy>",
                   ["<http://www.isi.edu/datamart>"]),
                  ("ps:" + prop, [vtok])]
        if ptype == "quantity":
            # quantity values link to a wdv:Quantity value node via
            # wdtn: (entity, truthy), psv: and psn: (statement), with
            # its own QuantityValue stanza (golden small_values.ttl)
            from ..values import QUANTITY_RE
            qm = QUANTITY_RE.match(value)
            if qm is not None:
                vnode = _ttl_qty_node(qm)
                if truthy:
                    add("wdtn:" + prop, vnode)
                spreds.append(("psv:" + prop, [vnode]))
                spreds.append(("psn:" + prop, [vnode]))
                qpreds = [("a", ["wikibase:QuantityValue"]),
                          ("wikibase:quantityAmount", [vtok]),
                          ("wikibase:quantityNormalized", [vnode])]
                if qm.group("units_node"):
                    qpreds.insert(2, ("wikibase:quantityUnit",
                                      ["wd:" + qm.group("units_node")]))
                block = _ttl_block(vnode, qpreds)
                if block not in value_blocks:
                    value_blocks.append(block)
        if ptype == "time":
            # time values get a psv: link to a wdv:Time value node with
            # its own stanza (golden Q57160439_truthy.ttl:200-215)
            dt, precision = _ttl_time(value)
            vnode = _ttl_time_node(dt, precision)
            spreds.append(("psv:" + prop, [vnode]))
            block = _ttl_block(vnode, [
                ("a", ["wikibase:Time"]),
                ("wikibase:timeCalendarModel", ["wd:Q1985727"]),
                ("wikibase:timePrecision", [precision]),
                ("wikibase:timeTimezone", ["0"]),
                ("wikibase:timeValue", [f'"{dt}"^^xsd:dateTime']),
            ])
            if block not in value_blocks:
                value_blocks.append(block)
        for qprop, qval in qual_map.get(e_id, []):
            qptype = prop_types.get(qprop, "string")
            qtok = _ttl_value(qval, qptype, items)
            if qtok is None:
                continue  # corrupted qualifier dropped alone
            spreds.append(("pq:" + qprop, [qtok]))
            if qptype == "time":
                # time qualifiers also link a pqv: value node sharing
                # the wdv:Time stanza (golden corrupted.ttl)
                qdt, qprec = _ttl_time(qval)
                qnode = _ttl_time_node(qdt, qprec)
                spreds.append(("pqv:" + qprop, [qnode]))
                qblock = _ttl_block(qnode, [
                    ("a", ["wikibase:Time"]),
                    ("wikibase:timeCalendarModel", ["wd:Q1985727"]),
                    ("wikibase:timePrecision", [qprec]),
                    ("wikibase:timeTimezone", ["0"]),
                    ("wikibase:timeValue", [f'"{qdt}"^^xsd:dateTime']),
                ])
                if qblock not in value_blocks:
                    value_blocks.append(qblock)
        stmt_blocks.append(_ttl_block(stmt_subj, spreds))

    if not is_prop and len(preds) == 1 and not stmt_blocks:
        ent_block = None  # nothing serialized for this entity
    else:
        ent_block = _ttl_block(ent_tok, preds)
    return ent_block, stmt_blocks, value_blocks, sorted(items)


def entity_ttl(entity: str, rows: pd.DataFrame, prop_types: dict,
               *, truthy: bool = True, **kw) -> str:
    """One entity's stanzas concatenated in the reference layout
    (truthy: entity, statements, values, items — golden
    P10_truthy.ttl; non-truthy: entity, items, statements, values —
    golden P10_not_truthy.ttl).  Empty string when the entity
    serialized nothing."""
    ent_block, stmt_blocks, value_blocks, items = _entity_sections(
        entity, rows, prop_types, truthy=truthy, **kw)
    if ent_block is None:
        return ""
    item_blocks = [_ttl_block("wd:" + q, [("a", ["wikibase:Item"])])
                   for q in items]
    if truthy:
        blocks = [ent_block] + stmt_blocks + value_blocks + item_blocks
    else:
        blocks = [ent_block] + item_blocks + stmt_blocks + value_blocks
    return "\n".join(blocks)


def generate_wikidata_ttl(edges, prop_types: dict, **kw):
    """KGTK edges -> one (entity, ttl) row per entity, truthy Turtle
    stanzas per :func:`entity_ttl`.  Entity of an edge = the id prefix
    of node1 (qualifier edges' node1 is their statement's id, reference
    generator.py:264-272), so one bucketed group per entity suffices —
    the reference instead requires statement-sorted input."""
    import ray

    from ..ops._bucket import bucketed_group_apply

    import pyarrow as pa

    from ..ops._bucket import bucketed_join, schema_pa_fields

    pref = ray.put(dict(prop_types))

    # entity of an edge: node1 for statement edges; for qualifier edges
    # (node1 == some statement edge's id, reference generator.py:264-272)
    # the owning statement's node1 — resolved with a bucketed join on
    # the (id -> node1) table so hyphenated entity ids (golden
    # small_values.tsv Q00005550-chemical-MESHC000006) group correctly
    owners = edges.map_batches(
        lambda df: pd.DataFrame({
            "__sid__": df["id"].astype(str),
            "__owner__": df["node1"].astype(str)})
        [(df["id"].fillna("").astype(str) != "").to_numpy()]
        .drop_duplicates("__sid__"),
        batch_format="pandas")
    lf = schema_pa_fields(edges)
    lf["__sid__"] = pa.string()
    joined = bucketed_join(
        edges.map_batches(lambda df: df.assign(
            __sid__=df["node1"].astype(str)), batch_format="pandas"),
        owners, "__sid__", left_fields=lf,
        right_fields={"__sid__": pa.string(), "__owner__": pa.string()},
        how="left")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        ent = df["__owner__"].fillna(df["node1"].astype(str))
        return df.drop(columns=["__sid__", "__owner__"]) \
            .assign(__entity__=ent)

    sections = kw.pop("sections", False)

    def build(df: pd.DataFrame) -> pd.DataFrame:
        import json

        pt = ray.get(pref)
        out = []
        for entity, sub in df.groupby("__entity__", sort=False):
            sub = sub.drop(columns="__entity__")
            if sections:
                out.append((entity, json.dumps(
                    _entity_sections(entity, sub, pt, **kw))))
            else:
                ttl = entity_ttl(entity, sub, pt, **kw)
                if ttl:
                    out.append((entity, ttl))
        return pd.DataFrame(out, columns=["entity", "ttl"])

    import ray.data as _rd
    tagged = joined.map_batches(tag, batch_format="pandas")
    return bucketed_group_apply(tagged, ["__entity__"], build)


def write_wikidata_ttl(edges, prop_types: dict, path: str,
                       truthy: bool = True, **kw) -> None:
    """Full-file writer: header + globally-assembled sections in the
    reference's file layout — all entity blocks (sorted by entity),
    then (truthy) all statement blocks grouped by entity, all value
    blocks (first occurrence wins: shared wdv: nodes appear once,
    golden corrupted.ttl), then all item blocks sorted; non-truthy
    puts item blocks right after the entity blocks
    (P10_not_truthy.ttl).  For byte-parity tests and small exports; at
    scale write the (entity, ttl) dataset to partitioned storage
    instead."""
    import json

    df = generate_wikidata_ttl(edges, prop_types, sections=True,
                               truthy=truthy, **kw).to_pandas()
    df = df.sort_values("entity")
    ent_blocks: list = []
    stmts: list = []
    values: list = []
    items: list = []
    for _, row in df.iterrows():
        sec = json.loads(row["ttl"])
        if sec[0] is None:
            continue
        ent_blocks.append(sec[0])
        stmts.extend(sec[1])
        for v in sec[2]:
            if v not in values:
                values.append(v)
        for q in sec[3]:
            if q not in items:
                items.append(q)
    item_blocks = [_ttl_block("wd:" + q, [("a", ["wikibase:Item"])])
                   for q in sorted(items)]
    if truthy:
        blocks = ent_blocks + stmts + values + item_blocks
    else:
        blocks = ent_blocks + item_blocks + stmts + values
    with open(path, "w") as f:
        f.write(TTL_HEADER)
        f.write("\n".join(blocks))
        f.write("\n")  # the reference's files end with a blank line
