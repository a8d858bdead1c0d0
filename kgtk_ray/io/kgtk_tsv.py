"""KGTK TSV sources/sinks on Ray Data.

The reference reads KGTK files row-at-a-time in a single process
(/root/reference/kgtk/io/kgtkreader.py) and writes one line per row
(/root/reference/kgtk/io/kgtkwriter.py).  Here a KGTK TSV file is just
a tab-delimited CSV read in parallel by Arrow into blocks
(``ray.data.read_csv`` with tab delimiter), followed by a
schema-normalization ``map_batches`` that resolves column aliases
(from/subject -> node1, ...) and converts nulls to "" per the spec
("empty string == null", docs/specification.md:22).

Parquet is the native format at scale; the TSV path exists for KGTK
conformance.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv
import ray.data
from ray.data.datasource import BlockBasedFileDatasink

from ..format import KGTK_EDGE_COLUMNS, resolve_column_aliases


def _normalize_batch(t: pa.Table) -> pa.Table:
    renames = resolve_column_aliases(t.column_names)
    if renames:
        t = t.rename_columns([renames.get(c, c) for c in t.column_names])
    # all-string cells, nulls -> ""
    cols = []
    for name in t.column_names:
        col = t[name]
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        cols.append(pc.fill_null(col, ""))
    return pa.table(cols, names=t.column_names)


def _header_columns(path: str) -> list[str]:
    """Raw header names of the first TSV file under ``path`` (file or
    directory of part files), decompressing by extension."""
    import pyarrow.fs as pafs
    try:
        fs, p = pafs.FileSystem.from_uri(path)
    except (pa.ArrowInvalid, ValueError):
        fs, p = pafs.LocalFileSystem(), path
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.Directory:
        kids = sorted(f.path for f in fs.get_file_info(
            pafs.FileSelector(p, recursive=True))
            if f.type == pafs.FileType.File and ".tsv" in f.base_name)
        if not kids:
            raise FileNotFoundError(f"no .tsv files under {path}")
        p = kids[0]
    buf = b""
    with fs.open_input_stream(p, compression="detect") as f:
        while b"\n" not in buf:
            chunk = f.read(65536)
            if not chunk:
                break
            buf += chunk
    line = buf.split(b"\n", 1)[0].decode("utf-8")
    return line.lstrip("﻿").rstrip("\r").split("\t")


def read_kgtk_tsv(path: str | list[str], *, normalize: bool = True,
                  fill_short_lines: bool = False,
                  truncate_long_lines: bool = False) -> ray.data.Dataset:
    """Read a KGTK TSV file into a Dataset of string columns.

    Column aliases are resolved to node1/label/node2/id and nulls become
    "" so every operator sees the canonical shape.  Every column is
    read as ``string`` (KGTK cells are untyped text, and Arrow's CSV
    inference would otherwise mangle them: ``True`` -> bool -> "true",
    ISO datetimes -> timestamp -> space-separated render, ``007`` ->
    7); the header is sniffed once to pin the column types.

    Rows with the wrong column count are EXCLUDED, the reference
    reader's default (short/long-line-action COMPLAIN,
    kgtk/io/kgtkreader.py:282-310); ``fill_short_lines`` pads short
    rows with "" and ``truncate_long_lines`` drops surplus cells (the
    reference's --fill-short-lines / --truncate-long-lines repairs,
    parsed through a text-split path since Arrow's CSV reader can only
    skip invalid rows).
    """
    first = path[0] if isinstance(path, (list, tuple)) else path
    names = _header_columns(first)

    if fill_short_lines or truncate_long_lines:
        def split_lines(df) -> pa.Table:
            import pandas as _pd
            rows = []
            for line in df["text"]:
                line = str(line).rstrip("\r\n")
                if line.lstrip("﻿").split("\t") == names:
                    continue  # header line
                parts = line.split("\t")
                if len(parts) < len(names):
                    if not fill_short_lines:
                        continue
                    parts = parts + [""] * (len(names) - len(parts))
                elif len(parts) > len(names):
                    if not truncate_long_lines:
                        continue
                    parts = parts[:len(names)]
                rows.append(parts)
            out = _pd.DataFrame(rows, columns=names, dtype=object)
            return pa.Table.from_pandas(out.fillna(""),
                                        preserve_index=False)

        ds = ray.data.read_text(path).map_batches(
            split_lines, batch_format="pandas")
    else:
        ds = ray.data.read_csv(
            path,
            parse_options=pyarrow.csv.ParseOptions(
                delimiter="\t", quote_char=False,
                invalid_row_handler=lambda row: "skip"),
            convert_options=pyarrow.csv.ConvertOptions(
                strings_can_be_null=False,
                column_types={n: pa.string() for n in names}),
        )
    # make every column string-typed (arrow may infer ints)
    ds = ds.map_batches(_normalize_batch if normalize else _to_string_batch,
                        batch_format="pyarrow")
    return ds


def _to_string_batch(t: pa.Table) -> pa.Table:
    cols = [pc.fill_null(pc.cast(t[c], pa.string()), "") for c in t.column_names]
    return pa.table(cols, names=t.column_names)


def _order_columns(names: list[str]) -> list[str]:
    """KGTK column order convention: id, node1, label, node2, then the rest
    in their existing order."""
    head = [c for c in KGTK_EDGE_COLUMNS if c in names]
    return head + [c for c in names if c not in head]


class _KgtkTsvDatasink(BlockBasedFileDatasink):
    """KGTK TSV sink through Ray's filesystem-aware datasink machinery.

    Values are written verbatim (cells already carry KGTK string-sigil
    encoding, and may legitimately contain double quotes — pyarrow's
    CSV writer refuses those under ``quoting_style="none"``, so each
    block is written as raw tab-joined lines); nulls become empty
    cells.  Each part file carries the header line.  Going through
    ``BlockBasedFileDatasink`` (rather than ``open()`` inside a
    ``map_batches`` task) means the path is resolved to a pyarrow
    filesystem — ``local://`` pins the write to the driver node, and
    shared/remote filesystems (NFS, s3://, hdfs://) work from any
    worker — so multi-node clusters don't scatter part files across
    worker-local disks.
    """

    def __init__(self, path: str, *, compression: str | None = None,
                 **kwargs):
        # pyarrow's filesystem.open_output_stream auto-compresses by
        # path suffix, so the extension alone selects the codec —
        # except xz, which Arrow lacks: it opens raw and the payload
        # is lzma-compressed here before the write.
        ext = "tsv" if compression is None else \
            f"tsv.{ {'gzip': 'gz', 'bz2': 'bz2', 'lz4': 'lz4', 'zstd': 'zst', 'xz': 'xz'}[compression] }"
        self._xz = compression == "xz"
        super().__init__(path, file_format=ext, **kwargs)

    def write_block_to_file(self, block, file) -> None:
        t = block.to_arrow()
        order = _order_columns(list(t.column_names))
        cols = [pc.fill_null(pc.cast(t[c], pa.string()), "").to_pandas()
                for c in order]
        lines = cols[0].str.cat(cols[1:], sep="\t") if len(cols) > 1 \
            else cols[0]
        payload = ("\t".join(order) + "\n").encode("utf-8")
        if len(lines):
            payload += ("\n".join(lines) + "\n").encode("utf-8")
        if self._xz:
            import lzma
            payload = lzma.compress(payload)
        file.write(payload)


def write_kgtk_tsv(ds: ray.data.Dataset, path: str, *,
                   compression: str | None = None) -> None:
    """Write a Dataset as KGTK TSV part files under ``path`` (a directory,
    each part carrying the header line).  Filesystem-aware: see
    :class:`_KgtkTsvDatasink`.  ``compression`` in
    ``{gzip, bz2, lz4, zstd, xz}`` writes codec-wrapped parts with the
    matching extension (the reference writer compresses by output
    extension, kgtk/io/kgtkwriter.py); ``read_kgtk_tsv_any`` reads them
    back transparently."""
    ds.write_datasink(_KgtkTsvDatasink(path, compression=compression))


def read_edges_parquet(path: str | list[str], *, columns: list[str] | None = None,
                       **kwargs) -> ray.data.Dataset:
    """Native edge-file source: partitioned Parquet with column pruning."""
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_edges_parquet(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Native edge-file sink: a directory of part files (resumable layout)."""
    ds.write_parquet(path, **kwargs)


# ---------------------------------------------------------------------------
# Transparent compressed TSV (reference kgtk/io/kgtkreader.py:693-698
# routes .gz/.bz2/.xz/.lz4 through decompressors)
# ---------------------------------------------------------------------------

_COMPRESSION_BY_EXT = {".gz": "gzip", ".bz2": "bz2", ".lz4": "lz4",
                       ".zst": "zstd"}


def _compression_of(path: str) -> str | None:
    for ext, codec in _COMPRESSION_BY_EXT.items():
        if str(path).endswith(ext):
            return codec
    if str(path).endswith(".xz"):
        # not an Arrow stream codec — routed through stdlib lzma below
        return "xz"
    return None


def _read_xz_tsv(paths: list[str], *, normalize: bool) -> ray.data.Dataset:
    """xz-compressed TSV via stdlib ``lzma``: Arrow has no LZMA stream
    codec, so each file decompresses whole inside one task (xz frames
    aren't splittable — the same one-task-per-file granularity the
    gzip stream path has).  Column types are pinned to string from the
    decompressed header, as in :func:`read_kgtk_tsv`."""
    import lzma

    raw = ray.data.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        tables = []
        for data in t["bytes"]:
            buf = lzma.decompress(data.as_py())
            header = buf.split(b"\n", 1)[0].decode("utf-8")
            names = header.lstrip("﻿").rstrip("\r").split("\t")
            tables.append(pyarrow.csv.read_csv(
                pa.BufferReader(buf),
                parse_options=pyarrow.csv.ParseOptions(delimiter="\t",
                                                       quote_char=False),
                convert_options=pyarrow.csv.ConvertOptions(
                    strings_can_be_null=False,
                    column_types={n: pa.string() for n in names})))
        return pa.concat_tables(tables, promote_options="default")

    ds = raw.map_batches(parse, batch_format="pyarrow")
    return ds.map_batches(_normalize_batch if normalize else _to_string_batch,
                          batch_format="pyarrow")


def read_kgtk_tsv_any(path: str | list[str], *,
                      normalize: bool = True) -> ray.data.Dataset:
    """`read_kgtk_tsv` with transparent decompression by extension
    (gzip/bz2/lz4/zstd/xz), mirroring the reference reader's behavior
    (kgtk/io/kgtkreader.py:693-698); xz goes through stdlib lzma since
    Arrow lacks the codec."""
    paths = [path] if isinstance(path, str) else list(path)
    codecs = {_compression_of(p) for p in paths}
    if len(codecs) > 1:
        raise ValueError("mix of compressed and plain inputs; read "
                         "separately and union")
    codec = codecs.pop()
    if codec == "xz":
        return _read_xz_tsv(paths, normalize=normalize)
    kwargs = {}
    if codec:
        kwargs["arrow_open_stream_args"] = {"compression": codec}
    ds = ray.data.read_csv(
        paths,
        parse_options=pyarrow.csv.ParseOptions(delimiter="\t",
                                               quote_char=False),
        convert_options=pyarrow.csv.ConvertOptions(
            strings_can_be_null=False),
        **kwargs,
    )
    return ds.map_batches(_normalize_batch if normalize else _to_string_batch,
                          batch_format="pyarrow")


def read_kgtk_jsonl(path: str | list[str], *, normalize: bool = True,
                    columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a KGTK edge table from JSON-lines (one column-keyed object
    per line) into a Dataset of string columns.

    This is the lossless inverse of :func:`kgtk_ray.io.write_jsonl`
    (``ds.write_json`` keeps the raw KGTK cell strings).  It also reads
    the reference's ``jsonl-map`` / ``jsonl-map-compact`` EXPORT files,
    with the caveat the reference itself has: that exporter decodes
    cells to JSON-native values (kgtk/io/kgtkwriter.py
    reformat_value_for_json), so sigils don't round-trip — ``"text"``
    comes back as the bare string, booleans as ``True``/``False``
    symbols, numbers as plain digits; compact files return missing keys
    as "" (KGTK null).  Column aliases are resolved as in
    :func:`read_kgtk_tsv` when ``normalize`` is set.  The schema is
    inferred from the union of keys in the first ~1MB of the first
    file; pass ``columns`` explicitly when a column might not appear
    there (a rare qualifier in a huge compact export).
    """
    # Line-oriented read + per-batch json parse rather than Arrow's JSON
    # reader: export files carry mixed value types per column ("42" the
    # symbol exports as JSON 42, labels as strings), which Arrow's
    # schema inference rejects.  Columns are pinned from the first line
    # so compact files (missing keys) produce a stable schema.
    import json

    import pandas as pd
    import pyarrow.fs as pafs

    first = path if isinstance(path, str) else path[0]
    fs, fpath = pafs.FileSystem.from_uri(first) if "://" in str(first) \
        else (pafs.LocalFileSystem(), str(first))
    if fs.get_file_info(fpath).type == pafs.FileType.Directory:
        parts = [i.path for i in fs.get_file_info(
            pafs.FileSelector(fpath)) if i.is_file]
        fpath = sorted(parts)[0]
    with fs.open_input_stream(fpath) as f:
        head = f.read(1 << 20)
    # union of keys over the head sample, first-seen order: compact
    # files omit empty cells, so no single line carries every column
    cols: list[str] = []
    for line in head.split(b"\n"):
        if not line.strip():
            continue
        try:
            for k in json.loads(line):
                if k not in cols:
                    cols.append(k)
        except json.JSONDecodeError:  # truncated tail of the 1MB sample
            break
    if columns is not None:
        cols = list(columns)

    def parse(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = [json.loads(line) for line in df["text"]]
        out = pd.DataFrame(rows, columns=cols)
        for c in cols:
            v = out[c]
            # JSON-native exports: bools back to KGTK True/False symbols,
            # numbers to their digits; nulls/missing keys to "" (KGTK null)
            out[c] = v.map(lambda x: "" if x is None or x != x else
                           ("True" if x is True else
                            "False" if x is False else str(x)))
        return out

    ds = ray.data.read_text(path).map_batches(parse, batch_format="pandas")
    return ds.map_batches(_normalize_batch if normalize else _to_string_batch,
                          batch_format="pyarrow")
