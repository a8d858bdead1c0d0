"""Reference-compatible command-line interface.

The reference is driven as ``kgtk <command> [options] [/ <command> ...]``
(/root/reference/kgtk/cli_entry.py:96-158: argv split on bare ``/``
tokens, each stage an OS process connected to the next by a TSV pipe).
Here the same grammar runs one Ray session and passes a **lazy
Dataset** between stages — the streaming executor pipelines the chain
with backpressure, and TSV only materializes at real file / stdout
boundaries:

    python -m kgtk_ray filter -i in.tsv -p ';P154;' / sort -o out.tsv

Conventions mirrored from the reference CLI:

- ``-i/--input-file`` (or a positional file) names the input; ``-``
  (or omitting it in a piped stage) means the stream from the previous
  stage (stdin for the first stage).  ANY file-valued option accepts
  ``-`` the same way (e.g. ``lift --label-file -``).
- ``-o/--output-file`` names the output; default ``-`` = pipe to the
  next stage, or stdout for the last stage.
- boolean options take an optional explicit value (``--invert`` ==
  ``--invert True``), like the reference's ``optional_bool`` helper
  (/root/reference/kgtk/utils/argparsehelpers.py).
- command names accept both hyphen and underscore spellings.
- the shared prefix options (``--debug``, ``--expert``, ``--timing``,
  ``--pipedebug``, ``--progress``) are accepted for compatibility.

Each stage maps onto the library operator that implements its
semantics (see :mod:`kgtk_ray.cli.commands`); the registry doubles as
the extension surface — ``@command("my-cmd")`` adds a new stage, the
engine analog of dropping a module into ``kgtk/cli/`` (reference
cli_entry auto-discovery, SURVEY.md §2.12).
"""
from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence, TextIO

import ray
import ray.data

Dataset = ray.data.Dataset

PIPE = "/"

#: command name -> (help, configure(parser), run(args, ctx))
COMMANDS: dict[str, tuple[str, Callable, Callable]] = {}


def command(name: str, help: str = "", aliases: Sequence[str] = (),
            configure: Callable | None = None):
    """Register a CLI command: ``@command("name", "help",
    configure=build_parser_fn)`` decorating ``run(args, ctx)``."""
    def deco(fn):
        cfg = configure or (lambda p: None)
        for n in (name, *aliases):
            COMMANDS[n] = (help, cfg, fn)
        return fn
    return deco


def optional_bool(value) -> bool:
    """The reference's optional_bool argparse type: flags may be bare
    (``--invert``) or explicit (``--invert False``)."""
    if isinstance(value, bool):
        return value
    v = str(value).lower()
    if v in ("yes", "true", "t", "y", "1"):
        return True
    if v in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {value!r}")


def add_bool(parser, *flags, dest: str | None = None, default: bool = False,
             help: str = ""):
    parser.add_argument(*flags, dest=dest, type=optional_bool, nargs="?",
                        const=True, default=default, metavar="True|False",
                        help=help)


class CLIError(Exception):
    pass


@dataclass
class Ctx:
    """Per-stage execution context: the piped dataset and plumbing."""
    piped: Optional[Dataset] = None
    is_last: bool = True
    stdout: TextIO = field(default_factory=lambda: sys.stdout)
    stderr: TextIO = field(default_factory=lambda: sys.stderr)
    #: set by a runner to override the default emit (e.g. md text)
    consumed: bool = False
    #: canonical -> original header name for alias columns seen on
    #: input (the reference CLI never rewrites headers: a file whose
    #: label column is spelled ``relation`` keeps ``relation`` in the
    #: output, kgtk/io/kgtkbase.py:153-191 resolves aliases per read
    #: without renaming).  Our reader normalizes to canonical names so
    #: operators are simple; this map restores the user's spelling at
    #: the final file/stdout boundary.  Recorded from PRIMARY inputs
    #: only (first-seen among them): a side file — a filter-on or
    #: label file that spells ``label`` as ``predicate`` — must not
    #: hijack the output spelling of the file actually flowing through
    #: the pipe.
    alias_restore: dict = field(default_factory=dict)

    # ---- input -----------------------------------------------------
    def read(self, spec, *, required: bool = True,
             primary: bool = False) -> Optional[Dataset]:
        """Resolve one input slot: ``-``/None -> the piped stream (or
        stdin for a chain head); a path -> TSV/parquet read by
        extension (gzip/bz2/lz4/zstd transparent).  ``primary`` marks
        the command's main input whose header spelling the output
        should preserve (see ``alias_restore``)."""
        spec = _path_str(spec)
        if spec in (None, "-"):
            if self.piped is not None:
                ds, self.piped = self.piped, None
                return ds
            if spec == "-" or required:
                return self._read_stdin()
            return None
        if primary:
            self._note_aliases(spec)
        return read_any(spec)

    def _note_aliases(self, spec: str) -> None:
        """Record original header spellings of alias columns so the
        final output can restore them (see ``alias_restore``)."""
        if str(spec).endswith((".parquet", ".jsonl", ".jl")):
            return
        try:
            from ..format import resolve_column_aliases
            from ..io.kgtk_tsv import _header_columns
            renames = resolve_column_aliases(_header_columns(str(spec)))
        except Exception:
            return
        for orig, canon in renames.items():
            if orig != canon:
                self.alias_restore.setdefault(canon, orig)

    def _restore_aliases(self, ds: Dataset) -> Dataset:
        """Rename canonical columns back to the input's alias
        spellings where that does not collide with another column."""
        if not self.alias_restore:
            return ds
        schema = ds.schema()
        if schema is None:  # empty result (e.g. a filter dropped all rows)
            return ds
        cols = schema.names
        ren = {c: o for c, o in self.alias_restore.items()
               if c in cols and o not in cols}
        if not ren:
            return ds

        def f(t):
            return t.rename_columns([ren.get(c, c) for c in t.column_names])

        return ds.map_batches(f, batch_format="pyarrow")

    def read_many(self, specs, *, required: bool = True) -> list[Dataset]:
        specs = [_path_str(s) for s in _flatten(specs)]
        if not specs:
            return [self.read(None, required=required)] if required else []
        return [self.read(s) for s in specs]

    def _read_stdin(self) -> Dataset:
        import tempfile
        data = sys.stdin.read()
        if not data.strip():
            raise CLIError("no piped input and stdin is empty")
        f = tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False)
        f.write(data)
        f.close()
        from ..io import read_kgtk_tsv
        return read_kgtk_tsv(f.name)

    # ---- output ----------------------------------------------------
    def emit(self, ds: Optional[Dataset], args) -> Optional[Dataset]:
        """Default output handling: honor -o/--output-file and
        --output-format; return the dataset to pipe onward (or None)."""
        self.consumed = True
        if ds is None:
            return None
        dest = _path_str(getattr(args, "output_file", None)) or "-"
        fmt = getattr(args, "output_format", None) or "kgtk"
        if dest != "-":
            write_any(self._restore_aliases(ds), dest, fmt)
            return None
        if self.is_last:
            stream_to(self._restore_aliases(ds), self.stdout, fmt)
            return None
        return ds

    def write_side(self, ds: Optional[Dataset], spec, fmt: str = "kgtk"):
        """Write a secondary output (reject file, label file, ...)."""
        spec = _path_str(spec)
        if ds is None or spec in (None, ""):
            return
        if spec == "-":
            stream_to(self._restore_aliases(ds), self.stdout, fmt)
            return
        write_any(self._restore_aliases(ds), spec, fmt)


def _path_str(p) -> Optional[str]:
    if p is None:
        return None
    if isinstance(p, (list, tuple)):
        p = p[0] if p else None
        if p is None:
            return None
    return str(p)


def _flatten(specs) -> list:
    out = []
    for s in specs if isinstance(specs, (list, tuple)) else [specs]:
        if isinstance(s, (list, tuple)):
            out.extend(_flatten(s))
        elif s is not None:
            out.append(s)
    return out


# ---------------------------------------------------------------------------
# IO by extension
# ---------------------------------------------------------------------------

def read_any(path: str) -> Dataset:
    """TSV (optionally compressed) or Parquet by extension; directories
    of parquet parts read natively."""
    import os
    from ..io import read_edges_parquet, read_kgtk_jsonl, read_kgtk_tsv
    from ..io.kgtk_tsv import read_kgtk_tsv_any
    p = str(path)
    if p.endswith(".parquet") or (
            os.path.isdir(p) and any(f.endswith(".parquet")
                                     for f in os.listdir(p))):
        ds = read_edges_parquet(p)
        from ..io.kgtk_tsv import _to_string_batch
        return ds.map_batches(_to_string_batch, batch_format="pyarrow")
    if p.endswith((".jsonl", ".jl")):
        return read_kgtk_jsonl(p)
    if p.endswith((".gz", ".bz2", ".lz4", ".zst", ".xz")):
        return read_kgtk_tsv_any(p)
    return read_kgtk_tsv(p)


def write_any(ds: Dataset, path: str, fmt: str = "kgtk") -> None:
    """One output file in the requested KgtkWriter format; ``.parquet``
    destinations write partitioned parquet (the at-scale sink)."""
    p = str(path)
    if p.endswith(".parquet") or fmt == "parquet":
        from ..io import write_edges_parquet
        write_edges_parquet(ds, p)
        return
    if fmt == "kgtk" and p.endswith((".md",)):
        fmt = "md"
    if fmt == "kgtk" and p.endswith((".csv",)):
        fmt = "csv"
    if fmt == "kgtk" and p.endswith((".jsonl", ".jl")):
        fmt = "jsonl-map"
    from ..io.formats import write_kgtk_file
    write_kgtk_file(ds, p, fmt=fmt)


def stream_to(ds: Dataset, out: TextIO, fmt: str = "kgtk") -> None:
    """Stream a dataset to a text stream (stdout), header first —
    the pipe-tail analog of the reference writer on fd 1.  Consumes
    the dataset with ``iter_batches``; nothing materializes."""
    from ..io.formats import format_lines
    schema = ds.schema()
    if schema is None:  # all rows dropped from a zero-block read
        return
    cols = schema.names
    if fmt == "md":
        out.write("|" + "".join(f" {c} |" for c in cols) + "\n")
        out.write("|" + "".join(" -- |" for _ in cols) + "\n")
    elif fmt == "csv":
        out.write(",".join(cols) + "\n")
    elif fmt == "json":
        import json as _json
        out.write("[\n")
        out.write(_json.dumps(cols, separators=(",", ":")) + ",\n")
    elif fmt in ("json-map", "json-map-compact"):
        out.write("[\n")  # see write_kgtk_file: "]" is json-only
    elif fmt not in ("jsonl", "jsonl-map", "jsonl-map-compact"):
        from ..io.kgtk_tsv import _order_columns
        order = _order_columns(list(cols))
        if order != list(cols):
            ds = ds.select_columns(order)
            cols = order
        out.write("\t".join(cols) + "\n")
    for batch in format_lines(ds, fmt).iter_batches(batch_format="pandas"):
        for line in batch["line"]:
            out.write(line + "\n")
    if fmt == "json":
        out.write("]\n")


# ---------------------------------------------------------------------------
# Shared per-command argument groups
# ---------------------------------------------------------------------------

def add_io(parser, *, inputs: int = 1, positional: bool = True,
           output: bool = True):
    """-i/--input-file (+ optional positional), -o/--output-file."""
    if inputs:
        nargs = "+" if inputs > 1 else None
        parser.add_argument("-i", "--input-file", dest="input_file",
                            nargs=nargs, default=None, metavar="INPUT_FILE")
        if positional:
            parser.add_argument("input_file_positional", nargs="*" if
                                inputs > 1 else "?", default=None,
                                metavar="INPUT_FILE")
    if output:
        parser.add_argument("-o", "--output-file", "--out", dest="output_file",
                            default=None, metavar="OUTPUT_FILE")
        parser.add_argument("--output-format", dest="output_format",
                            default=None,
                            choices=["kgtk", "tsv", "tsv-unquoted",
                                     "tsv-csvlike", "csv", "md", "jsonl",
                                     "jsonl-map", "jsonl-map-compact",
                                     "json", "json-map",
                                     "json-map-compact", "parquet"])
    # reader sampling knobs — expert KgtkReaderOptions available on every
    # reference command (kgtk/io/kgtkreader.py:83-86)
    parser.add_argument("--record-limit", type=int, default=None)
    parser.add_argument("--tail-count", type=int, default=None)
    parser.add_argument("--initial-skip-count", type=int, default=None)
    parser.add_argument("--every-nth-record", type=int, default=None)
    parser.add_argument("--mode", default=None,
                        choices=["NONE", "EDGE", "NODE", "AUTO"])
    add_bool(parser, "--fill-short-lines", dest="fill_short_lines")
    add_bool(parser, "--truncate-long-lines", dest="truncate_long_lines")


def input_of(args, ctx: Ctx, *, required: bool = True) -> Optional[Dataset]:
    """Resolve the primary input honoring positional/flag forms and
    apply the reader sampling options."""
    spec = _path_str(getattr(args, "input_file", None)) or \
        _path_str(getattr(args, "input_file_positional", None))
    fill = getattr(args, "fill_short_lines", False)
    trunc = getattr(args, "truncate_long_lines", False)
    if (fill or trunc) and spec not in (None, "-"):
        from ..io import read_kgtk_tsv
        ds = read_kgtk_tsv(spec, fill_short_lines=fill,
                           truncate_long_lines=trunc)
    else:
        ds = ctx.read(spec, required=required, primary=True)
    if ds is None:
        return None
    return apply_sampling(ds, args)


def inputs_of(args, ctx: Ctx) -> list[Dataset]:
    """All inputs of a multi-input command (cat/validate)."""
    specs = _flatten([getattr(args, "input_file", None),
                      getattr(args, "input_file_positional", None)])
    if not specs:
        return [ctx.read(None)]
    # every input of a cat/validate chain is primary (the reference
    # concatenates with the first file's header spelling = first-seen)
    return [apply_sampling(ctx.read(s, primary=True), args)
            for s in specs]


def apply_sampling(ds: Dataset, args) -> Dataset:
    """initial-skip / every-nth / record-limit / tail on input order
    (reference kgtk/io/kgtkreader.py:832-877), via the block-metadata
    global row index."""
    skip = getattr(args, "initial_skip_count", None)
    nth = getattr(args, "every_nth_record", None)
    limit = getattr(args, "record_limit", None)
    tailn = getattr(args, "tail_count", None)
    if not any(v for v in (skip, nth, limit, tailn)):
        return ds
    from ..ops._rowindex import add_row_index
    idx = "_kgtk_cli_row"
    ds = add_row_index(ds, idx)

    def _fil(fn):
        def f(t):
            import numpy as np
            c = t[idx].to_numpy()
            return t.filter(np.asarray(fn(c)))
        return f

    base = int(skip or 0)
    if skip:
        ds = ds.map_batches(_fil(lambda c: c >= base),
                            batch_format="pyarrow")
    if nth:
        # keep surviving-record numbers n, 2n, ... (reference counts
        # data records from 1 and keeps every n-th)
        ds = ds.map_batches(
            _fil(lambda c, n=int(nth): (c - base + 1) % n == 0),
            batch_format="pyarrow")
    if limit:
        m = int(limit)
        if nth:
            ds = ds.map_batches(
                _fil(lambda c, n=int(nth), m=m: (c - base + 1) // n <= m),
                batch_format="pyarrow")
        else:
            ds = ds.map_batches(_fil(lambda c, m=m: c < base + m),
                                batch_format="pyarrow")
    if tailn:
        mat = ds.materialize()
        cut = mat.count() - int(tailn)
        if cut > 0:
            mat = mat.map_batches(_fil(lambda c, k=cut: c >= k),
                                  batch_format="pyarrow")
        ds = mat
    return ds.drop_columns([idx])


def split_columns(values) -> list[str]:
    """Column lists: nargs='+' values, each possibly comma-separated
    (reference --split-on-commas default)."""
    out: list[str] = []
    for v in _flatten(values):
        out.extend(c.strip() for c in str(v).split(",") if c.strip())
    return out


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

_SHARED_FLAGS = {"--debug", "--expert", "--pipedebug", "--timing",
                 "--progress", "--verbose", "--very-verbose"}


def _split_stages(argv: Sequence[str]) -> list[list[str]]:
    stages, cur = [], []
    for a in argv:
        if a == PIPE:
            stages.append(cur)
            cur = []
        else:
            cur.append(a)
    stages.append(cur)
    return [s for s in stages if s]


def build_parser(name: str) -> argparse.ArgumentParser:
    help_, cfg, _run = COMMANDS[name]
    p = argparse.ArgumentParser(prog=f"kgtk {name}", description=help_)
    cfg(p)
    return p


def main(argv: Sequence[str] | None = None) -> int:
    """``python -m kgtk_ray <command> [options] [/ <command> ...]``."""
    argv = list(sys.argv[1:] if argv is None else argv)
    argv = [a for a in argv if a not in _SHARED_FLAGS]
    if not argv or argv[0] in ("-h", "--help"):
        _print_usage()
        return 0 if argv else 1

    stages = _split_stages(argv)
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 log_to_driver=False)
    try:
        ctx = Ctx()
        for i, stage in enumerate(stages):
            name = stage[0].replace("_", "-")
            if name not in COMMANDS:
                raise CLIError(f"unknown command {stage[0]!r}; known: "
                               f"{', '.join(sorted(set(COMMANDS)))}")
            _help, _cfg, run = COMMANDS[name]
            parser = build_parser(name)
            args = parser.parse_args(stage[1:])
            ctx.is_last = (i == len(stages) - 1)
            ctx.consumed = False
            result = run(args, ctx)
            if not ctx.consumed:
                result = ctx.emit(result, args)
            ctx.piped = result
        return 0
    except CLIError as e:
        print(f"kgtk: {e}", file=sys.stderr)
        return 2
    finally:
        if owns_ray:
            ray.shutdown()


def _print_usage() -> None:
    print("usage: python -m kgtk_ray <command> [options] [/ <command> ...]")
    seen = {}
    for name, (help_, _c, run) in COMMANDS.items():
        seen.setdefault(id(run), (name, help_))
    for name, help_ in sorted(seen.values()):
        print(f"  {name:28s} {help_}")


from . import commands as _commands  # noqa: E402,F401  (registers COMMANDS)
