"""CLI command registrations: each reference command mapped onto the
library operator that implements its semantics.

Option names and defaults follow the reference CLI modules
(/root/reference/kgtk/cli/*.py); each runner's docstring cites the one
it mirrors.  Commands the reference ships but this environment cannot
support (nltk corpora, graph-tool binaries) register with a clear
out-of-scope error instead of silently missing.
"""
from __future__ import annotations

from typing import Optional

import ray.data

from . import (CLIError, Ctx, add_bool, add_io, command, input_of,
               inputs_of, split_columns)

Dataset = ray.data.Dataset


def _value_options(args):
    """Build a ValueOptions from the reference-named lax/repair flags
    (kgtk/value/kgtkvalueoptions.py:107+); None when all defaults."""
    from ..values import ValueOptions
    kw = {}
    probe = ValueOptions()
    for slot in ValueOptions.__slots__:
        v = getattr(args, slot, None)
        if v is not None and v != getattr(probe, slot):
            kw[slot] = v
    return ValueOptions(**kw) if kw else None


def add_value_options(parser):
    from ..values import ValueOptions
    for slot in ValueOptions.__slots__:
        flag = "--" + slot.replace("_", "-")
        if slot.startswith(("minimum_valid", "maximum_valid")):
            parser.add_argument(flag, dest=slot, type=float, default=None)
        else:
            add_bool(parser, flag, dest=slot, default=None)


# ---------------------------------------------------------------------------
# cat / zconcat / md / sort
# ---------------------------------------------------------------------------

def _cfg_cat(p):
    add_io(p, inputs=9)
    p.add_argument("--old-columns", nargs="+", default=None)
    p.add_argument("--new-columns", nargs="+", default=None)
    p.add_argument("--output-columns", nargs="+", default=None)


@command("cat", "Concatenate KGTK files (alias-aware column merge).",
         aliases=("zconcat",), configure=_cfg_cat)
def cmd_cat(args, ctx: Ctx):
    """Reference kgtk/cli/cat.py + join/kgtkcat.py."""
    from ..ops import cat, rename_columns
    dss = inputs_of(args, ctx)
    ds = cat(*dss) if len(dss) > 1 else dss[0]
    if args.old_columns and args.new_columns:
        ds = rename_columns(ds, dict(zip(split_columns(args.old_columns),
                                         split_columns(args.new_columns))))
    elif args.output_columns:
        new = split_columns(args.output_columns)
        old = ds.schema().names
        ds = rename_columns(ds, dict(zip(old, new)))
    return ds


def _cfg_md(p):
    add_io(p)


@command("md", "Render a KGTK file as a GitHub markdown table.",
         configure=_cfg_md)
def cmd_md(args, ctx: Ctx):
    """Reference kgtk/cli/md.py (KgtkWriter md format)."""
    args.output_format = "md"
    return input_of(args, ctx)


def _cfg_sort(p):
    add_io(p)
    p.add_argument("-c", "--column", "--columns", dest="columns", nargs="+",
                   default=None)
    add_bool(p, "-r", "--reverse", dest="reverse")
    # accepted-for-compatibility coreutils tuning knobs (no-ops here:
    # ds.sort is a distributed range-partition sort, not external sort)
    p.add_argument("-X", "--extra", dest="extra", default=None)
    add_bool(p, "--speed", dest="_speed")
    add_bool(p, "--space", dest="_space")
    add_bool(p, "--csv", dest="_csv")
    add_bool(p, "--tsv", dest="_tsv")


@command("sort", "Sort a KGTK file by columns (distributed range sort).",
         aliases=("sort2",), configure=_cfg_sort)
def cmd_sort(args, ctx: Ctx):
    """Reference kgtk/cli/sort.py — column specs may be names or
    1-based positions ('--columns 1,2')."""
    from ..ops import sort_edges
    ds = input_of(args, ctx)
    names = ds.schema().names
    cols = split_columns(args.columns) if args.columns else None
    if cols:
        resolved = []
        for c in cols:
            if c.isdigit():
                i = int(c) - 1
                if not 0 <= i < len(names):
                    raise CLIError(f"sort: column index {c} out of range")
                resolved.append(names[i])
            elif c in names:
                resolved.append(c)
            else:
                raise CLIError(f"sort: unknown column {c!r}")
        cols = resolved
    else:
        cols = [c for c in ("id", "node1", "label", "node2")
                if c in names] or names[:1]
    return sort_edges(ds, cols, descending=bool(args.reverse))


# ---------------------------------------------------------------------------
# filter / ifempty / ifnotempty / calc / column ops
# ---------------------------------------------------------------------------

def _cfg_filter(p):
    add_io(p)
    p.add_argument("-p", "--pattern", required=True)
    p.add_argument("--subj", dest="subj_col", default="node1")
    p.add_argument("--pred", dest="pred_col", default="label")
    p.add_argument("--obj", dest="obj_col", default="node2")
    add_bool(p, "--or", dest="or_pattern")
    add_bool(p, "--invert", dest="invert")
    p.add_argument("--reject-file", dest="reject_file", default=None)


@command("filter", "Filter rows by subject;predicate;object pattern.",
         configure=_cfg_filter)
def cmd_filter(args, ctx: Ctx):
    """Reference kgtk/cli/filter.py:39-56 (pattern 'subj;pred;obj',
    each part a comma-separated value set)."""
    from ..ops import kgtk_filter
    parts = args.pattern.split(";")
    if len(parts) != 3:
        raise CLIError("filter: pattern must have two semicolons "
                       "('subj;pred;obj')")

    def vals(s):
        items = [v.strip() for v in s.split(",") if v.strip()]
        return items or None

    ds = input_of(args, ctx)
    kw = dict(subj=vals(parts[0]), pred=vals(parts[1]), obj=vals(parts[2]),
              or_mode=bool(args.or_pattern),
              subj_col=args.subj_col, pred_col=args.pred_col,
              obj_col=args.obj_col)
    if args.reject_file:
        ctx.write_side(kgtk_filter(ds, invert=not bool(args.invert), **kw),
                       args.reject_file)
    return kgtk_filter(ds, invert=bool(args.invert), **kw)


def _cfg_ifempty(p):
    add_io(p)
    p.add_argument("--columns", dest="columns", nargs="+", required=True)
    add_bool(p, "--all", dest="all_are")
    add_bool(p, "--count", dest="only_count")


def _run_ifempty(args, ctx: Ctx, not_empty: bool):
    from ..ops import ifempty, ifnotempty
    ds = input_of(args, ctx)
    fn = ifnotempty if not_empty else ifempty
    out = fn(ds, split_columns(args.columns), all_are=bool(args.all_are))
    if args.only_count:
        n = out.count()
        ctx.consumed = True
        print(f"{n} rows passed the filter", file=ctx.stderr)
        return None
    return out


@command("ifempty", "Keep rows where given columns are empty.",
         configure=_cfg_ifempty)
def cmd_ifempty(args, ctx: Ctx):
    """Reference kgtk/cli/ifempty.py / iff/kgtkifempty.py."""
    return _run_ifempty(args, ctx, not_empty=False)


@command("ifnotempty", "Keep rows where given columns are not empty.",
         configure=_cfg_ifempty)
def cmd_ifnotempty(args, ctx: Ctx):
    return _run_ifempty(args, ctx, not_empty=True)


def _cfg_calc(p):
    add_io(p)
    p.add_argument("-c", "--columns", dest="columns", nargs="+",
                   required=True)
    p.add_argument("--do", dest="operation", required=True,
                   choices=["percentage"])
    p.add_argument("--into", dest="into", default="result")
    p.add_argument("--format", dest="format_string", default="%5.2f")


@command("calc", "Computed column (percentage).", configure=_cfg_calc)
def cmd_calc(args, ctx: Ctx):
    """Reference kgtk/cli/calc.py:244-249."""
    from ..ops import calc_percentage
    cols = split_columns(args.columns)
    if len(cols) != 2:
        raise CLIError("calc --do percentage needs exactly two columns")
    return calc_percentage(input_of(args, ctx), cols[0], cols[1],
                           into=args.into, fmt=args.format_string)


def _cfg_remove_columns(p):
    add_io(p)
    p.add_argument("-c", "--columns", dest="columns", nargs="+",
                   required=True)
    add_bool(p, "--split-on-commas", dest="_soc", default=True)
    add_bool(p, "--split-on-spaces", dest="_sos")
    add_bool(p, "--strip-spaces", dest="_strip", default=True)


@command("remove-columns", "Remove columns.", configure=_cfg_remove_columns)
def cmd_remove_columns(args, ctx: Ctx):
    """Reference kgtk/cli/remove_columns.py."""
    from ..ops import remove_columns
    return remove_columns(input_of(args, ctx), split_columns(args.columns))


def _cfg_rename_columns(p):
    add_io(p)
    p.add_argument("--old-columns", nargs="+", default=None)
    p.add_argument("--new-columns", nargs="+", default=None)
    p.add_argument("--output-columns", nargs="+", default=None)


@command("rename-columns", "Rename columns.", configure=_cfg_rename_columns)
def cmd_rename_columns(args, ctx: Ctx):
    """Reference kgtk/cli/rename_columns.py: either --output-columns
    (full replacement list) or --old-columns/--new-columns pairs."""
    from ..ops import rename_columns
    ds = input_of(args, ctx)
    if args.output_columns:
        new = split_columns(args.output_columns)
        old = ds.schema().names
        if len(new) != len(old):
            raise CLIError(
                f"rename-columns: {len(old)} columns in input but "
                f"{len(new)} output columns")
        return rename_columns(ds, dict(zip(old, new)))
    if not (args.old_columns and args.new_columns):
        raise CLIError("rename-columns: need --output-columns or "
                       "--old-columns + --new-columns")
    old = split_columns(args.old_columns)
    new = split_columns(args.new_columns)
    if len(old) != len(new):
        raise CLIError("rename-columns: --old-columns and --new-columns "
                       "differ in length")
    return rename_columns(ds, dict(zip(old, new)))


def _cfg_reorder_columns(p):
    add_io(p)
    p.add_argument("-c", "--columns", dest="columns", nargs="+",
                   required=True)
    add_bool(p, "--trim", dest="trim")


@command("reorder-columns", "Reorder columns ('...' = all others).",
         configure=_cfg_reorder_columns)
def cmd_reorder_columns(args, ctx: Ctx):
    """Reference kgtk/cli/reorder_columns.py (.../.. ellipses, --trim)."""
    from ..ops import reorder_columns
    return reorder_columns(input_of(args, ctx), split_columns(args.columns),
                           trim=bool(args.trim))


# ---------------------------------------------------------------------------
# ifexists / ifnotexists / join / lift / lower
# ---------------------------------------------------------------------------

def _cfg_ifexists(p):
    add_io(p)
    p.add_argument("--filter-on", "--filter-file", dest="filter_on",
                   required=True)
    p.add_argument("--input-keys", "--left-keys", dest="input_keys",
                   nargs="+", default=None)
    p.add_argument("--filter-keys", "--right-keys", dest="filter_keys",
                   nargs="+", default=None)
    add_bool(p, "--preserve-order", dest="preserve_order")
    add_bool(p, "--cache-input", dest="_cache_input")
    p.add_argument("--field-separator", dest="_fs", default=None)
    p.add_argument("--reject-file", dest="reject_file", default=None)
    # mode flags accepted for compatibility: this reader infers nothing
    # from mode, and explicit --input-keys/--filter-keys bypass the
    # mode-based key defaults anyway
    p.add_argument("--input-mode", dest="_imode", default=None)
    p.add_argument("--filter-mode", dest="_fmode", default=None)


def _run_ifexists(args, ctx: Ctx, exists: bool):
    from ..ops import ifexists, ifnotexists
    ds = input_of(args, ctx)
    filt = ctx.read(args.filter_on)
    kw = dict(input_keys=split_columns(args.input_keys) or None,
              filter_keys=split_columns(args.filter_keys) or None,
              preserve_order=bool(args.preserve_order))
    keep = ifexists if exists else ifnotexists
    drop = ifnotexists if exists else ifexists
    if args.reject_file:
        ctx.write_side(drop(ds, filt, **kw), args.reject_file)
    return keep(ds, filt, **kw)


@command("ifexists", "Semi-join: keep rows whose key exists in the "
         "filter file.", configure=_cfg_ifexists)
def cmd_ifexists(args, ctx: Ctx):
    """Reference kgtk/cli/ifexists.py / iff/kgtkifexists.py."""
    return _run_ifexists(args, ctx, exists=True)


@command("ifnotexists", "Anti-join: keep rows whose key is absent from "
         "the filter file.", configure=_cfg_ifexists)
def cmd_ifnotexists(args, ctx: Ctx):
    return _run_ifexists(args, ctx, exists=False)


def _cfg_join(p):
    add_io(p, inputs=2)
    p.add_argument("--left-file", dest="left_file", default=None)
    p.add_argument("--right-file", dest="right_file", default=None)
    add_bool(p, "--left-join", dest="left_join")
    add_bool(p, "--right-join", dest="right_join")
    add_bool(p, "--join-on-label", dest="join_on_label")
    add_bool(p, "--join-on-node2", dest="join_on_node2")
    p.add_argument("--left-file-join-columns", nargs="+", default=None)
    p.add_argument("--right-file-join-columns", nargs="+", default=None)
    p.add_argument("--left-prefix", "--prefix", dest="left_prefix",
                   default=None)
    p.add_argument("--right-prefix", dest="right_prefix", default=None)
    p.add_argument("--field-separator", dest="_fs", default=None)


@command("join", "KGTK key-set filtered union join of two files.",
         configure=_cfg_join)
def cmd_join(args, ctx: Ctx):
    """Reference kgtk/cli/join.py / join/kgtkjoiner.py (NOT a SQL
    column-pairing join: key sets select rows from both files)."""
    from ..ops import kgtk_join
    files = list(args.input_file or []) + \
        list(args.input_file_positional or [])
    left_spec = args.left_file or (files[0] if len(files) > 0 else None)
    right_spec = args.right_file or (files[1] if len(files) > 1 else None)
    if right_spec is None:
        raise CLIError("join: need two input files (or --left-file/"
                       "--right-file)")
    left = ctx.read(left_spec, primary=True)  # output spelling follows left
    right = ctx.read(right_spec)
    return kgtk_join(
        left, right,
        join_on=split_columns(args.left_file_join_columns) or None,
        right_join_on=split_columns(args.right_file_join_columns) or None,
        left_join=bool(args.left_join), right_join=bool(args.right_join),
        join_on_label=bool(args.join_on_label),
        join_on_node2=bool(args.join_on_node2),
        left_prefix=args.left_prefix or "",
        right_prefix=args.right_prefix or "")


def _cfg_lift(p):
    add_io(p)
    p.add_argument("--label-file", dest="label_file", default=None)
    p.add_argument("--columns-to-lift", dest="lift_columns", nargs="+",
                   default=None)
    p.add_argument("--lift-suffix", dest="lift_suffix", default=";label")
    p.add_argument("-p", "--property", "--label-select-value",
                   "--label-value", dest="label_value", default="label")
    p.add_argument("--lift-from", "--label-value-column",
                   dest="lift_from", default="node2")
    add_bool(p, "--remove-label-records", dest="remove_label_records",
             default=True)
    add_bool(p, "--input-file-is-presorted", dest="_in_presorted")
    add_bool(p, "--label-file-is-presorted", dest="_lab_presorted")
    add_bool(p, "--suppress-duplicate-labels", dest="_sdl", default=True)
    add_bool(p, "--sort-lifted-labels", dest="_sll", default=True)
    add_bool(p, "--prefilter-labels", dest="_pfl")
    add_bool(p, "--suppress-empty-columns", dest="_sec")
    add_bool(p, "--ok-if-no-labels", dest="_ok_nolab")


@command("lift", "Add ';label' columns from label edges.",
         configure=_cfg_lift)
def cmd_lift(args, ctx: Ctx):
    """Reference kgtk/cli/lift.py / lift/kgtklift.py.  The presorted /
    prefilter flags are accepted for compatibility: the engine's lift is
    a broadcast-or-bucketed hash lookup, so presortedness doesn't
    change the algorithm (set semantics are identical)."""
    from ..ops import lift
    ds = input_of(args, ctx)
    labels = ctx.read(args.label_file) if args.label_file else None
    return lift(ds, labels,
                label_value=args.label_value,
                lift_columns=split_columns(args.lift_columns) or
                ("node1", "label", "node2"),
                suffix=args.lift_suffix,
                lift_from=args.lift_from,
                remove_label_rows=bool(args.remove_label_records))


def _cfg_lower(p):
    add_io(p)
    p.add_argument("--label-file", dest="label_file", default=None)
    p.add_argument("--lift-suffix", dest="lift_suffix", default=";label")
    p.add_argument("--columns-to-remove", dest="_ctr", nargs="+",
                   default=None)
    p.add_argument("--base-columns", dest="_bc", nargs="+", default=None)
    p.add_argument("--label-value", dest="_lv", default=None)
    add_bool(p, "--deduplicate-labels", dest="_dedup", default=True)


@command("lower", "Move ';label' columns back out into label edges.",
         configure=_cfg_lower)
def cmd_lower(args, ctx: Ctx):
    """Reference kgtk/cli/lower.py: output = rows without the lifted
    columns; --label-file receives the generated label edges (appended
    to the main output when absent, like the reference)."""
    from ..ops import cat
    from ..ops.core import lower_labels
    ds = input_of(args, ctx)
    out, label_edges = lower_labels(ds, suffix=args.lift_suffix)
    if args.label_file:
        ctx.write_side(label_edges, args.label_file)
        return out
    return cat(out, label_edges)


# ---------------------------------------------------------------------------
# unique / compact / add-id / expand / explode / implode / normalize-nodes
# ---------------------------------------------------------------------------

def _cfg_unique(p):
    add_io(p)
    p.add_argument("--column", dest="column", default="node2")
    p.add_argument("--empty", dest="empty_value", default="")
    p.add_argument("--label", dest="label_value", default="count")
    p.add_argument("--format", dest="format", default="edge",
                   choices=["edge", "node", "node-counts", "node-only"])
    p.add_argument("--prefix", dest="prefix", default="")
    p.add_argument("--where", dest="where_column", default=None)
    p.add_argument("--in", dest="where_values", nargs="+", default=None)


@command("unique", "Count distinct values of a column.",
         configure=_cfg_unique)
def cmd_unique(args, ctx: Ctx):
    """Reference kgtk/cli/unique.py / join/unique.py."""
    from ..ops import unique_counts
    ds = input_of(args, ctx)
    out = unique_counts(ds, args.column,
                        where_col=args.where_column,
                        where_values=split_columns(args.where_values) or None,
                        as_edges=(args.format == "edge"),
                        empty_value=args.empty_value,
                        prefix=args.prefix)
    if args.format == "edge" and args.label_value != "count":
        import pandas as pd

        def relabel(df: "pd.DataFrame") -> "pd.DataFrame":
            df = df.copy()
            df["label"] = args.label_value
            return df
        out = out.map_batches(relabel, batch_format="pandas")
    return out


def _cfg_compact(p):
    add_io(p)
    p.add_argument("--columns", dest="key_columns", nargs="+", default=None)
    add_bool(p, "--compact-id", dest="compact_id")
    add_bool(p, "--presorted", dest="presorted")
    add_bool(p, "--lists-in-input", dest="_lii", default=True)
    add_bool(p, "--verify-sort", dest="_vs", default=True)
    add_bool(p, "--build-id", dest="build_id")
    p.add_argument("--id-style", dest="id_style",
                   default="node1-label-node2")


@command("compact", "Merge rows sharing a key into |-list cells.",
         configure=_cfg_compact)
def cmd_compact(args, ctx: Ctx):
    """Reference kgtk/cli/compact.py / reshape/kgtkcompact.py; --build-id
    chains the reference's KgtkIdBuilder on the compacted rows."""
    from ..ops import add_id, compact
    ds = input_of(args, ctx)
    out = compact(ds, split_columns(args.key_columns) or None,
                  compact_id=bool(args.compact_id))
    if args.build_id:
        out = add_id(out, style=args.id_style)
    return out


def _cfg_add_id(p):
    add_io(p)
    p.add_argument("--id-style", dest="id_style",
                   default="node1-label-node2",
                   choices=["node1-label-node2", "node1-label-num",
                            "node1-label-node2-num", "node1-label-node2-id",
                            "prefix###", "empty"])
    p.add_argument("--id-prefix", dest="id_prefix", default="E")
    p.add_argument("--initial-id", dest="initial_id", type=int, default=1)
    p.add_argument("--id-prefix-num-width", dest="width", type=int,
                   default=1)
    p.add_argument("--old-id-column-name", dest="old_id_col", default="id")
    p.add_argument("--new-id-column-name", dest="new_id_col", default="id")
    add_bool(p, "--overwrite-id", dest="overwrite_id")
    add_bool(p, "--verify-id-unique", dest="verify_id_unique")


@command("add-id", "Assign edge IDs (six styles).", configure=_cfg_add_id)
def cmd_add_id(args, ctx: Ctx):
    """Reference kgtk/cli/add_id.py / reshape/kgtkidbuilder.py:20-34."""
    from ..ops import add_id
    ds = input_of(args, ctx)
    out = add_id(ds, style=args.id_style, id_col=args.new_id_col,
                 overwrite=bool(args.overwrite_id) or args.id_style != "empty",
                 id_prefix=args.id_prefix, initial_id=args.initial_id,
                 id_prefix_num_width=args.width)
    if args.verify_id_unique:
        import pandas as pd
        ids = out.select_columns(["id"]).to_pandas()["id"]
        dup = ids[ids.duplicated() & (ids != "")]
        if len(dup):
            raise CLIError(f"add-id: duplicate ids: "
                           f"{sorted(set(dup))[:5]}")
    return out


def _cfg_expand(p):
    add_io(p)
    p.add_argument("--columns", dest="columns", nargs="+", default=None)
    p.add_argument("--key-columns", dest="key_columns", nargs="+",
                   default=None)


@command("expand", "Expand |-lists into multiple rows.",
         configure=_cfg_expand)
def cmd_expand(args, ctx: Ctx):
    """Reference kgtk/cli/expand.py / reshape/kgtkexpand.py."""
    from ..ops import expand_lists
    return expand_lists(input_of(args, ctx),
                        split_columns(args.columns) or None,
                        key_columns=split_columns(args.key_columns) or None)


def _cfg_explode(p):
    add_io(p)
    p.add_argument("--column", dest="column", default="node2")
    p.add_argument("--fields", dest="fields", nargs="+", default=None)
    p.add_argument("--types", dest="types", nargs="+", default=None)
    p.add_argument("--prefix", dest="prefix", default=None)
    add_bool(p, "--expand", dest="expand")
    add_bool(p, "--overwrite", dest="_overwrite", default=True)
    add_bool(p, "--show-data-types", dest="show_data_types")


@command("explode", "Split a KGTK value column into typed subfields.",
         configure=_cfg_explode)
def cmd_explode(args, ctx: Ctx):
    """Reference kgtk/cli/explode.py / reshape/kgtkexplode.py."""
    from ..ops import explode_node2
    if args.show_data_types:
        from ..values import DATA_TYPE_FIELDS
        ctx.consumed = True
        for dt, fields in sorted(DATA_TYPE_FIELDS.items()):
            print(f"{dt}: {' '.join(fields)}", file=ctx.stdout)
        return None
    ds = input_of(args, ctx)
    out = explode_node2(ds, args.column,
                        split_columns(args.fields) or None,
                        expand_list=bool(args.expand), kgtk_cells=True)
    if args.prefix is not None:
        from ..ops import rename_columns
        default_prefix = f"{args.column};kgtk:"
        ren = {c: args.prefix + c[len(default_prefix):]
               for c in out.schema().names if c.startswith(default_prefix)}
        if ren:
            out = rename_columns(out, ren)
    return out


def _cfg_implode(p):
    add_io(p)
    p.add_argument("--column", dest="column", default="node2")
    p.add_argument("--prefix", dest="_prefix", default=None)
    p.add_argument("--types", dest="_types", nargs="+", default=None)
    p.add_argument("--without", dest="_without", nargs="+", default=None)
    add_bool(p, "--remove-prefixed-columns", dest="drop_fields",
             default=True)
    add_bool(p, "--validate", dest="_validate", default=True)
    p.add_argument("--reject-file", dest="_reject", default=None)


@command("implode", "Rebuild a KGTK value column from typed subfields.",
         configure=_cfg_implode)
def cmd_implode(args, ctx: Ctx):
    """Reference kgtk/cli/implode.py / reshape/kgtkimplode.py."""
    from ..ops import implode_node2
    return implode_node2(input_of(args, ctx), args.column,
                         drop_fields=bool(args.drop_fields))


def _cfg_normalize_nodes(p):
    add_io(p)
    p.add_argument("--columns", dest="columns", nargs="+", default=None)
    p.add_argument("--id-column", dest="id_column", default="id")
    p.add_argument("--labels", dest="labels", nargs="+", default=None)


@command("normalize-nodes", "Node file -> edge file (unpivot).",
         configure=_cfg_normalize_nodes)
def cmd_normalize_nodes(args, ctx: Ctx):
    """Reference kgtk/cli/normalize_nodes.py."""
    from ..ops import normalize_nodes, remove_columns
    ds = input_of(args, ctx)
    if args.columns:
        keep = [args.id_column] + split_columns(args.columns)
        drop = [c for c in ds.schema().names if c not in keep]
        if drop:
            ds = remove_columns(ds, drop)
    labels = None
    if args.labels:
        cols = split_columns(args.columns) if args.columns else \
            [c for c in ds.schema().names if c != args.id_column]
        labels = dict(zip(cols, split_columns(args.labels)))
    return normalize_nodes(ds, id_col=args.id_column, labels=labels)


# ---------------------------------------------------------------------------
# validate / clean-data / validate-properties
# ---------------------------------------------------------------------------

def _cfg_validate(p):
    add_io(p, inputs=9)
    add_bool(p, "--header-only", dest="header_only")
    p.add_argument("--invalid-value-action", dest="invalid_action",
                   default="report",
                   choices=["pass", "report", "exclude", "complain",
                            "error", "mark"])
    p.add_argument("--error-limit", dest="error_limit", type=int,
                   default=1000)
    add_value_options(p)


@command("validate", "Validate KGTK cell values; report error counts.",
         configure=_cfg_validate)
def cmd_validate(args, ctx: Ctx):
    """Reference kgtk/cli/validate.py: reads each input, validates
    every cell, reports per-column error counts to stderr.  Exit code
    is nonzero when errors were found (the driver raises CLIError)."""
    from ..ops import validate_edges
    ctx.consumed = True
    opts = _value_options(args)
    total = 0
    for ds in inputs_of(args, ctx):
        cols = [c for c in ds.schema().names if c != "id"]
        if args.header_only:
            print(f"header: {chr(9).join(ds.schema().names)}",
                  file=ctx.stderr)
            continue
        action = args.invalid_action
        if action in ("report", "complain", "error"):
            try:
                _out, counters = validate_edges(
                    ds, cols, invalid_action="report", options=opts,
                    error_limit=args.error_limit)
            except ValueError as e:
                raise CLIError(str(e))
            total += counters["total"]
            print("errors per column: " + ", ".join(
                f"{c}={n}" for c, n in counters.items()), file=ctx.stderr)
        else:
            validate_edges(ds, cols, invalid_action=action,
                           options=opts).count()
    if total and args.invalid_action in ("complain", "error"):
        raise CLIError(f"validate: {total} invalid rows")
    return None


def _cfg_clean(p):
    add_io(p)
    p.add_argument("--reject-file", dest="reject_file", default=None)
    p.add_argument("--error-limit", dest="error_limit", type=int, default=0)
    add_value_options(p)


@command("clean-data", "Validate + repair cells; write a clean copy.",
         aliases=("clean_data", "clean"), configure=_cfg_clean)
def cmd_clean_data(args, ctx: Ctx):
    """Reference kgtk/cli/clean_data.py.  Default options are the
    reference's STRICT KgtkValueOptions (no repairs — a day-zero date
    is rejected, not fixed); repair knobs opt in via the
    --repair-... / --allow-... flags.  (The library-level clean_edges
    default of always-repair is a documented engine divergence; the
    CLI follows the reference.)"""
    from ..ops import clean_edges
    from ..values import ValueOptions
    ds = input_of(args, ctx)
    cols = [c for c in ds.schema().names if c != "id"]
    opts = _value_options(args) or ValueOptions()
    if args.reject_file:
        clean, rejects = clean_edges(ds, cols, with_rejects=True,
                                     options=opts,
                                     error_limit=args.error_limit)
        ctx.write_side(rejects, args.reject_file)
        return clean
    return clean_edges(ds, cols, options=opts,
                       error_limit=args.error_limit)


def _cfg_validate_properties(p):
    add_io(p)
    p.add_argument("--pattern-file", dest="pattern_file", required=True)
    p.add_argument("--reject-file", dest="reject_file", default=None)
    add_bool(p, "--process-node1-groups", dest="node1_groups", default=True)
    add_bool(p, "--autovalidate", dest="_autovalidate", default=True)
    add_bool(p, "--add-isa-column", dest="_isa")
    add_bool(p, "--no-complaints", dest="_nc")
    add_bool(p, "--complain-immediately", dest="_ci")
    add_bool(p, "--presorted", dest="_ps")


@command("validate-properties", "Rule-engine property validation.",
         configure=_cfg_validate_properties)
def cmd_validate_properties(args, ctx: Ctx):
    """Reference kgtk/cli/validate-properties.py /
    value/propertypatternvalidator.py."""
    from ..ops import validate_properties
    ds = input_of(args, ctx)
    patterns = ctx.read(args.pattern_file).to_pandas().rename(
        columns={"node1": "prop", "label": "kind", "node2": "value"})
    if args.reject_file:
        rej = validate_properties(
            ds, patterns, emit="reject",
            reject_node1_groups=bool(args.node1_groups))
        ctx.write_side(rej, args.reject_file)
    return validate_properties(ds, patterns, emit="pass",
                               reject_node1_groups=bool(args.node1_groups))


# ---------------------------------------------------------------------------
# graph ops
# ---------------------------------------------------------------------------

def _cfg_cc(p):
    add_io(p)
    p.add_argument("--properties", dest="properties", default=None)
    add_bool(p, "--undirected", dest="_undirected")
    add_bool(p, "--strong", dest="strong")
    p.add_argument("--cluster-name-method", dest="method", default="hash",
                   choices=["cat", "hash", "first", "last", "shortest",
                            "longest", "numbered", "prefixed", "lowest",
                            "highest"])
    p.add_argument("--cluster-name-separator", dest="_sep", default="+")
    p.add_argument("--cluster-name-prefix", dest="_prefix", default="CC")
    p.add_argument("--cluster-name-zfill", dest="_zfill", type=int,
                   default=4)
    p.add_argument("--minimum-cluster-size", dest="_mcs", type=int,
                   default=2)


@command("connected-components", "Label connected components.",
         configure=_cfg_cc)
def cmd_connected_components(args, ctx: Ctx):
    """Reference kgtk/cli/connected-components.py /
    gt/connected_components.py."""
    from ..ops import connected_components
    props = [s.strip() for s in args.properties.split(",")] \
        if args.properties else None
    return connected_components(input_of(args, ctx), method=args.method,
                                properties=props, strong=bool(args.strong))


def _cfg_reachable(p):
    add_io(p)
    p.add_argument("--root", dest="root", nargs="+", default=None)
    p.add_argument("--rootfile", dest="rootfile", default=None)
    p.add_argument("--rootfilecolumn", dest="rootfilecolumn",
                   default="node1")
    p.add_argument("--props", dest="props", nargs="+", default=None)
    add_bool(p, "--undirected", dest="undirected")
    p.add_argument("--subj", dest="_subj", type=int, default=0)
    p.add_argument("--pred", dest="_pred", type=int, default=1)
    p.add_argument("--obj", dest="_obj", type=int, default=2)
    add_bool(p, "--noheader", dest="_nh")
    add_bool(p, "--norootheader", dest="_nrh")


@command("reachable-nodes", "Nodes reachable from a root set.",
         configure=_cfg_reachable)
def cmd_reachable_nodes(args, ctx: Ctx):
    """Reference kgtk/cli/reachable_nodes.py."""
    from ..ops import reachable_nodes
    ds = input_of(args, ctx)
    roots = split_columns(args.root) if args.root else []
    if args.rootfile:
        import pandas as pd
        rdf = ctx.read(args.rootfile).to_pandas()
        col = args.rootfilecolumn
        if col.isdigit():
            col = rdf.columns[int(col)]
        roots.extend(v for v in rdf[col].astype(str) if v)
    if not roots:
        raise CLIError("reachable-nodes: need --root or --rootfile")
    return reachable_nodes(ds, roots,
                           labels=split_columns(args.props) or None,
                           undirected=bool(args.undirected))


def _cfg_paths(p):
    add_io(p)
    p.add_argument("--path_file", "--path-file", dest="path_file",
                   required=True)
    p.add_argument("--max_hops", "--max-hops", dest="max_hops", type=int,
                   default=4)
    add_bool(p, "--statistics-only", dest="statistics_only")
    add_bool(p, "--directed", dest="_directed")


@command("paths", "All paths <= max-hops between node pairs.",
         configure=_cfg_paths)
def cmd_paths(args, ctx: Ctx):
    """Reference kgtk/cli/paths.py: the path file holds (node1=source,
    node2=target) pairs."""
    from ..ops import paths, paths_statistics
    ds = input_of(args, ctx)
    pairs = ctx.read(args.path_file).to_pandas()
    sources = list(pairs["node1"].astype(str))
    targets = list(pairs["node2"].astype(str))
    if args.statistics_only:
        return paths_statistics(ds, sources, targets,
                                max_hops=args.max_hops)
    return paths(ds, sources, targets, max_hops=args.max_hops)


def _cfg_graph_statistics(p):
    add_io(p)
    add_bool(p, "--compute-pagerank", "--pagerank", dest="pagerank")
    add_bool(p, "--compute-hits", "--hits", dest="hits")
    add_bool(p, "--degrees", dest="degrees", default=True)
    add_bool(p, "--statistics-only", dest="statistics_only")
    add_bool(p, "--directed", dest="_directed")
    add_bool(p, "--log", dest="_log")
    p.add_argument("--page-rank-property", dest="pr_prop",
                   default="vertex_pagerank")
    p.add_argument("--vertex-in-degree-property", dest="in_prop",
                   default="vertex_in_degree")
    p.add_argument("--vertex-out-degree-property", dest="out_prop",
                   default="vertex_out_degree")
    p.add_argument("--vertex-hits-authority-property", dest="auth_prop",
                   default="vertex_auth")
    p.add_argument("--vertex-hits-hubs-property", dest="hubs_prop",
                   default="vertex_hubs")


@command("graph-statistics", "Degrees / PageRank / HITS as edge rows.",
         configure=_cfg_graph_statistics)
def cmd_graph_statistics(args, ctx: Ctx):
    """Reference kgtk/cli/graph_statistics.py."""
    from ..ops import cat, graph_statistics_edges
    ds = input_of(args, ctx)
    out = graph_statistics_edges(
        ds, compute_pagerank=bool(args.pagerank),
        compute_hits=bool(args.hits),
        in_prop=args.in_prop, out_prop=args.out_prop,
        pr_prop=args.pr_prop, hubs_prop=args.hubs_prop,
        auth_prop=args.auth_prop)
    if not args.degrees:
        drop = {args.in_prop, args.out_prop}
        out = out.map_batches(
            lambda df, d=drop: df[~df["label"].isin(d)],
            batch_format="pandas")
    if not args.statistics_only:
        out = cat(ds, out)
    return out


# ---------------------------------------------------------------------------
# unreify
# ---------------------------------------------------------------------------

def _cfg_unreify_rdf(p):
    add_io(p)
    p.add_argument("--reified-file", dest="_rf", default=None)
    p.add_argument("--unreified-file", dest="_uf", default=None)
    p.add_argument("--uninvolved-file", dest="_uv", default=None)


@command("unreify-rdf-statements", "Collapse rdf:Statement reifications.",
         configure=_cfg_unreify_rdf)
def cmd_unreify_rdf(args, ctx: Ctx):
    """Reference kgtk/cli/unreify_rdf_statements.py."""
    from ..ops import unreify_rdf_statements
    return unreify_rdf_statements(input_of(args, ctx))


def _cfg_unreify_values(p):
    add_io(p)
    p.add_argument("--trigger-label", dest="trigger_label",
                   default="rdf:type")
    p.add_argument("--trigger-node2", dest="trigger_node2", required=True)
    p.add_argument("--value-label", dest="value_label", required=True)
    p.add_argument("--old-label", dest="old_label", required=True)
    p.add_argument("--new-label", dest="new_label", default=None)
    add_bool(p, "--allow-multiple-values", dest="allow_multiple_values")
    p.add_argument("--reified-file", dest="_rf", default=None)
    p.add_argument("--unreified-file", dest="_uf", default=None)
    p.add_argument("--uninvolved-file", dest="_uv", default=None)


@command("unreify-values", "Collapse value reifications.",
         configure=_cfg_unreify_values)
def cmd_unreify_values(args, ctx: Ctx):
    """Reference kgtk/cli/unreify_values.py."""
    from ..ops import unreify_values
    return unreify_values(
        input_of(args, ctx), trigger_label=args.trigger_label,
        trigger_node2=args.trigger_node2, value_label=args.value_label,
        old_label=args.old_label, new_label=args.new_label,
        allow_multiple_values=bool(args.allow_multiple_values))


# ---------------------------------------------------------------------------
# importers / exporters / generators / text-embedding
# ---------------------------------------------------------------------------

def _cfg_import_ntriples(p):
    add_io(p)
    p.add_argument("--namespace-file", dest="namespace_file", default=None)
    p.add_argument("--updated-namespace-file", dest="updated_ns_file",
                   default=None)
    p.add_argument("--reject-file", dest="_reject", default=None)
    p.add_argument("--local-namespace-prefix", dest="local_prefix",
                   default="X")
    p.add_argument("--namespace-id-prefix", dest="ns_prefix", default="n")
    add_bool(p, "--namespace-id-use-uuid", dest="_ns_uuid")
    add_bool(p, "--local-namespace-use-uuid", dest="_ln_uuid")
    add_bool(p, "--newnode-use-uuid", dest="_nn_uuid")
    add_bool(p, "--allow-lax-uri", dest="_lax_uri", default=True)
    add_bool(p, "--build-new-namespaces", dest="allocate", default=True)


@command("import-ntriples", "RDF N-triples -> KGTK edges.",
         configure=_cfg_import_ntriples)
def cmd_import_ntriples(args, ctx: Ctx):
    """Reference kgtk/cli/import_ntriples.py / imports/kgtkntriples.py."""
    from ..io.rdf import import_ntriples
    spec = args.input_file or args.input_file_positional
    if spec in (None, "-"):
        raise CLIError("import-ntriples: needs a .nt input file path")
    lines = ray.data.read_text(str(spec))
    namespaces = None
    if args.namespace_file:
        import pandas as pd
        nsdf = ctx.read(args.namespace_file).to_pandas()
        namespaces = {r["node1"]: r["node2"].strip('"')
                      for _, r in nsdf.iterrows()
                      if r.get("label") == "prefix_expansion"}
    out = import_ntriples(
        lines, line_col="text", namespaces=namespaces,
        allocate_namespaces=bool(args.allocate),
        output_namespaces=True,
        local_namespace_prefix=args.local_prefix,
        namespace_id_prefix=args.ns_prefix)
    if args.updated_ns_file:
        import pandas as pd

        def split(keep_ns: bool):
            def f(df: "pd.DataFrame") -> "pd.DataFrame":
                m = df["label"] == "prefix_expansion"
                return df[m] if keep_ns else df[~m]
            return f
        ctx.write_side(out.map_batches(split(True), batch_format="pandas"),
                       args.updated_ns_file)
        out = out.map_batches(split(False), batch_format="pandas")
    return out


def _cfg_import_simple(p):
    add_io(p)


def _raw_input_path(args, what: str) -> str:
    spec = args.input_file or args.input_file_positional
    if spec in (None, "-"):
        raise CLIError(f"{what}: needs an input file path")
    return str(spec if not isinstance(spec, (list, tuple)) else spec[0])


@command("import-conceptnet", "ConceptNet assertion TSV -> KGTK edges.",
         configure=_cfg_import_simple)
def cmd_import_conceptnet(args, ctx: Ctx):
    """Reference kgtk/cli/import_conceptnet.py (headerless 5-column
    tab-delimited assertions)."""
    import pyarrow as pa
    import pyarrow.csv as pacsv

    from ..io.importers import import_conceptnet
    path = _raw_input_path(args, "import-conceptnet")
    names = ["assertion", "rel", "subj", "obj", "metadata"]
    ds = ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter="\t", quote_char=False),
        read_options=pacsv.ReadOptions(column_names=names),
        convert_options=pacsv.ConvertOptions(
            column_types={n: pa.string() for n in names}))
    return import_conceptnet(ds)


@command("import-atomic", "ATOMIC CSV -> KGTK edges.",
         configure=_cfg_import_simple)
def cmd_import_atomic(args, ctx: Ctx):
    """Reference kgtk/cli/import_atomic.py (header CSV with JSON-list
    relation columns)."""
    from ..io.importers import import_atomic
    return import_atomic(ray.data.read_csv(
        _raw_input_path(args, "import-atomic")))


def _cfg_import_pairs(p):
    add_io(p)
    p.add_argument("--source", dest="source", default="CN")
    p.add_argument("--relation", dest="relation", default="/r/RelatedTo")


@command("import-concept-pairs", "Concept-pair rows -> KGTK edges.",
         configure=_cfg_import_pairs)
def cmd_import_concept_pairs(args, ctx: Ctx):
    """Reference kgtk/cli/import_concept_pairs.py (space-delimited
    node1 node2 pairs)."""
    import pandas as pd

    from ..io.importers import import_concept_pairs
    path = _raw_input_path(args, "import-concept-pairs")

    def parse(df: "pd.DataFrame") -> "pd.DataFrame":
        import csv as _csv
        rows = list(_csv.reader(df["text"].astype(str), delimiter=" ",
                                quotechar='"'))
        return pd.DataFrame({"node1": [r[0] for r in rows],
                             "node2": [r[1] for r in rows]})

    ds = ray.data.read_text(path).map_batches(parse, batch_format="pandas")
    return import_concept_pairs(ds, source=args.source,
                                relation=args.relation)


def _cfg_import_vg(p):
    add_io(p)
    p.add_argument("--attr-synsets", dest="attr_synsets", default=None)


@command("import-visualgenome", "Visual Genome scene graphs -> KGTK.",
         configure=_cfg_import_vg)
def cmd_import_visualgenome(args, ctx: Ctx):
    """Reference kgtk/cli/import_visualgenome.py (scene-graph JSON list
    + attribute-synset map)."""
    import json

    import pandas as pd

    from ..io.importers import import_visualgenome
    path = _raw_input_path(args, "import-visualgenome")
    graphs = json.load(open(path))
    attr_synsets = {}
    if args.attr_synsets:
        with open(str(args.attr_synsets)) as f:
            attr_synsets = json.load(f)
    scenes = ray.data.from_pandas(pd.DataFrame({
        "image_id": [g.get("image_id") for g in graphs],
        "objects": [g.get("objects", []) for g in graphs],
        "relationships": [g.get("relationships", []) for g in graphs]}))
    return import_visualgenome(scenes, attr_synsets)


def _cfg_import_wikidata(p):
    add_io(p, output=False)
    p.add_argument("--node", dest="node_file", default=None)
    p.add_argument("--edge", dest="edge_file", default=None)
    p.add_argument("--qual", dest="qual_file", default=None)
    p.add_argument("--lang", dest="lang", default="en")
    p.add_argument("--limit", dest="limit", type=int, default=None)
    p.add_argument("--procs", dest="_procs", type=int, default=None)


@command("import-wikidata", "Wikidata JSON dump -> node/edge/qualifier "
         "files.", configure=_cfg_import_wikidata)
def cmd_import_wikidata(args, ctx: Ctx):
    """Reference kgtk/cli/import_wikidata.py."""
    from ..io.wikidata import import_wikidata, split_wikidata
    spec = args.input_file or args.input_file_positional
    if spec in (None, "-"):
        raise CLIError("import-wikidata: needs a JSON dump path")
    lines = ray.data.read_text(str(spec))
    if args.limit:
        lines = lines.limit(args.limit)
    tagged = import_wikidata(lines, lang=args.lang)
    nodes, edges, quals = split_wikidata(tagged)
    ctx.consumed = True
    if args.node_file:
        ctx.write_side(nodes, args.node_file)
    if args.edge_file:
        ctx.write_side(edges, args.edge_file)
    if args.qual_file:
        ctx.write_side(quals, args.qual_file)
    if not (args.node_file or args.edge_file or args.qual_file):
        return ctx.emit(edges, args)
    return None


def _cfg_generate_ttl(p):
    add_io(p)
    p.add_argument("-pf", "--property-types", "--property-file",
                   dest="property_file", default=None)
    add_bool(p, "-gt", "--generate-truthy", dest="truthy", default=True)
    p.add_argument("-n", "--output-n-lines", dest="_n", type=int,
                   default=1000)
    add_bool(p, "-gz", "--use-gz", dest="_gz")
    p.add_argument("-lp", "--label-property", dest="_lp", default="label")
    p.add_argument("-ap", "--alias-property", dest="_ap", default="aliases")
    p.add_argument("-dp", "--description-property", dest="_dp",
                   default="descriptions")
    p.add_argument("--log-path", dest="_log", default=None)
    add_bool(p, "--use-id", dest="_use_id")
    p.add_argument("--prefix-path", dest="_prefix", default="NONE")
    add_bool(p, "--property-declaration-in-file", dest="_pdif")
    p.add_argument("-w", "--warning", dest="_warn", default=None)


@command("generate-wikidata-triples", "KGTK edges -> Wikidata RDF ttl.",
         configure=_cfg_generate_ttl)
def cmd_generate_wikidata_triples(args, ctx: Ctx):
    """Reference kgtk/cli/generate_wikidata_triples.py / generator.py."""
    from ..io import load_prop_types
    from ..io.rdf import write_wikidata_ttl
    ds = input_of(args, ctx)
    if not args.property_file:
        raise CLIError("generate-wikidata-triples: needs --property-types "
                       "FILE")
    prop_types = load_prop_types(ctx.read(str(args.property_file))
                                 .to_pandas())
    dest = args.output_file or "-"
    ctx.consumed = True
    if dest == "-":
        import tempfile
        with tempfile.NamedTemporaryFile("r", suffix=".ttl",
                                         delete=False) as f:
            path = f.name
        write_wikidata_ttl(ds, prop_types, path, truthy=bool(args.truthy))
        ctx.stdout.write(open(path).read())
    else:
        write_wikidata_ttl(ds, prop_types, str(dest),
                           truthy=bool(args.truthy))
    return None


def _cfg_generate_mediawiki(p):
    add_io(p)
    p.add_argument("-pf", "--property-file", dest="property_file",
                   default=None)
    p.add_argument("-lp", "--label-property", dest="label_prop",
                   default="label")
    p.add_argument("-ap", "--alias-property", dest="alias_prop",
                   default="aliases")
    p.add_argument("-dp", "--description-property", dest="desc_prop",
                   default="descriptions")
    p.add_argument("--output-file-prefix", dest="_ofp", default="kgtk")
    p.add_argument("-n", "--output-n-lines", dest="_n", type=int,
                   default=1000)
    p.add_argument("--log-path", dest="_log", default=None)
    add_bool(p, "--use-gz", dest="_gz")
    p.add_argument("-pd", "--property-declaration-in-file", dest="_pdif",
                   default=None)
    p.add_argument("--rank", dest="_rank", default="normal")
    p.add_argument("-w", "--warning", dest="_warn", default=None)


@command("generate-mediawiki-jsons", "KGTK edges -> mediawiki API JSONs.",
         configure=_cfg_generate_mediawiki)
def cmd_generate_mediawiki(args, ctx: Ctx):
    """Reference kgtk/cli/generate_mediawiki_jsons.py."""
    from ..io import generate_mediawiki_jsons
    ds = input_of(args, ctx)
    out = generate_mediawiki_jsons(
        ds, label_props=(args.label_prop,),
        description_props=(args.desc_prop,),
        alias_props=(args.alias_prop,))
    ctx.consumed = True
    _stream_column(out, "doc", args.output_file or "-", ctx)
    return None


def _stream_column(ds: Dataset, col: str, dest: str, ctx: Ctx) -> None:
    """Stream one text column (JSON docs, Cypher statements) to a file
    or stdout, one line per row."""
    if col not in ds.schema().names:
        col = ds.schema().names[-1]

    def lines():
        for batch in ds.iter_batches(batch_format="pandas"):
            for line in batch[col]:
                yield str(line)

    if dest == "-":
        for line in lines():
            ctx.stdout.write(line + "\n")
    else:
        with open(str(dest), "w") as f:
            for line in lines():
                f.write(line + "\n")


def _cfg_export_neo4j(p):
    add_io(p)
    p.add_argument("--node-label", dest="node_label", default="Node")


@command("export-neo4j", "KGTK edges -> Cypher CREATE statements.",
         configure=_cfg_export_neo4j)
def cmd_export_neo4j(args, ctx: Ctx):
    """Reference kgtk/cli/export_neo4j.py."""
    from ..io import export_neo4j, export_neo4j_nodes
    from ..ops import cat
    ds = input_of(args, ctx)
    nodes = export_neo4j_nodes(ds, node_label=args.node_label)
    rels = export_neo4j(ds, node_label=args.node_label)
    out = cat(nodes, rels)
    ctx.consumed = True
    _stream_column(out, out.schema().names[0], args.output_file or "-", ctx)
    return None


def _cfg_export_wikidata(p):
    add_io(p, output=False)
    p.add_argument("--node-file", dest="node_file", default=None)
    p.add_argument("--edge-file", dest="edge_file", default=None)
    p.add_argument("--qualifier-file", dest="qual_file", default=None)
    p.add_argument("-o", "--output-file", dest="output_file", default=None)


@command("export-wikidata", "KGTK -> Wikidata entity JSON dump.",
         configure=_cfg_export_wikidata)
def cmd_export_wikidata(args, ctx: Ctx):
    """Reference kgtk/cli/export_wikidata.py / exports/exportwikidata.py."""
    from ..io import export_entities_json
    spec = args.edge_file or args.input_file or args.input_file_positional
    ds = ctx.read(spec)
    out = export_entities_json(ds)
    ctx.consumed = True
    _stream_column(out, "doc", args.output_file or "-", ctx)
    return None


def _cfg_text_embedding(p):
    add_io(p)
    p.add_argument("--model", dest="model",
                   default="bert-base-nli-mean-tokens")
    p.add_argument("--embedding-projector-metadata-path", dest="_epmp",
                   default=None)
    p.add_argument("--label-properties", dest="label_props", nargs="+",
                   default=["label"])
    p.add_argument("--description-properties", dest="desc_props", nargs="+",
                   default=["description"])
    p.add_argument("--isa-properties", dest="isa_props", nargs="+",
                   default=["P31"])
    p.add_argument("--property-value", dest="prop_values", nargs="+",
                   default=[])
    p.add_argument("--has-properties", dest="has_props", nargs="+",
                   default=[])
    p.add_argument("--output-data-format", dest="_odf",
                   default="kgtk_format")
    p.add_argument("--parallel", dest="_parallel", type=int, default=1)
    add_bool(p, "--use-cache", dest="_cache")
    p.add_argument("--cache-host", dest="_ch", default=None)
    p.add_argument("--cache-port", dest="_cp", default=None)
    p.add_argument("--dimension", dest="_dim", type=int, default=None)
    p.add_argument("--dimensional-reduction", dest="_dr", default="none")


@command("text-embedding", "Entity sentence construction + embedding.",
         configure=_cfg_text_embedding)
def cmd_text_embedding(args, ctx: Ctx):
    """Reference kgtk/cli/text_embedding.py / gt/embedding_utils.py:
    builds the reference's attribute sentences per entity
    (label/description "is"-phrasing via build_sentence), embeds them
    with the actor-pool embedder (SentenceTransformer when installed,
    deterministic hash fallback otherwise), and emits
    (node1, text_embedding, comma-joined vector) edges — the
    reference's kgtk_format output."""
    import pandas as pd

    from ..format import unstringify
    from ..ops._bucket import bucketed_group_apply
    from ..pipelines.embed import SentenceEmbedder, build_sentence
    ds = input_of(args, ctx)
    label_props = set(split_columns(args.label_props))
    desc_props = set(split_columns(args.desc_props))
    isa_props = set(split_columns(args.isa_props))
    has_props = set(split_columns(args.has_props))

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        out = []
        for node1, g in df.groupby("node1", sort=False):
            lab = g["label"].astype(str)
            val = g["node2"].astype(str).map(unstringify)
            sent = build_sentence(
                list(val[lab.isin(label_props)]),
                list(val[lab.isin(desc_props)]),
                list(val[lab.isin(isa_props)]),
                [],
                list(val[lab.isin(has_props)]))
            out.append((node1, sent))
        return pd.DataFrame(out, columns=["node1", "sentence"])

    sents = bucketed_group_apply(ds, ["node1"], per_bucket)
    emb = sents.map_batches(SentenceEmbedder, batch_format="pandas",
                            fn_constructor_kwargs={"model_name": args.model},
                            concurrency=(1, 8), batch_size=1024)

    def render(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "node1": df["node1"],
            "label": "text_embedding",
            "node2": [",".join(f"{x:g}" for x in v)
                      for v in df["embedding"]]})

    return emb.map_batches(render, batch_format="pandas")


# ---------------------------------------------------------------------------
# out-of-scope reference commands (explicit, not silent)
# ---------------------------------------------------------------------------

def _out_of_scope(name: str, why: str):
    def run(args, ctx):
        raise CLIError(f"{name} is out of scope in this engine: {why}")
    command(name, f"[out of scope: {why}]",
            configure=lambda p: None)(run)


_out_of_scope("import-wordnet", "reads nltk corpora, absent here")
_out_of_scope("import-framenet", "reads nltk corpora, absent here")
_out_of_scope("export-gt", "graph-tool binary format")
_out_of_scope("gt-load", "graph-tool internal representation")
