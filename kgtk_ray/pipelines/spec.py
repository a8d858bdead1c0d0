"""Declarative pipeline composition — the engine's analog of the
reference's ``kgtk cmd1 / cmd2 / ...`` chain (cli_entry pipe DSL,
/root/reference/kgtk/cli_entry.py:22,96-158, where each ``/`` stage is
an OS process connected by TSV pipes).

Here a pipeline is a list of steps applied to a lazy Dataset — the
streaming executor pipelines the stages with backpressure instead of
OS pipes, and nothing materializes between steps:

    run_pipeline(ds, [
        {"op": "filter", "subj": {"peter"}},
        {"op": "compact", "key_columns": ["node1", "label", "node2"]},
        {"op": "add_id", "style": "node1-label-node2"},
        {"op": "sort"},
    ])

``OPS`` is the extension surface (reference §2.12: new CLI command =
new module in kgtk/cli/): ``register("myop")(fn)`` adds a custom
``(Dataset, **kwargs) -> Dataset`` step.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import ray.data

Dataset = ray.data.Dataset

OPS: dict[str, Callable[..., Dataset]] = {}


def register(name: str):
    """Decorator: register a ``(Dataset, **kwargs) -> Dataset`` step."""
    def deco(fn):
        OPS[name] = fn
        return fn
    return deco


def _builtin_ops() -> None:
    from .. import ops as O
    from ..io import write_kgtk_tsv
    from ..text import normalize_text

    builtins: dict[str, Callable[..., Any]] = {
        "filter": O.kgtk_filter,
        "ifempty": O.ifempty,
        "ifnotempty": O.ifnotempty,
        "compact": O.compact,
        "unique": O.unique_counts,
        "add_id": O.add_id,
        "expand": O.expand_lists,
        "normalize_nodes": O.normalize_nodes,
        "lower": lambda ds, **kw: O.lower_labels(ds, **kw)[0],
        "remove_columns": O.remove_columns,
        "rename_columns": O.rename_columns,
        "reorder_columns": O.reorder_columns,
        "calc": O.calc_percentage,
        "validate": O.validate_edges,
        "clean": O.clean_edges,
        "explode": O.explode_node2,
        "implode": O.implode_node2,
        "sort": O.sort_edges,
        "dedup": O.dedup_exact_edges,
        "lift": O.lift,
        "every_nth": O.every_nth,
        "record_limit": O.record_limit,
        "tail": O.tail,
        "initial_skip": O.initial_skip,
        "text_normalize": normalize_text,
        "validate_properties": O.validate_properties,
    }
    from ..dedup import (dedup_against, minhash_dedup, semdedup,
                         simhash_dedup)
    from ..io.importers import import_atomic, import_conceptnet
    from ..io.rdf import generate_wikidata_ttl
    from ..text import (c4_line_filter, canonicalize_urls, chunk_text,
                        classifier_filter, dedup_spans, dedup_urls,
                        dsir_sample, dsir_scores, filter_domains,
                        pack_sequences, quality_classifier_scores,
                        scrub_pii)
    builtins["canonicalize_urls"] = canonicalize_urls
    builtins["dedup_urls"] = dedup_urls
    builtins["filter_domains"] = filter_domains
    builtins["c4_line_filter"] = c4_line_filter
    # two-input curation steps: the second corpus arrives as a kwarg
    builtins["dsir_scores"] = dsir_scores
    builtins["dsir_sample"] = dsir_sample
    builtins["quality_classifier_scores"] = quality_classifier_scores
    builtins["classifier_filter"] = classifier_filter
    builtins["minhash_dedup"] = minhash_dedup
    builtins["simhash_dedup"] = simhash_dedup
    builtins["semdedup"] = semdedup
    builtins["dedup_against"] = dedup_against
    builtins["pack_sequences"] = pack_sequences
    builtins["chunk_text"] = chunk_text
    builtins["scrub_pii"] = scrub_pii
    builtins["dedup_spans"] = dedup_spans
    builtins["grouped_profile"] = O.grouped_profile
    builtins["shard_assign"] = O.shard_assign
    builtins["import_conceptnet"] = import_conceptnet
    builtins["import_atomic"] = import_atomic
    builtins["generate_wikidata_ttl"] = generate_wikidata_ttl
    from ..ops.graph import (connected_components, degrees,
                             graph_statistics_edges, pagerank,
                             reachable_nodes)
    from ..ops.unreify import unreify_rdf_statements, unreify_values
    builtins["connected_components"] = connected_components
    builtins["degrees"] = degrees
    builtins["reachable_nodes"] = reachable_nodes
    builtins["pagerank"] = pagerank
    builtins["graph_statistics_edges"] = graph_statistics_edges
    builtins["unreify_rdf_statements"] = unreify_rdf_statements
    builtins["unreify_values"] = unreify_values
    # two-input steps take the second dataset as a kwarg
    builtins["ifexists"] = O.ifexists
    builtins["ifnotexists"] = O.ifnotexists
    builtins["join"] = O.kgtk_join
    builtins["cat"] = lambda ds, other, **kw: O.cat(ds, other, **kw)
    OPS.update({k: v for k, v in builtins.items() if k not in OPS})


_builtin_ops()


def run_pipeline(ds: Dataset, steps: Sequence[Mapping[str, Any]]) -> Dataset:
    """Apply ``steps`` in order.  Each step is ``{"op": name, **kwargs}``;
    kwargs pass through to the registered operator.  The result stays a
    lazy Dataset — consume with ``write_parquet``/``iter_batches``."""
    for i, step in enumerate(steps):
        step = dict(step)
        name = step.pop("op", None)
        if name is None:
            raise ValueError(f"step {i}: missing 'op'")
        fn = OPS.get(name)
        if fn is None:
            raise ValueError(
                f"step {i}: unknown op {name!r}; known: {sorted(OPS)}")
        ds = fn(ds, **step)
    return ds
