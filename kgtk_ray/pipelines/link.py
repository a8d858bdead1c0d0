"""Entity linking as an actor-pool ``map_batches`` stage.

The north_rule requires entity linking through actor pools holding
sharded alias dictionaries (the reference's closest analogs are lift's
label map, /root/reference/kgtk/lift/kgtklift.py:198-253, and the
embedding-based scoring in kgtk/gt/embedding_utils.py).

Design:
  * the alias dictionary is put into the object store ONCE
    (``ray.put``) on the driver; each actor reads it in ``__init__``
    (once per actor, zero-copy for the plasma buffer) — it is never
    re-shipped per batch;
  * lookups are vectorized ``pandas.Series.map`` against the dict;
  * ambiguous aliases (one surface form, several qids) resolve
    deterministically to the lowest qid;
  * unlinked mentions pass through as surface-form symbols (so recall
    failures are visible downstream, not dropped).

At cluster scale the dict would be sharded by ``hash(alias) % k`` with
one actor pool per shard; single-node we hold one shard.
"""
from __future__ import annotations

import pandas as pd
import ray
import ray.data

Dataset = ray.data.Dataset


def build_alias_map(aliases: pd.DataFrame, *, alias_col: str = "alias",
                    qid_col: str = "qid") -> dict[str, str]:
    """alias -> canonical qid; ambiguity resolved to the lowest qid
    (numeric-aware for Q-ids, else lexicographic)."""
    def qkey(q: str):
        return (0, int(q[1:])) if q[:1] == "Q" and q[1:].isdigit() else (1, q)

    best = aliases.groupby(alias_col)[qid_col].apply(lambda s: min(s, key=qkey))
    return best.to_dict()


class EntityLinker:
    """Callable class for ``map_batches(EntityLinker, concurrency=N)``.

    Holds the broadcast alias dict; maps the given columns' surface
    forms to canonical ids per batch.
    """

    def __init__(self, alias_ref, columns=("node1", "node2")):
        self.alias_map: dict[str, str] = ray.get(alias_ref)
        self.columns = list(columns)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in self.columns:
            if c in df.columns:
                mapped = df[c].map(self.alias_map)
                df[c] = mapped.fillna(df[c])
        return df


def link_entities(edges: Dataset, alias_map: dict[str, str] | pd.DataFrame, *,
                  columns=("node1", "node2"), concurrency: int | tuple = 2,
                  batch_size: int = 8192, num_cpus: float = 0.5) -> Dataset:
    """Link surface forms in ``columns`` to canonical entity ids using an
    actor pool holding the broadcast alias dictionary.

    Pool sizing: actors hold their CPU reservation for the whole run, so
    ``concurrency * num_cpus`` must leave headroom for the read and the
    downstream shuffle tasks — a pool that reserves every core deadlocks
    the pipeline (hence the fractional default)."""
    if isinstance(alias_map, pd.DataFrame):
        alias_map = build_alias_map(alias_map)
    ref = ray.put(alias_map)
    return edges.map_batches(
        EntityLinker,
        fn_constructor_args=(ref, tuple(columns)),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
