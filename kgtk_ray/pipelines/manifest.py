"""Resumable partitioned materialization with per-partition lineage.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics".  Layout:

    out_dir/
      part=<k>/ ...parquet        (one directory per hash partition)
      manifest.jsonl              (one record per completed partition)

Each manifest record carries the partition id, row count, an
order-insensitive content fingerprint, and the edge-count metrics —
enough to (a) skip completed partitions on resume and (b) audit
lineage.  Writes are atomic per partition: data lands in the partition
directory first, the manifest line is appended last, so a crash
between the two re-does at most one partition.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset

MANIFEST = "manifest.jsonl"


def _part_of(df: pd.DataFrame, key: str, num_partitions: int) -> pd.Series:
    h = pd.util.hash_array(df[key].astype(str).to_numpy(dtype=object))
    return pd.Series(h % num_partitions, index=df.index)


def read_manifest(out_dir: str) -> list[dict]:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def pending_partitions(out_dir: str, num_partitions: int) -> list[int]:
    done = {rec["part"] for rec in read_manifest(out_dir)}
    return [p for p in range(num_partitions) if p not in done]


def _fingerprint(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    h = pd.util.hash_pandas_object(
        df[cols].astype(str).reset_index(drop=True), index=False)
    return hex(int(np.bitwise_xor.reduce(h.to_numpy())) & 0xFFFFFFFFFFFFFFFF)


def materialize_edges(edges: Dataset, out_dir: str, *, key: str = "node1",
                      num_partitions: int = 16) -> list[dict]:
    """Write ``edges`` as hash-partitioned parquet + manifest.

    Completed partitions (already in the manifest) are skipped — the
    input is filtered BEFORE the shuffle so a resume re-reads but does
    not re-shuffle finished work.  Returns the manifest records written
    in this call.
    """
    os.makedirs(out_dir, exist_ok=True)
    pending = set(pending_partitions(out_dir, num_partitions))
    if not pending:
        return []

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part__"] = _part_of(df, key, num_partitions).to_numpy()
        return df[df["__part__"].isin(pending)]

    tagged = edges.map_batches(tag, batch_format="pandas")

    written: list[dict] = []
    manifest_path = os.path.join(out_dir, MANIFEST)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part__"].iloc[0])
        body = g.drop(columns="__part__").reset_index(drop=True)
        pdir = os.path.join(out_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "data.parquet.tmp")
        body.to_parquet(tmp, index=False)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        return pd.DataFrame({
            "part": [part],
            "rows": [len(body)],
            "fingerprint": [_fingerprint(body)],
        })

    # stream the manifest: append + flush each partition's record as
    # its write completes, instead of one batch append at the end — a
    # driver crash mid-run then loses only the in-flight partitions'
    # lineage (their parquet rewrite on resume is idempotent via
    # os.replace), not every record of the run
    recs_ds = tagged.groupby("__part__").map_groups(
        write_group, batch_format="pandas")
    with open(manifest_path, "a") as f:
        for batch in recs_ds.iter_batches(batch_size=1,
                                          batch_format="pandas"):
            for rec in batch.to_dict("records"):
                rec = {"part": int(rec["part"]), "rows": int(rec["rows"]),
                       "fingerprint": rec["fingerprint"], "key": key}
                f.write(json.dumps(rec) + "\n")
                f.flush()
                written.append(rec)
    return written


def read_materialized(out_dir: str) -> Dataset:
    parts = sorted(
        os.path.join(out_dir, d, "data.parquet")
        for d in os.listdir(out_dir) if d.startswith("part=")
    )
    return ray.data.read_parquet(parts)
