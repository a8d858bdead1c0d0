"""Deterministic global row index for a Dataset.

Ray Data has no row_number, and ``Dataset.zip(range(n))`` does NOT
align reliably — block pairing between the two sides is
nondeterministic (observed misordering both after a sort and on plain
multi-block datasets), so a zipped index can permute.  This module
attaches the index from the materialized dataset's own block metadata:
each block's global offset is the sum of the row counts of the blocks
before it (metadata only — no data fetched to the driver), and each
block is rewritten independently by a Ray task.  Deterministic, no
shuffle, O(#blocks) driver state.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

Dataset = ray.data.Dataset


@ray.remote
def _tag_block(block, col: str, offset: int):
    idx = None
    if isinstance(block, pa.Table):
        idx = pa.array(np.arange(offset, offset + block.num_rows,
                                 dtype=np.int64))
        return block.append_column(col, idx)
    df = block.copy()
    df[col] = np.arange(offset, offset + len(df), dtype=np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def add_row_index(ds: Dataset, col: str = "__order__") -> Dataset:
    """Return ``ds`` with an int64 ``col`` numbering rows in the
    dataset's logical (block) order, 0-based."""
    mds = ds.materialize()
    refs, offset = [], 0
    for bundle in mds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            refs.append(_tag_block.remote(ref, col, offset))
            offset += meta.num_rows
    if not refs:
        return mds
    return ray.data.from_arrow_refs(refs)
