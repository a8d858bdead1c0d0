"""Token counting: whitespace tokens and a BPE-ish regex token count
(the GPT-2 pre-tokenizer word/number/punct split, approximated with a
deterministic regex DuckDB can also run).

Arrow-native kernel (round 5): both counts are RE2
``count_substring_regex`` calls over the zero-copy ``large_string``
column — no pandas object-dtype round trip per batch."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

Dataset = ray.data.Dataset

# words | numbers | non-space punctuation runs
BPEISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_counts(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """Add ``ws_tokens`` (whitespace) and ``bpe_tokens`` (regex) counts."""
    def f(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(t[text_col], pa.large_string()), "")
        ws = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.int64())
        bpe = pc.cast(pc.count_substring_regex(s, BPEISH), pa.int64())
        for name in ("ws_tokens", "bpe_tokens"):
            if name in t.column_names:
                t = t.drop_columns([name])
        return (t.replace_schema_metadata(None)
                 .append_column("ws_tokens", ws)
                 .append_column("bpe_tokens", bpe))

    return ds.map_batches(f, batch_format="pyarrow")
