"""The flagship KG-construction pipeline (north_star):

read pages -> extract text (byte-identical per url) -> rule-based
triple extraction -> entity linking (broadcast alias dict read per
task; actor pool when the embedding-index tier is attached)
-> KGTK canonicalization (clean, compact/dedup, add-id, sort node1).

``kg_pipeline(sf_dir)`` runs it over the deterministic page table
derived from ``documents.parquet`` so the DuckDB oracle can verify the
final canonical edges exactly.
"""
from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import ray.data

from .canonicalize import canonicalize
from .corpus import pages_from_documents
from .extract import extract_text
from .link import link_entities
from .triples import DOC_PATTERNS, extract_triples

Dataset = ray.data.Dataset


def doc_alias_map(sf_dir: str) -> dict[str, str]:
    """Alias dictionary for the documents corpus: each source name plus
    its 'Source <name>' surface form map to the canonical source name.
    Built from the (tiny) distinct source set."""
    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
    names = sorted(set(src["source"].to_pylist()))
    m: dict[str, str] = {}
    for s in names:
        m[s] = s
        m[f"Source {s}"] = s
    return m


def kg_pipeline_from_pages(pages: Dataset, alias_map: dict[str, str] | pd.DataFrame,
                           patterns=DOC_PATTERNS, *, concurrency=2,
                           link_columns=None, link_batch_size: int = 8192,
                           check_extraction: bool = False) -> Dataset:
    """pages(url, warc_ts, html, text, lang) -> canonical edge Dataset."""
    extracted = extract_text(pages)
    if check_extraction:
        # per-row invariant: extracted text byte-identical to the `text` column
        def assert_same(df: pd.DataFrame) -> pd.DataFrame:
            bad = df[df["extracted_text"] != df["text"]]
            if len(bad):
                raise AssertionError(
                    f"extraction mismatch for urls: {list(bad['url'].head())}")
            return df
        extracted = extracted.map_batches(assert_same, batch_format="pandas")
    triples = extract_triples(extracted, patterns)
    if link_columns is None:
        # DOC_PATTERNS subjects are already canonical D-ids; entity-corpus
        # patterns need both endpoints linked
        link_columns = ("node2",) if patterns is DOC_PATTERNS else ("node1", "node2")
    linked = link_entities(triples, alias_map, columns=link_columns,
                           concurrency=concurrency,
                           batch_size=link_batch_size)
    # provenance (url) rides along as a qualifier column and is merged
    # into a sorted-unique | list by compact
    return canonicalize(linked)


def kg_pipeline(sf_dir: str, *, check_extraction: bool = True,
                concurrency=2) -> Dataset:
    """End-to-end over the documents-derived page corpus."""
    pages = pages_from_documents(sf_dir)
    return kg_pipeline_from_pages(pages, doc_alias_map(sf_dir),
                                  DOC_PATTERNS, concurrency=concurrency,
                                  check_extraction=check_extraction)
