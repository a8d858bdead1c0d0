"""Deterministic synthetic web-page corpora (FIXTURES.md F1/F2).

Two sources:

* :func:`pages_from_documents` — wraps the driver-provided
  ``documents.parquet`` rows into Common-Crawl-style pages
  ``(url, warc_ts, html, text, lang)`` per ``BASELINE.json:input_hint``.
  Every byte is a deterministic function of the row, so the DuckDB
  oracle can reproduce the final canonical edges straight from the
  table.
* :func:`synthetic_corpus` — a seeded page generator with a closed
  entity/alias dictionary, template fact sentences and hot-head skew
  (~1% of entities on ~50% of pages) for the P/R harness and bench.

No wall-clock anywhere: timestamps are a fixed base plus row offsets.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset

BASE_TS = pd.Timestamp("2024-01-01 00:00:00")

_NAV = "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>"
_FOOTER = "<footer>&copy; example.org — all rights reserved</footer>"


def _page_html(doc_id: int, text: str, lang: str, source: str, n_chars: int) -> str:
    """Deterministic page template.  The article paragraphs are the
    extraction target; nav/footer/script are boilerplate the extractor
    must strip.  The published-by sentence appears twice to exercise
    dedup, and the source surface form alternates between the canonical
    name and an alias ("Source <name>") to exercise entity linking."""
    alias = source if doc_id % 2 == 0 else f"Source {source}"
    facts = [
        f"Doc D{doc_id} was published by {alias}.",
        f"Doc D{doc_id} is written in {lang}.",
        f"Doc D{doc_id} has {n_chars} characters.",
        f"Doc D{doc_id} was published by {alias}.",
    ]
    paras = [text] + facts
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        "<html><head><title>Doc {i}</title><script>var x=1;</script></head>"
        "<body>{nav}<article>{body}</article>{footer}</body></html>"
    ).format(i=doc_id, nav=_NAV, body=body, footer=_FOOTER)


def _expected_text(doc_id: int, text: str, lang: str, source: str, n_chars: int) -> str:
    alias = source if doc_id % 2 == 0 else f"Source {source}"
    return "\n".join([
        text,
        f"Doc D{doc_id} was published by {alias}.",
        f"Doc D{doc_id} is written in {lang}.",
        f"Doc D{doc_id} has {n_chars} characters.",
        f"Doc D{doc_id} was published by {alias}.",
    ])


def pages_from_documents(sf_dir: str) -> Dataset:
    """documents.parquet -> page table (url, warc_ts, html, text, lang)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def build(df: pd.DataFrame) -> pd.DataFrame:
        rows = {
            "url": "https://example.org/doc/" + df["doc_id"].astype(str),
            "warc_ts": BASE_TS + pd.to_timedelta(df["doc_id"], unit="s"),
            "html": [
                _page_html(i, t, l, s, n).encode("utf-8")
                for i, t, l, s, n in zip(df["doc_id"], df["text"], df["lang"],
                                         df["source"], df["n_chars"])
            ],
            "text": [
                _expected_text(i, t, l, s, n)
                for i, t, l, s, n in zip(df["doc_id"], df["text"], df["lang"],
                                         df["source"], df["n_chars"])
            ],
            "lang": df["lang"].astype(str),
        }
        return pd.DataFrame(rows)

    return docs.map_batches(build, batch_format="pandas")


# ---------------------------------------------------------------------------
# Seeded free-standing corpus with entities, aliases and skew (F1/F2)
# ---------------------------------------------------------------------------

FACT_TEMPLATES = [
    ("was born in", "born_in"),
    ("works for", "works_for"),
    ("is located in", "located_in"),
]


def _entity_tables(n_entities: int, seed: int) -> tuple[pd.DataFrame, pd.DataFrame]:
    rng = np.random.default_rng(seed)
    qids = [f"Q{i}" for i in range(1, n_entities + 1)]
    names = [f"Entity{i}" for i in range(1, n_entities + 1)]
    alias_rows = []
    for q, nm in zip(qids, names):
        alias_rows.append((q, nm))
        alias_rows.append((q, nm.lower()))
    # ambiguous aliases: shared by two qids; linker resolves to lowest qid
    for i in range(0, n_entities - 1, 50):
        alias_rows.append((qids[i], f"Ambig{i}"))
        alias_rows.append((qids[i + 1], f"Ambig{i}"))
    aliases = pd.DataFrame(alias_rows, columns=["qid", "alias"])
    labels = pd.DataFrame({
        "qid": qids,
        "label": [f"'{nm}'@en" for nm in names],
    })
    return aliases, labels


def synthetic_corpus(
    n_pages: int = 1000,
    *,
    n_entities: int = 200,
    seed: int = 42,
) -> tuple[Dataset, pd.DataFrame, pd.DataFrame]:
    """Seeded corpus with head-entity skew.

    Returns ``(pages_dataset, alias_df, golden_edges_df)`` where
    ``golden_edges_df`` is the exact expected canonical
    (node1, label, node2) set after linking — the P/R oracle.
    """
    rng = np.random.default_rng(seed)
    aliases, _labels = _entity_tables(n_entities, seed)
    alias_by_qid = aliases.groupby("qid")["alias"].apply(list).to_dict()
    qids = sorted(alias_by_qid, key=lambda q: int(q[1:]))
    # hot heads: first 1% of entities appear on ~50% of pages
    n_hot = max(1, n_entities // 100)
    hot = qids[:n_hot]
    cold = qids[n_hot:]

    recs = []
    golden = set()
    for pid in range(n_pages):
        prng = np.random.default_rng(seed * 1_000_003 + pid)
        n_facts = int(prng.integers(1, 6))
        sents = []
        for _ in range(n_facts):
            if prng.random() < 0.5:
                s_q = hot[int(prng.integers(0, len(hot)))]
            else:
                s_q = cold[int(prng.integers(0, len(cold)))]
            o_q = qids[int(prng.integers(0, len(qids)))]
            if o_q == s_q:
                o_q = qids[(qids.index(s_q) + 1) % len(qids)]
            verb, label = FACT_TEMPLATES[int(prng.integers(0, len(FACT_TEMPLATES)))]
            s_alias = alias_by_qid[s_q][int(prng.integers(0, 2))]
            o_alias = alias_by_qid[o_q][int(prng.integers(0, 2))]
            sents.append(f"{s_alias} {verb} {o_alias}.")
            golden.add((s_q, label, o_q))
        text = " ".join(["Filler intro sentence."] + sents)
        html = (
            "<html><head><title>Page {p}</title></head><body>"
            "{nav}<article><p>{text}</p></article>{footer}</body></html>"
        ).format(p=pid, nav=_NAV, text=text, footer=_FOOTER)
        recs.append({
            "url": f"https://corpus.example/p/{pid}",
            "warc_ts": BASE_TS + pd.to_timedelta(pid, unit="s"),
            "html": html.encode("utf-8"),
            "text": text,
            "lang": "en",
        })

    pages = ray.data.from_pandas(pd.DataFrame(recs))
    golden_df = pd.DataFrame(sorted(golden), columns=["node1", "label", "node2"])
    return pages, aliases, golden_df
