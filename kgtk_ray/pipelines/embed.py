"""Text embedding as an actor-pool stage — the canonical stateful
``map_batches`` case (reference: kgtk/gt/embedding_utils.py loads a
SentenceTransformer once per process, :40, scores with pyrallel
multiprocessing, :14; plus a Redis result cache, :42-51).

Here the "model" is loaded once per actor in ``__init__`` and applied
per batch in ``__call__``; no external cache — recompute is
deterministic and the object store holds intermediate blocks.
sentence-transformers is not available in this container, so the real
model load is gated behind an import-try and falls back to a
deterministic hashing projection (stable across processes/runs), which
keeps the Ray-side plumbing — actor pool, batch size, schema — real and
testable.

Sentence construction from entity properties follows the reference's
``attribute_to_sentence`` (kgtk/gt/embedding_utils.py:506): label,
"is a" + isa values, description.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

Dataset = ray.data.Dataset

EMBED_DIM = 64


class SentenceEmbedder:
    """Actor-pool embedder: model in __init__, vectorized batches in
    __call__."""

    def __init__(self, model_name: str = "bert-base-nli-mean-tokens",
                 dim: int = EMBED_DIM):
        self.dim = dim
        self.model = None
        try:  # real model when the library exists (not in this container)
            from sentence_transformers import SentenceTransformer  # type: ignore
            self.model = SentenceTransformer(model_name)
        except ImportError:
            # deterministic fallback: feature-hash token counts into
            # `dim` buckets, l2-normalize.  Stable across runs/processes.
            self.model = None
        # token -> (bucket, weight), grows across batches for the
        # lifetime of the actor (the payoff of the actor pool: the hash
        # is computed once per distinct token, not once per occurrence)
        self._tok_cache: dict[str, tuple[int, float]] = {}

    def _fake_embed(self, texts: pd.Series) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        ex = texts.reset_index(drop=True).str.lower().str.split().explode()
        ex = ex[ex.notna()]
        if not len(ex):
            return out
        cache = self._tok_cache
        toks = ex.to_numpy()
        for t in pd.unique(toks):
            if t not in cache:
                h = int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "little")
                cache[t] = (h % self.dim, 1.0 + (h >> 32) % 7 * 0.1)
        lut = pd.DataFrame.from_dict(cache, orient="index",
                                     columns=["b", "w"])
        hit = lut.reindex(toks)
        rows = ex.index.to_numpy().astype(np.int64)
        # unbuffered in-order accumulation == the original += loop
        # (row-major token order preserved, so float32 rounding is
        # bit-identical to the scalar version the fixtures pin)
        np.add.at(out, (rows, hit["b"].to_numpy().astype(np.int64)),
                  hit["w"].to_numpy())
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["sentence"] if "sentence" in df else df["text"]
        if self.model is not None:
            vecs = self.model.encode(list(texts.astype(str)))
            vecs = np.asarray(vecs, dtype=np.float32)
        else:
            vecs = self._fake_embed(texts.astype(str))
        df = df.copy()
        df["embedding"] = list(vecs)
        return df


def build_sentence(labels: list, descriptions: list, isas: list,
                   has_values: list, has_props: list) -> str:
    """Reference attribute_to_sentence, exactly
    (kgtk/gt/embedding_utils.py:506-560): first sorted label, first
    sorted description (comma-joined), " is " + sorted isa list
    ("It is " with no prefix; "a||b" keeps b under "instance of", else
    a space), sorted property-value phrases joined " and ", then
    " has " / ", and has " + deduped property names, trailing period.
    has_props are sorted here where the reference uses a (hash-order)
    ``list(set(...))`` — the only deliberate determinism fix."""
    s = ""
    have_isa = False
    labels = sorted(v for v in labels if v)
    descriptions = sorted(v for v in descriptions if v)
    isas = sorted(v for v in isas if v)
    has_values = sorted(v for v in has_values if v)
    has_props = sorted(set(v for v in has_props if v))
    if labels:
        s += labels[0]
    if descriptions:
        if s and descriptions[0] != "":
            s += ", "
        s += descriptions[0]
    if isas:
        have_isa = True
        temp = ""
        for each in isas:
            if "||" in each:
                each = (each.split("||")[1] if "instance of" in each
                        else each.replace("||", " "))
            temp += each + ", "
        if s and temp:
            s += " is "
        elif not s:
            s += "It is "
        s += temp[:-2]
    if has_values:
        if s:
            s += ", " if have_isa else " "
        else:
            s += "It "
        s += " and ".join(has_values)
    if has_props:
        if s and has_props[0] != "":
            s += ", and has " if have_isa else " has "
        elif has_props[0] != "":
            s += "It has "
        s += " and ".join(has_props)
    if s:
        s += "."
    return s


def attribute_to_sentence(df: pd.DataFrame) -> pd.Series:
    """Entity property columns (``|``-list cells) -> one reference
    sentence per row via :func:`build_sentence`.  Recognized columns:
    label_text, description, isa, has_values, has_props."""
    from ..format import split_list

    def get(col):
        return df.get(col, pd.Series("", index=df.index)).fillna("")             .astype(str)

    cols = [get(c) for c in ("label_text", "description", "isa",
                             "has_values", "has_props")]
    return pd.Series(
        [build_sentence(*(split_list(v) if v else [] for v in vals))
         for vals in zip(*cols)], index=df.index, dtype=object)


def text_embedding(ds: Dataset, *, text_col: str = "text",
                   concurrency: tuple[int, int] | int = (1, 8),
                   batch_size: int = 1024) -> Dataset:
    """Embed a text column via the actor pool.  ``batch_size`` trades
    per-call overhead against worker heap (vectors are dim×4 bytes/row)."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sentence"] = df[text_col].astype(str)
        return df

    return (ds.map_batches(prep, batch_format="pandas")
            .map_batches(SentenceEmbedder, batch_format="pandas",
                         concurrency=concurrency, batch_size=batch_size))
