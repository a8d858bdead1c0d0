"""Generate golden-output parquet fixtures for the non-SQL-expressible
queries (dedup family, winnowing, IVF ANN, text-embedding digest,
multimodal features, mediawiki JSON).

Each fixture is computed by a SINGLE-PROCESS reference implementation
(plain pandas/numpy, no Ray) of the same seeded algorithm.  The Ray
pipelines must reproduce these outputs exactly regardless of block
structure, batch boundaries or task order — that is exactly the failure
mode a distributed re-implementation can introduce, so the fixtures are
the oracle for it.  ``oracle_sql()`` reads them with DuckDB's
``read_parquet``.

Only leaf hash/kernel helpers are imported from the library (they
define the algorithm's constants); the orchestration — banding,
candidate generation, verification, clustering, windowing, k-means —
is re-implemented here independently.

Usage: python scripts/make_fixtures.py [sf_dir] (default sf0.01).
Rerun whenever an algorithm constant changes.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "kgtk_ray", "_fixtures", "sf001")


def components_min(pairs: list[tuple]) -> dict:
    """Connected components over verified pairs; rep = min member."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set = set()
    out: dict = {}
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        rep = min(comp)
        for v in comp:
            out[v] = rep
    return out


def nonsingleton_df(cm: dict, id_col: str) -> pd.DataFrame:
    rows = [(d, c) for d, c in sorted(cm.items()) if d != c]
    return pd.DataFrame(rows, columns=[id_col, "cluster"]).astype("int64")


# ---------------------------------------------------------------------------
# minhash / ngram
# ---------------------------------------------------------------------------

def ref_minhash(docs: pd.DataFrame, *, num_perm=128, bands=32, shingle_k=5,
                threshold=0.8, seed=42, text_col="text",
                id_col="doc_id") -> dict:
    from kgtk_ray.dedup.minhash import (_POW, _perm_params, _shingle_hashes,
                                        _signature)
    r = num_perm // bands
    a, b = _perm_params(num_perm, seed)
    ids = docs[id_col].to_numpy()
    sh = {d: _shingle_hashes(str(t), shingle_k)
          for d, t in zip(ids, docs[text_col])}
    sigs = np.stack([_signature(sh[d], a, b) for d in ids])
    chunks = sigs.reshape(len(ids), bands, r)
    mix = np.power(np.uint64(_POW), np.arange(r, dtype=np.uint64))
    with np.errstate(over="ignore"):
        buckets = (chunks * mix).sum(axis=2, dtype=np.uint64)
        buckets *= np.uint64(0x9E3779B97F4A7C15)
        buckets ^= buckets >> np.uint64(29)
    buckets = (buckets & np.uint64(0x7FFFFFFFFFFFFFFF)).astype("int64")
    flat = pd.DataFrame({
        "doc": np.repeat(ids, bands),
        "band": np.tile(np.arange(bands), len(ids)),
        "bucket": buckets.ravel()})
    d = (flat.drop_duplicates(["band", "bucket", "doc"])
         .sort_values("doc", kind="mergesort"))
    d = d[d.groupby(["band", "bucket"], sort=False).cumcount() < 64]
    m = d.merge(d, on=["band", "bucket"])
    m = m[m["doc_x"] < m["doc_y"]][["doc_x", "doc_y"]].drop_duplicates()
    keep = []
    for x, y in zip(m["doc_x"], m["doc_y"]):
        sx, sy = sh[x], sh[y]
        inter = np.intersect1d(sx, sy, assume_unique=True).size
        un = sx.size + sy.size - inter
        if (inter / un if un else 1.0) >= threshold:
            keep.append((x, y))
    return components_min(keep)


def ref_ngram(docs: pd.DataFrame, *, n=3, threshold=0.8) -> dict:
    from kgtk_ray.dedup.ngram import _word_ngrams
    ng = docs.copy()
    ng["text"] = [_word_ngrams(str(t), n) for t in docs["text"]]
    return ref_minhash(ng, shingle_k=max(8, 4 * n), threshold=threshold)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def ref_simhash(docs: pd.DataFrame, *, max_hamming=3) -> dict:
    from kgtk_ray.dedup.simhash import _hamming, simhash64
    chunks = max_hamming + 1
    bits_per = 64 // chunks
    ids = docs["doc_id"].to_numpy()
    fps = simhash64(docs["text"])
    rows = {"doc": np.repeat(ids, chunks), "fp": np.repeat(fps, chunks),
            "chunk": np.tile(np.arange(chunks), len(ids)),
            "val": np.empty(len(ids) * chunks, dtype=np.uint64)}
    for ci in range(chunks):
        shift = np.uint64(ci * bits_per)
        mask = np.uint64((1 << bits_per) - 1)
        rows["val"][ci::chunks] = (fps >> shift) & mask
    flat = pd.DataFrame(rows)
    d = (flat.drop_duplicates(["chunk", "val", "doc"])
         .sort_values("doc", kind="mergesort"))
    d = d[d.groupby(["chunk", "val"], sort=False).cumcount() < 64]
    m = d.merge(d, on=["chunk", "val"])
    m = m[m["doc_x"] < m["doc_y"]]
    if len(m):
        dist = _hamming(m["fp_x"].to_numpy(dtype=np.uint64),
                        m["fp_y"].to_numpy(dtype=np.uint64))
        m = m[dist <= max_hamming]
    pairs = list({(x, y) for x, y in zip(m["doc_x"], m["doc_y"])})
    return components_min(pairs)


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------

def ref_winnowing(docs: pd.DataFrame, *, k=8, window=4) -> pd.DataFrame:
    import re
    ids, poss, hashes = [], [], []
    for did, t in zip(docs["doc_id"].to_numpy(), docs["text"]):
        t = re.sub(r"\s+", " ", str(t)).lower()
        if len(t) < k:
            continue
        grams = np.asarray([t[i: i + k] for i in range(len(t) - k + 1)],
                           dtype=object)
        h = pd.util.hash_array(grams)
        n = len(h)
        if n < window:
            sel = np.array([int(np.argmin(h))])
        else:
            idx = np.arange(n - window + 1)[:, None] + np.arange(window)
            wins = h[idx]
            sel = np.unique(idx[np.arange(len(idx)), wins.argmin(axis=1)])
        ids.extend([did] * len(sel))
        poss.extend(sel.tolist())
        hashes.extend(h[sel].tolist())
    return pd.DataFrame({"doc_id": np.asarray(ids, dtype="int64"),
                         "pos": np.asarray(poss, dtype="int64"),
                         "hash": np.asarray(hashes, dtype="uint64")})


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------

def ref_ivf(emb: pd.DataFrame, *, k=10, n_centroids=16, nprobe=4,
            sample_size=2048, seed=42) -> pd.DataFrame:
    def norm_rows(X):
        return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    ids = emb["vec_id"].to_numpy()
    stride = max(1, len(emb) // sample_size)
    if stride > 1:
        h = pd.util.hash_array(ids)
        sdf = emb[h % np.uint64(stride) == 0]
    else:
        sdf = emb
    sdf = sdf.sort_values("vec_id")
    S = norm_rows(np.stack(sdf["embedding"].to_numpy()).astype(np.float32))
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), size=min(n_centroids, len(S)), replace=False)]
    for _ in range(5):
        assign = (S @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = norm_rows(S[m].mean(axis=0, keepdims=True))[0]

    qdf = emb[emb["vec_id"] < 5].sort_values("vec_id")
    Q = norm_rows(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]

    X = norm_rows(np.stack(emb["embedding"].to_numpy()).astype(np.float64))
    bucket = (X @ C.T).argmax(axis=1)
    frames = []
    for qi in range(len(Q)):
        mask = np.isin(bucket, list({int(p) for p in probe[qi]}))
        sims = X[mask] @ Q[qi]
        sub_ids = ids[mask]
        g = pd.DataFrame({"query_id": qi, "vec_id": sub_ids, "score": sims})
        g = g.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        frames.append(g)
    out = pd.concat(frames, ignore_index=True)
    scale = 10.0 ** 6
    x = out["score"].to_numpy()
    out["score"] = np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# text embedding digest (deterministic hashing fallback)
# ---------------------------------------------------------------------------

def ref_dedup_against(docs: pd.DataFrame, *, num_perm=128, bands=32,
                      shingle_k=5, threshold=0.8, seed=42) -> pd.DataFrame:
    """Single-process replay of dedup_against(documents, documents
    where doc_id%7==0): corpus doc flagged iff exact shingle Jaccard
    >= threshold to some reference doc among LSH band-collision
    candidates (hot buckets capped at 64 per side in ascending doc
    order)."""
    from kgtk_ray.dedup.minhash import (_band_buckets, _perm_params,
                                        _shingle_hashes, _signature)
    r = num_perm // bands
    a, b = _perm_params(num_perm, seed)
    corpus = docs.sort_values("doc_id")
    ref = corpus[corpus["doc_id"] % 7 == 0]

    def side(df):
        sh = {int(d): _shingle_hashes(str(t), shingle_k)
              for d, t in zip(df["doc_id"], df["text"])}
        sigs = np.stack([_signature(sh[int(d)], a, b) for d in df["doc_id"]])
        buckets = _band_buckets(sigs, bands, r)
        return sh, dict(zip(df["doc_id"].astype(int), buckets))

    sh_c, bk_c = side(corpus)
    sh_r, bk_r = side(ref)

    # (band, bucket) -> docs per side, ascending id, capped at 64
    from collections import defaultdict
    cmap, rmap = defaultdict(list), defaultdict(list)
    for d in sorted(bk_c):
        for band in range(bands):
            key = (band, int(bk_c[d][band]))
            if len(cmap[key]) < 64:
                cmap[key].append(d)
    for d in sorted(bk_r):
        for band in range(bands):
            key = (band, int(bk_r[d][band]))
            if len(rmap[key]) < 64:
                rmap[key].append(d)

    cand = {(x, y) for key, xs in cmap.items() if key in rmap
            for x in xs for y in rmap[key]}
    flagged = set()
    for x, y in sorted(cand):
        xv, yv = sh_c[x], sh_r[y]
        inter = np.intersect1d(xv, yv, assume_unique=True).size
        union = xv.size + yv.size - inter
        if (inter / union if union else 1.0) >= threshold:
            flagged.add(x)
    return pd.DataFrame({
        "doc_id": corpus["doc_id"].astype("int64").to_numpy(),
        "dup": corpus["doc_id"].isin(flagged).to_numpy(),
    })


def ref_text_embedding(docs: pd.DataFrame, *, dim=64) -> pd.DataFrame:
    import hashlib
    e0, e1 = [], []
    for t in docs["text"]:
        v = np.zeros(dim, dtype=np.float32)
        for tok in str(t).lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                               "little")
            v[h % dim] += 1.0 + (h >> 32) % 7 * 0.1
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
        # float32 -> float64 widening is exact; round in float64 like
        # the query side does
        e0.append(float(v[0]))
        e1.append(float(v[1]))
    return pd.DataFrame({"doc_id": docs["doc_id"].astype("int64"),
                         "e0": np.round(np.asarray(e0, dtype="float64"), 6),
                         "e1": np.round(np.asarray(e1, dtype="float64"), 6)})


# ---------------------------------------------------------------------------
# multimodal features (synthetic media, byte-histogram decoder)
# ---------------------------------------------------------------------------

def ref_multimodal(n=256, *, dim=64, seed=42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    f0 = []
    for _ in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                               dtype=np.uint8)
        hist = np.bincount(payload % dim, minlength=dim).astype(np.float32)
        nn = np.linalg.norm(hist)
        f0.append(float((hist / nn if nn else hist)[0]))
    return pd.DataFrame({"media_id": np.arange(n, dtype="int64"),
                         "f0": np.asarray(f0, dtype="float64")})


def ref_frame_sample(n=256, *, k=4, seed=42) -> pd.DataFrame:
    """Frame-sampling digest: media payload sliced into k contiguous
    windows; digest per frame = (ts_ms, byte length, first byte)."""
    rng = np.random.default_rng(seed)
    rows = []
    for mid in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                               dtype=np.uint8).tobytes()
        ln = len(payload)
        for i in range(k):
            lo, hi = (ln * i) // k, (ln * (i + 1)) // k
            frame = payload[lo:max(hi, lo + 1)]
            rows.append((mid, i, (ln * i) // k, len(frame), frame[0]))
    return pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms",
                                       "n_bytes", "b0"]).astype(
        {"media_id": "int64", "frame_idx": "int64", "ts_ms": "int64",
         "n_bytes": "int64", "b0": "int64"})


# ---------------------------------------------------------------------------
# mediawiki jsons (nation-derived, sf-independent)
# ---------------------------------------------------------------------------

def ref_mediawiki(nation: pd.DataFrame) -> pd.DataFrame:
    """Mediawiki-API entity JSON per the JsonGenerator spec
    (reference /root/reference/kgtk/generator.py:521-640): labels /
    descriptions / aliases sections, everything else as claims with the
    property datatype resolved from data_type declaration edges (which
    are themselves excluded from entity building)."""
    n1 = "N" + nation["n_nationkey"].astype(str)
    edges = pd.concat([
        pd.DataFrame({"node1": n1, "label": "in_region",
                      "node2": "R" + nation["n_regionkey"].astype(str)}),
        pd.DataFrame({"node1": n1, "label": "label",
                      "node2": nation["n_name"].astype(str).str.strip()}),
        pd.DataFrame({"node1": ["in_region"], "label": ["data_type"],
                      "node2": ["item"]}),
    ], ignore_index=True)
    dt = edges[edges["label"] == "data_type"]
    ptypes = {p: {"item": "wikibase-item"}.get(t, "string")
              for p, t in zip(dt["node1"], dt["node2"])}
    body = edges[edges["label"] != "data_type"]
    body = body.sort_values(["node1", "label", "node2"], kind="mergesort")
    docs = []
    for qnode, sub in body.groupby("node1", sort=True):
        doc = {"id": qnode, "type": "item", "labels": {},
               "descriptions": {}, "aliases": {}, "claims": {}}
        for prop, vals in sub.groupby("label", sort=True)["node2"]:
            values = list(vals)
            if prop == "label":
                doc["labels"]["en"] = {"language": "en", "value": values[0]}
            else:
                doc["claims"][prop] = [{
                    "mainsnak": {
                        "snaktype": "value",
                        "property": prop,
                        "datatype": ptypes.get(prop, "string"),
                        "datavalue": {"value": v},
                    },
                    "type": "statement",
                    "rank": "normal",
                } for v in values]
        docs.append((qnode, json.dumps(doc, sort_keys=True)))
    return pd.DataFrame(docs, columns=["qnode", "doc"])


def ref_link_embedding(sf: str) -> pd.DataFrame:
    """Single-process replay of the linker's alias-dict + embedding-
    fallback resolution over the deterministic mention synth in
    __ray_entry__._q_link_embedding.  Only the leaf embedding kernel
    is imported; the resolution (dict hit -> cosine argmax -> 
    passthrough) is re-implemented here."""
    from kgtk_ray.pipelines.embed import SentenceEmbedder

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    sources = sorted(docs["source"].astype(str).unique())
    entities = pd.DataFrame({"qid": ["E_" + s for s in sources],
                             "name": [f"{s} media network" for s in sources]})
    emb = SentenceEmbedder()
    mat = emb._fake_embed(entities["name"].astype(str))
    alias = {f"Source {s}": f"E_{s}" for s in sources}

    did = docs["doc_id"].astype("int64")
    src = docs["source"].astype(str)
    mention = np.where(did % 3 == 0, "Source " + src,
                       np.where(did % 3 == 1, src + " network",
                                "completely unrelated text here"))
    out = []
    cache: dict = {}
    for m in mention:
        if m in alias:
            out.append(alias[m])
            continue
        if m not in cache:
            q = emb._fake_embed(pd.Series([m], dtype=str))[0]
            sims = mat @ q
            b = int(sims.argmax())
            cache[m] = entities["qid"].iloc[b] if sims[b] >= 0.6 else m
        out.append(cache[m])
    return pd.DataFrame({"doc_id": did, "linked": out})


def ref_wikidata_jsons(nation: pd.DataFrame) -> pd.DataFrame:
    """Sequential single-process replay of generate-mediawiki-jsons over
    the nation-derived edge synth in __ray_entry__._q_wikidata_jsons —
    processes rows strictly IN FILE ORDER like the reference's
    JsonGenerator entry_point loop (generator.py:561-660), building
    docs with plain insertion-ordered dicts.  Imports only the leaf
    snak/entity-doc builders; the sequential statement/qualifier
    orchestration here is independent of the library's joins."""
    from kgtk_ray.io.mediawiki import _entity_doc, _process_text_string, _snak

    ptypes = {"P1": "wikibase-item", "P2": "time", "P3": "quantity",
              "P4": "string", "P5": "string"}
    rows = []
    for nk, rk in zip(nation["n_nationkey"].astype(int),
                      nation["n_regionkey"].astype(int)):
        q = f"Q{nk}"
        rows.append((q, "label", f"'nation {nk}'@en", f"{q}-label-1"))
        rows.append((q, "P1", f"Q9{rk}", f"{q}-P1-1"))
        rows.append((f"{q}-P1-1", "P5", f"order {rk}", f"{q}-P1-1-P5-1"))
        rows.append((q, "P2", f"^{1900 + nk}-01-01T00:00:00Z/9",
                     f"{q}-P2-1"))
        rows.append((q, "P3", f"{nk}.5[{nk},{nk + 1}]Q199", f"{q}-P3-1"))
        rows.append((q, "P4", f"value {nk}", f"{q}-P4-1"))

    docs: dict = {}
    stmt_ids = {r[3] for r in rows if not r[0].endswith("-P1-1")}
    def ensure(node):
        if node not in docs:
            docs[node] = _entity_doc(node, node in ptypes, ptypes.get(node))
    last_stmt = {}
    for node1, prop, node2, eid in rows:
        is_qual = node1 in stmt_ids
        if not is_qual:
            ensure(node1)
        if prop in ptypes:
            ensure(prop)
            if ptypes[prop] == "wikibase-item":
                ensure(node2)
        if prop == "label":
            text, lang = _process_text_string(node2)
            docs[node1]["labels"][lang] = {"languange": lang, "value": text}
            continue
        snak = _snak(prop, ptypes[prop], node2)
        if is_qual:
            ent, sprop = last_stmt[node1]
            st = docs[ent]["claims"][sprop][-1]
            st["qualifiers"].setdefault(prop, []).append(snak)
            if prop not in st["qualifiers-order"]:
                st["qualifiers-order"].append(prop)
            continue
        st = {"mainsnak": snak, "type": "statement",
              "id": node1 + prop + node2, "rank": "normal",
              "references": [], "qualifiers": {}, "qualifiers-order": []}
        docs[node1]["claims"].setdefault(prop, []).append(st)
        last_stmt[eid] = (node1, prop)
    out = [(k, json.dumps({k: v})) for k, v in docs.items()]
    return pd.DataFrame(out, columns=["qnode", "doc"])


def _round_away(x: np.ndarray, nd: int = 6) -> np.ndarray:
    scale = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def ref_dsir(docs: pd.DataFrame, *, num_buckets=10_000,
             k=100) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Single-process DSIR over the documents table (corpus = doc_id %
    10 != 0, target = % 10 == 0), mirroring the driver queries; returns
    (scores, gumbel-top-k sample)."""
    from kgtk_ray.ops.sample import SALT_GUMBEL, _id_hash
    from kgtk_ray.text.dsir import _ALPHA, _feature_buckets

    tgt = docs[docs.doc_id % 10 == 0]
    raw = docs[docs.doc_id % 10 != 0].reset_index(drop=True)

    def counts(df):
        _, b = _feature_buckets(df.text.astype(str), num_buckets, True)
        return np.bincount(b, minlength=num_buckets)

    cr, ct = counts(raw), counts(tgt)
    lr = np.log(cr + _ALPHA) - np.log(cr.sum() + _ALPHA * num_buckets)
    lt = np.log(ct + _ALPHA) - np.log(ct.sum() + _ALPHA * num_buckets)
    rows, b = _feature_buckets(raw.text.astype(str), num_buckets, True)
    w = np.zeros(len(raw))
    n = np.zeros(len(raw), dtype=np.int64)
    np.add.at(w, rows, (lt - lr)[b])
    np.add.at(n, rows, 1)
    scores = pd.DataFrame({"doc_id": raw.doc_id.to_numpy(), "n_feats": n,
                           "dsir_score": _round_away(w)})
    u = (_id_hash(raw.doc_id.to_numpy(), SALT_GUMBEL)
         .astype(np.float64) + 0.5) / 2**32
    key = w - np.log(-np.log(u))
    samp = pd.DataFrame({"doc_id": raw.doc_id.to_numpy(), "n_feats": n,
                         "dsir_score": w, "dsir_key": key})
    # select on the UNROUNDED key (as the distributed sort does), round
    # only the emitted values
    samp = samp.sort_values(["dsir_key", "doc_id"],
                            ascending=[False, True]).head(k)
    samp["dsir_score"] = _round_away(samp["dsir_score"].to_numpy())
    samp["dsir_key"] = _round_away(samp["dsir_key"].to_numpy())
    return scores, samp.reset_index(drop=True)


def ref_classifier(docs: pd.DataFrame, *, num_buckets=10_000, iters=500,
                   lr=2.0, l2=1e-4,
                   alpha=2.0) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Single-process quality classifier mirroring the driver queries
    (pos = doc_id%10==0, neg = doc_id%10==5, corpus = the rest);
    returns (scores, lottery-filtered)."""
    from kgtk_ray.ops.sample import SALT_LOTTERY, _id_hash
    from kgtk_ray.text.classifier import _featurize

    def hash_order(df):
        # the op's _sample_texts order: (knuth_hash(id), id) ascending
        df = df.assign(__h__=_id_hash(df.doc_id.to_numpy()))
        return (df.sort_values(["__h__", "doc_id"], kind="mergesort")
                .drop(columns="__h__").reset_index(drop=True))

    pos = hash_order(docs[docs.doc_id % 10 == 0])
    neg = hash_order(docs[docs.doc_id % 10 == 5])
    corpus = docs[(docs.doc_id % 10 != 0)
                  & (docs.doc_id % 10 != 5)].reset_index(drop=True)
    texts = pd.concat([pos.text, neg.text], ignore_index=True)
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    loc, b, n = _featurize(texts, num_buckets, True)
    inv = np.zeros(len(texts))
    inv[n > 0] = 1.0 / n[n > 0]
    fw = inv[loc]
    w = np.zeros(num_buckets)
    b0 = 0.0
    m = len(texts)
    for _ in range(iters):
        margin = np.zeros(len(texts))
        np.add.at(margin, loc, w[b] * fw)
        p = 1.0 / (1.0 + np.exp(-(margin + b0)))
        err = p - y
        grad = np.zeros(num_buckets)
        np.add.at(grad, b, err[loc] * fw)
        w -= lr * (grad / m + l2 * w)
        b0 -= lr * float(err.sum()) / m
    loc2, b2, n2 = _featurize(corpus.text, num_buckets, True)
    margin = np.zeros(len(corpus))
    inv2 = np.zeros(len(corpus))
    inv2[n2 > 0] = 1.0 / n2[n2 > 0]
    np.add.at(margin, loc2, w[b2] * inv2[loc2])
    p = 1.0 / (1.0 + np.exp(-(margin + b0)))
    scores = pd.DataFrame({"doc_id": corpus.doc_id.to_numpy(),
                           "n_feats": n2, "clf_score": _round_away(p)})
    u = (_id_hash(corpus.doc_id.to_numpy(), SALT_LOTTERY)
         .astype(np.float64) + 0.5) / 2**32
    kept = scores[u < p ** alpha].reset_index(drop=True)
    return scores, kept


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()

    def save(df: pd.DataFrame, name: str) -> None:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(OUT, name))
        print(f"{name}: {len(df)} rows")

    save(nonsingleton_df(ref_minhash(docs), "doc_id"),
         "minhash_clusters.parquet")
    save(nonsingleton_df(ref_ngram(docs), "doc_id"), "ngram_clusters.parquet")
    save(nonsingleton_df(ref_simhash(docs), "doc_id"),
         "simhash_clusters.parquet")
    save(ref_winnowing(docs), "winnowing.parquet")
    save(ref_ivf(emb), "ivf_ann.parquet")
    save(ref_text_embedding(docs), "text_embedding.parquet")
    save(ref_multimodal(), "multimodal.parquet")
    save(ref_frame_sample(), "frame_sample.parquet")
    save(ref_mediawiki(nation), "mediawiki.parquet")
    save(ref_dedup_against(docs), "dedup_against.parquet")
    save(ref_link_embedding(SF), "link_embedding.parquet")
    save(ref_wikidata_jsons(nation), "wikidata_jsons.parquet")
    dsir_scores, dsir_sample = ref_dsir(docs)
    save(dsir_scores, "dsir_scores.parquet")
    save(dsir_sample, "dsir_sample.parquet")
    clf_scores, clf_filter = ref_classifier(docs)
    save(clf_scores, "clf_scores.parquet")
    save(clf_filter, "clf_filter.parquet")


if __name__ == "__main__":
    main()
