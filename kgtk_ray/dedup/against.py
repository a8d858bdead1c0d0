"""Cross-corpus fuzzy dedup: flag corpus documents that are MinHash
near-duplicates of ANY document in a reference set (dedup corpus B
*against* corpus A — the fuzzy complement of exact k-gram
decontamination, :mod:`kgtk_ray.text.decontam`; the use case is
removing training docs that near-match an eval set or a held-out
corpus, cf. the reference's curate-then-canonicalize chain and GPT-3's
fuzzy eval decontamination).

Pipeline shape (all stages shared with :mod:`.minhash` — same shingle
hashes, signature family and band mixing, so a doc pair matches here
iff it would match in a joint ``minhash_dedup`` run):

  1. both sides shingle + sign + band in one ``map_batches`` pass each;
  2. candidate pairs = cross-side collisions per (band, bucket) — one
     bucketed shuffle over the UNION of both band streams (hot-bucket
     cap as in minhash);
  3. exact shingle-set Jaccard verifies each candidate pair: candidate
     shingle sets are broadcast when small (one ``ray.put``), else
     pair-partitioned via two bucketed hash joins — no driver-side
     shingle dict either way;
  4. the verified corpus-doc id set marks the corpus: output is every
     corpus id with a ``dup`` flag (filter ``~dup`` for the clean set).

Corpus and reference id namespaces are independent (they may overlap;
rows never cross sides).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .minhash import (_VERIFY_BROADCAST_BYTES, _VERIFY_BROADCAST_DOCS,
                      _VERIFY_MIN_BLOCKS, _band_buckets, _jaccard_ok,
                      _make_broadcast_verifier, _perm_params,
                      _shingle_hashes_batch, _signatures_batch)

Dataset = ray.data.Dataset


def dedup_against(corpus: Dataset, reference: Dataset, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  ref_text_col: str | None = None,
                  ref_id_col: str | None = None,
                  num_perm: int = 128, bands: int = 32,
                  shingle_k: int = 5, threshold: float = 0.8,
                  seed: int = 42) -> Dataset:
    """Returns ``(id_col, dup)``: one row per corpus document,
    ``dup=True`` iff its exact shingle Jaccard to some reference
    document is >= ``threshold`` among LSH band-collision candidates."""
    assert num_perm % bands == 0
    r = num_perm // bands
    a_par, b_par = _perm_params(num_perm, seed)
    rtext = ref_text_col or text_col
    rid = ref_id_col or id_col

    def make_stage(side: int, tcol: str, icol: str):
        def shingle(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc": df[icol].to_numpy(),
                "side": np.int8(side),
                "sh": [s.astype(np.int64).tobytes() for s in
                       _shingle_hashes_batch(df[tcol].astype(str),
                                             shingle_k)],
            })
        return shingle

    sh_c = corpus.map_batches(make_stage(0, text_col, id_col),
                              batch_format="pandas").materialize()
    sh_r = reference.map_batches(make_stage(1, rtext, rid),
                                 batch_format="pandas").materialize()

    def sig_bands(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc": df["doc"],
                                 "side": pd.Series(dtype="int8"),
                                 "band": pd.Series(dtype="int64"),
                                 "bucket": pd.Series(dtype="int64")})
        sigs = _signatures_batch(
            [np.frombuffer(s, dtype=np.int64).view(np.uint64)
             for s in df["sh"]], a_par, b_par)
        buckets = _band_buckets(sigs, bands, r)
        n = len(df)
        return pd.DataFrame({
            "doc": np.repeat(df["doc"].to_numpy(), bands),
            "side": np.repeat(df["side"].to_numpy(), bands),
            "band": np.tile(np.arange(bands), n),
            "bucket": buckets.ravel(),
        })

    flat = sh_c.map_batches(sig_bands, batch_format="pandas").union(
        sh_r.map_batches(sig_bands, batch_format="pandas"))

    # cross-side candidate pairs per (band, bucket); hot-bucket cap per
    # side as in minhash (64 x 64 = 4096 pairs max per bucket)
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.drop_duplicates(["band", "bucket", "side", "doc"])
             .sort_values("doc", kind="mergesort"))
        d = d[d.groupby(["band", "bucket", "side"], sort=False)
              .cumcount() < 64]
        lhs = d[d["side"] == 0]
        rhs = d[d["side"] == 1]
        m = lhs.merge(rhs, on=["band", "bucket"])
        return pd.DataFrame({"a": m["doc_x"].to_numpy(),
                             "b": m["doc_y"].to_numpy()})

    from ..ops._bucket import bucketed_group_apply, bucketed_join
    from ..ops.shuffle import ifexists
    from ._cluster import _id_type

    # per-batch pair dedup only; the full (a,b)-shuffled dedup runs
    # just before the pair-partitioned verify (where duplicates re-ship
    # shingle bytes) — the broadcast path is duplicate-tolerant
    raw = bucketed_group_apply(flat, ["band", "bucket"], pairs)
    cand = raw.map_batches(
        lambda df: df.drop_duplicates(["a", "b"]),
        batch_format="pandas").materialize()

    ids = corpus.select_columns([id_col])

    def flag_none(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col],
                             "dup": np.zeros(len(df), dtype=bool)})

    if cand.count() == 0:
        return ids.map_batches(flag_none, batch_format="pandas")

    # Short-circuit as in minhash_dedup: when BOTH whole shingle tables
    # already fit the broadcast gate (count/size are free metadata on
    # materialized datasets), collecting them directly costs the same
    # object-store traffic as collecting the semi-joined subsets —
    # skip the two candidate-id semi-join passes entirely.
    if sh_c.count() + sh_r.count() <= _VERIFY_BROADCAST_DOCS and \
            sh_c.size_bytes() + sh_r.size_bytes() <= _VERIFY_BROADCAST_BYTES:
        sha, shb = sh_c.drop_columns(["side"]), sh_r.drop_columns(["side"])
        n_docs, n_bytes = 0, 0  # under the gate by construction
    else:
        # semi-join each shingle table down to its side's candidate docs
        need_a = cand.map_batches(
            lambda df: pd.DataFrame({"doc": df["a"].drop_duplicates()}),
            batch_format="pandas")
        need_b = cand.map_batches(
            lambda df: pd.DataFrame({"doc": df["b"].drop_duplicates()}),
            batch_format="pandas")
        sha = ifexists(sh_c.drop_columns(["side"]), need_a,
                       input_keys=["doc"], filter_keys=["doc"]).materialize()
        shb = ifexists(sh_r.drop_columns(["side"]), need_b,
                       input_keys=["doc"], filter_keys=["doc"]).materialize()
        n_docs = sha.count() + shb.count()
        n_bytes = sha.size_bytes() + shb.size_bytes()

    if n_docs <= _VERIFY_BROADCAST_DOCS and n_bytes <= _VERIFY_BROADCAST_BYTES:
        da = sha.to_pandas()
        db = shb.to_pandas()
        ref = ray.put((dict(zip(da["doc"], da["sh"])),
                       dict(zip(db["doc"], db["sh"]))))
        if cand.num_blocks() < _VERIFY_MIN_BLOCKS:
            cand = cand.repartition(_VERIFY_MIN_BLOCKS * 2).materialize()
        matched = cand.map_batches(
            _make_broadcast_verifier(ref, threshold, ["a"]),
            batch_format="pandas")
    else:
        # full pair dedup before shipping shingle bytes through the joins
        cand = bucketed_group_apply(
            cand, ["a", "b"],
            lambda df: df.drop_duplicates(["a", "b"])).materialize()
        idt_a = _id_type(ids, id_col)
        idt_b = _id_type(reference.select_columns([rid]), rid)
        sh_fields_a = {"doc": idt_a, "sh": pa.large_binary()}
        sh_fields_b = {"doc": idt_b, "sh": pa.large_binary()}
        with_a = bucketed_join(
            cand.map_batches(lambda df: df.rename(columns={"a": "doc"}),
                             batch_format="pandas"),
            sha, "doc", left_fields={"doc": idt_a, "b": idt_b},
            right_fields=sh_fields_a) \
            .map_batches(lambda df: df.rename(columns={"doc": "a",
                                                       "sh": "sh_a",
                                                       "b": "doc"}),
                         batch_format="pandas")
        with_both = bucketed_join(
            with_a, shb, "doc",
            left_fields={"doc": idt_b, "a": idt_a,
                         "sh_a": pa.large_binary()},
            right_fields=sh_fields_b) \
            .map_batches(lambda df: df.rename(columns={"sh": "sh_b"}),
                         batch_format="pandas")

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            keep = np.fromiter(
                (_jaccard_ok(x, y, threshold)
                 for x, y in zip(df["sh_a"], df["sh_b"])),
                dtype=bool, count=len(df))
            return df.loc[keep, ["a"]]

        matched = with_both.map_batches(verify, batch_format="pandas")

    matched_ids = matched.map_batches(
        lambda df: pd.DataFrame({id_col: df["a"].drop_duplicates()}),
        batch_format="pandas").materialize()

    # flag pass: matched ids are bounded by the candidate set — under
    # the gate, broadcast the set and flag in ONE corpus pass; above
    # it, semi/anti passes (ifexists size-gates internally)
    if matched_ids.count() <= _VERIFY_BROADCAST_DOCS:
        sref = ray.put(set(matched_ids.to_pandas()[id_col]))

        def flag(df: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(sref)
            return pd.DataFrame({id_col: df[id_col],
                                 "dup": df[id_col].isin(s).to_numpy()})

        return ids.map_batches(flag, batch_format="pandas")

    from ..ops.shuffle import ifnotexists

    dup_rows = ifexists(ids, matched_ids, input_keys=[id_col],
                        filter_keys=[id_col]).map_batches(
        lambda df: df.assign(dup=np.ones(len(df), dtype=bool)),
        batch_format="pandas")
    keep_rows = ifnotexists(ids, matched_ids, input_keys=[id_col],
                            filter_keys=[id_col]).map_batches(
        lambda df: df.assign(dup=np.zeros(len(df), dtype=bool)),
        batch_format="pandas")
    return dup_rows.union(keep_rows)
