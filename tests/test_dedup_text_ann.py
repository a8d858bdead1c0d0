"""Dedup, text-analysis, ANN and multimodal stage tests."""
import numpy as np
import pandas as pd
import pytest
import ray.data

from kgtk_ray.ann import ivf_topk_cosine, topk_cosine
from kgtk_ray.dedup import (
    dedup_exact,
    embedding_dedup,
    minhash_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from kgtk_ray.multimodal import DeterministicFakeDecoder, decode_features, synthesize_media
from kgtk_ray.text import fingerprint, langid, quality_score, token_counts, winnowing_fingerprints

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "while the sun sets slowly behind the big old hill near the lake")


def corpus():
    docs = []
    for i in range(20):
        docs.append((i, BASE + f" unique tail {i}"))
    # near-dups of doc 0 (one word changed)
    docs.append((100, BASE.replace("quick", "swift") + " unique tail 0"))
    docs.append((101, BASE + " unique tail 0"))  # exact dup of doc 0
    # a totally different doc
    docs.append((200, "completely different text about spark ray arrow data"))
    return ray.data.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))


def cluster_map(ds):
    df = ds.to_pandas()
    return dict(zip(df.doc_id, df.cluster))


def test_dedup_exact():
    out = dedup_exact(corpus()).to_pandas()
    assert len(out) == 22  # 23 distinct texts, one exact dup removed
    assert 101 not in set(out.doc_id)
    assert 0 in set(out.doc_id)  # min id wins


def test_minhash_dedup():
    cm = cluster_map(minhash_dedup(corpus(), threshold=0.7))
    assert cm[101] == 0          # exact dup clusters with 0
    assert cm[100] == 0          # near dup clusters with 0
    assert cm[200] == 200        # distinct text is a singleton


def test_simhash_dedup():
    cm = cluster_map(simhash_dedup(corpus(), max_hamming=3))
    assert cm[101] == 0
    assert cm[200] == 200


def test_ngram_jaccard_dedup():
    cm = cluster_map(ngram_jaccard_dedup(corpus(), n=2, threshold=0.6))
    assert cm[101] == 0
    assert cm[200] == 200


def test_embedding_dedup():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((10, 16)).astype(np.float32)
    vecs = list(base) + [base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)]
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": list(range(10)) + [100],
        "embedding": [v.tolist() for v in vecs]}))
    df = embedding_dedup(ds, threshold=0.99).to_pandas()
    cm = dict(zip(df.vec_id, df.cluster))
    assert cm[100] == 0
    assert cm[5] == 5


def test_topk_cosine_matches_numpy():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((200, 32)).astype(np.float32)
    Q = rng.standard_normal((3, 32)).astype(np.float32)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": range(200), "embedding": [v.tolist() for v in X]}))
    out = topk_cosine(ds, Q, k=5).to_pandas()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Qn @ Xn.T
    for qi in range(3):
        want = set(np.argsort(-sims[qi])[:5])
        got = set(out[out.query_id == qi]["vec_id"])
        assert got == want


def test_ivf_topk_recall():
    rng = np.random.default_rng(2)
    X = rng.standard_normal((500, 16)).astype(np.float32)
    Q = X[:2] + 0.01  # queries near existing points
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": range(500), "embedding": [v.tolist() for v in X]}))
    out = ivf_topk_cosine(ds, Q, k=3, n_centroids=8, nprobe=4).to_pandas()
    # the nearest point itself must be found
    assert 0 in set(out[out.query_id == 0]["vec_id"])
    assert 1 in set(out[out.query_id == 1]["vec_id"])


def test_langid_and_quality_and_tokens():
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat and the dog of the house",
                 "der hund und die katze und der vogel",
                 "xyz qwerty"],
    }))
    out = langid(ds).to_pandas()
    assert list(out.lang_pred) == ["en", "de", "und"]
    q = quality_score(ds).to_pandas()
    assert q.iloc[0]["stop_ratio"] > q.iloc[2]["stop_ratio"]
    t = token_counts(ds).to_pandas()
    assert t.iloc[0]["ws_tokens"] == 8
    assert t.iloc[2]["bpe_tokens"] == 2


def test_fingerprint():
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["A  b\tC", "a b c"]}))
    out = fingerprint(ds).to_pandas()
    assert out.fingerprint.iloc[0] == out.fingerprint.iloc[1]  # ws+case normalized
    w = winnowing_fingerprints(corpus(), k=8, window=4).to_pandas()
    assert len(w) > 0 and {"doc_id", "pos", "hash"} <= set(w.columns)
    # identical docs share all winnowed hashes
    h0 = set(w[w.doc_id == 0]["hash"])
    h101 = set(w[w.doc_id == 101]["hash"])
    assert h0 == h101


def test_multimodal_plumbing():
    media = synthesize_media(32)
    out = decode_features(media).to_pandas()
    assert len(out) == 32
    assert len(out.features.iloc[0]) == 64
    # deterministic: same payload -> same features
    out2 = decode_features(synthesize_media(32)).to_pandas()
    assert np.allclose(np.stack(out.features), np.stack(out2.features))
    with pytest.raises(NotImplementedError):
        from kgtk_ray.multimodal import LibraryDecoder
        LibraryDecoder()


def test_ivf_index_partition_pruned(tmp_path):
    import pyarrow.parquet as pq
    from kgtk_ray.ann import IVFIndex
    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    qt = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    qt = qt[qt.vec_id < 3].sort_values("vec_id")
    Q = np.stack(qt.embedding.to_numpy()).astype(np.float64)

    idx = IVFIndex.build(emb, str(tmp_path / "ivf"), n_centroids=8)
    got = idx.search(Q, k=5, nprobe=3).to_pandas() \
        .sort_values(["query_id", "score", "vec_id"],
                     ascending=[True, False, True]).reset_index(drop=True)
    exp = ivf_topk_cosine(emb, Q, k=5, n_centroids=8, nprobe=3,
                          ).to_pandas() \
        .sort_values(["query_id", "score", "vec_id"],
                     ascending=[True, False, True]).reset_index(drop=True)
    # identical centroids/buckets => identical answers, but the index
    # read only the probed partitions
    pd.testing.assert_frame_equal(got, exp)
    # the partitioned layout exists with one dir per non-empty bucket
    import os
    buckets = [d for d in os.listdir(tmp_path / "ivf")
               if d.startswith("bucket=")]
    assert len(buckets) >= 2


def test_ivf_index_missing_partitions_error(tmp_path):
    """Probing an index path with no bucket partitions raises a
    descriptive FileNotFoundError, not an IndexError."""
    from kgtk_ray.ann import IVFIndex
    C = np.eye(4, 8, dtype=np.float32)
    idx = IVFIndex(str(tmp_path / "nonexistent"), C)
    with pytest.raises(FileNotFoundError, match="probed bucket"):
        idx.search(np.eye(1, 8), k=3, nprobe=2)


def test_cluster_pairs_distributed_path_matches_driver():
    """The size gate defaults near-dup clustering to the driver
    union-find; force the distributed min-label propagation and assert
    identical output (it is the 100-TB path and must not rot)."""
    from kgtk_ray.dedup._cluster import assign_clusters
    ids = ray.data.from_pandas(pd.DataFrame({"doc_id": list(range(12))}))
    pairs = pd.DataFrame({"a": [0, 1, 5, 7, 7], "b": [1, 2, 6, 8, 8]})
    pairs_ds = ray.data.from_pandas(pairs)
    driver = assign_clusters(ids, pairs_ds, id_col="doc_id") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    dist = assign_clusters(ids, pairs_ds, id_col="doc_id",
                           driver_limit=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(driver, dist)
    cm = dict(zip(driver.doc_id, driver.cluster))
    assert cm[2] == 0 and cm[6] == 5 and cm[8] == 7 and cm[3] == 3


def test_resize_and_frame_sample_plumbing():
    from kgtk_ray.multimodal import (
        resize_media, sample_frames, synthesize_media,
    )

    media = synthesize_media(16)
    resized = resize_media(media, width=8, height=4).to_pandas()
    assert (resized["width"] == 8).all() and (resized["height"] == 4).all()
    assert all(len(p) == 32 for p in resized["payload"])

    frames = sample_frames(media, num_frames=4).to_pandas()
    assert len(frames) == 64
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}
    # frame windows tile the payload: per media, lengths sum to the
    # original payload length
    orig = media.to_pandas().set_index("media_id")["payload"].str.len()
    got = frames.assign(n=frames["payload"].str.len()) \
        .groupby("media_id")["n"].sum()
    assert (got == orig.loc[got.index]).all()


def test_fake_decoder_vectorized_matches_scalar():
    import numpy as np
    import pyarrow as pa
    from kgtk_ray.multimodal import DeterministicFakeDecoder

    rng = np.random.default_rng(3)
    bufs = [rng.integers(0, 256, size=int(rng.integers(1, 500)),
                         dtype=np.uint8).tobytes() for _ in range(50)] + [b""]
    t = pa.table({"media_id": pa.array(range(51), pa.int64()),
                  "payload": pa.array(bufs, pa.large_binary())})
    dec = DeterministicFakeDecoder(dim=64)
    got = np.asarray(dec(t)["features"].to_pylist(), dtype=np.float32)
    # scalar reference
    want = []
    for buf in bufs:
        b = np.frombuffer(buf or b"\x00", dtype=np.uint8)
        hist = np.bincount(b % 64, minlength=64).astype(np.float32)
        n = np.linalg.norm(hist)
        want.append(hist / n if n else hist)
    assert np.array_equal(got, np.asarray(want, dtype=np.float32))


def test_shingle_and_signature_batch_parity():
    # the batch kernels (Arrow-buffer shingling, batched signatures)
    # must agree bit-for-bit with the single-doc reference forms the
    # fixtures are generated from
    import pandas as pd
    from kgtk_ray.dedup.minhash import (_perm_params, _shingle_hashes,
                                        _shingle_hashes_batch, _signature,
                                        _signatures_batch)
    rng = np.random.default_rng(7)
    texts = ["", "a", "ab", "abcd", "x" * 5, "héllo wörld ☃" * 3,
             "the quick brown fox " * 40] + [
        "".join(rng.choice(list("abcdef .\n\t"), size=rng.integers(0, 250)))
        for _ in range(150)]
    for k in (3, 5, 9):
        got = _shingle_hashes_batch(pd.Series(texts, dtype=str), k)
        assert len(got) == len(texts)
        for t, g in zip(texts, got):
            assert np.array_equal(_shingle_hashes(t, k), g), (k, t[:20])
    a, b = _perm_params(64, 42)
    shs = [_shingle_hashes(t, 5) for t in texts]
    sigs = _signatures_batch(shs, a, b)
    for i, s in enumerate(shs):
        assert np.array_equal(sigs[i], _signature(s, a, b))
    assert _signatures_batch([], a, b).shape == (0, 64)
