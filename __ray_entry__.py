"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline
from SURVEY.md §2 (plus the training-data extensions); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query, with
matching column names.  Ray is initialised by the driver before this
module is imported — nothing here calls ``ray.init``/``ray.shutdown``.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import ray.data as rd


# ---------------------------------------------------------------------------
# derived edge tables (the same derivations are inlined in the oracle SQL)
# ---------------------------------------------------------------------------

def _edges_lineitem(sf: str) -> "rd.Dataset":
    """lineitem -> edge file: O<orderkey> --has_part--> P<partkey>
    with supp + ln qualifier columns (ln makes rows unique for the
    deterministic sequence-id test).  Arrow-native build: the string
    tagging runs as zero-copy large_string kernels (the pandas object
    concat was ~45% of the `compact` bench entry's wall time)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    li = rd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_linenumber"])

    def f(t: "_pa.Table") -> "_pa.Table":
        empty = _pa.scalar("", _pa.large_string())

        def tag(prefix: str, col: str):
            return _pc.binary_join_element_wise(
                _pa.scalar(prefix, _pa.large_string()),
                _pc.cast(t[col], _pa.large_string()), empty)

        n = t.num_rows
        return _pa.table({
            "node1": tag("O", "l_orderkey"),
            "label": _pc.fill_null(_pa.nulls(n, _pa.large_string()),
                                   "has_part"),
            "node2": tag("P", "l_partkey"),
            "supp": tag("S", "l_suppkey"),
            "ln": _pc.cast(t["l_linenumber"], _pa.large_string()),
        })

    return li.map_batches(f, batch_format="pyarrow")


def _edges_nation(sf: str) -> "rd.Dataset":
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node1": "N" + df.n_nationkey.astype(str),
            "label": "in_region",
            "node2": "R" + df.n_regionkey.astype(str),
            "n_name": df.n_name.astype(str),
        })

    return n.map_batches(f, batch_format="pandas")


def _edges_supplier(sf: str) -> "rd.Dataset":
    s = rd.read_parquet(f"{sf}/supplier.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node1": "N" + df.s_nationkey.astype(str),
            "label": "has_supplier",
            "node2": "S" + df.s_suppkey.astype(str),
            "s_name": df.s_name.astype(str),
        })

    return s.map_batches(f, batch_format="pandas")


def _edges_orders(sf: str) -> "rd.Dataset":
    o = rd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderstatus"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node1": "C" + df.o_custkey.astype(str),
            "label": "placed",
            "node2": "O" + df.o_orderkey.astype(str),
            "status": np.where(df.o_orderstatus == "O", "", df.o_orderstatus),
        })

    return o.map_batches(f, batch_format="pandas")


_EDGE_SQL_LI = (
    "SELECT 'O'||CAST(l_orderkey AS VARCHAR) AS node1, 'has_part' AS label, "
    "'P'||CAST(l_partkey AS VARCHAR) AS node2, "
    "'S'||CAST(l_suppkey AS VARCHAR) AS supp, "
    "CAST(l_linenumber AS VARCHAR) AS ln FROM lineitem"
)
_EDGE_SQL_NATION = (
    "SELECT 'N'||CAST(n_nationkey AS VARCHAR) AS node1, 'in_region' AS label, "
    "'R'||CAST(n_regionkey AS VARCHAR) AS node2, n_name FROM nation"
)
_EDGE_SQL_SUPP = (
    "SELECT 'N'||CAST(s_nationkey AS VARCHAR) AS node1, 'has_supplier' AS label, "
    "'S'||CAST(s_suppkey AS VARCHAR) AS node2, s_name FROM supplier"
)
_EDGE_SQL_ORDERS = (
    "SELECT 'C'||CAST(o_custkey AS VARCHAR) AS node1, 'placed' AS label, "
    "'O'||CAST(o_orderkey AS VARCHAR) AS node2, "
    "CASE WHEN o_orderstatus='O' THEN '' ELSE o_orderstatus END AS status "
    "FROM orders"
)


def _round_cols(ds, cols: list[str], nd: int = 6):
    """Round half-away-from-zero (DuckDB's ROUND semantics; numpy's
    default round is half-even, which diverges on exact midpoints)."""
    scale = 10.0 ** nd

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in cols:
            x = df[c].astype(float).to_numpy()
            df[c] = np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
        return df

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# query callables
# ---------------------------------------------------------------------------

def _q_kg_pipeline(sf: str):
    from kgtk_ray.pipelines import kg_pipeline
    return kg_pipeline(sf, check_extraction=True)


def _q_filter(sf: str):
    from kgtk_ray.ops import kgtk_filter
    return kgtk_filter(_edges_lineitem(sf), subj={"O1", "O2", "O3", "O32", "O33"})


def _q_ifempty(sf: str):
    from kgtk_ray.ops import ifempty
    return ifempty(_edges_orders(sf), ["status"])


def _q_ifnotempty(sf: str):
    from kgtk_ray.ops import ifnotempty
    return ifnotempty(_edges_orders(sf), ["status"])


def _q_compact(sf: str):
    from kgtk_ray.ops import compact
    ds = _edges_lineitem(sf).drop_columns(["ln"])
    return compact(ds, ["node1", "label", "node2"])


def _q_unique(sf: str):
    from kgtk_ray.ops import unique_counts
    return unique_counts(_edges_lineitem(sf), "node1")


def _q_ifexists(sf: str):
    from kgtk_ray.ops import ifexists
    cust = rd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])
    rich = cust.map_batches(
        lambda df: pd.DataFrame({"id": "C" + df[df.c_acctbal > 5000]
                                 .c_custkey.astype(str)}),
        batch_format="pandas")
    return ifexists(_edges_orders(sf), rich)


def _q_ifnotexists(sf: str):
    from kgtk_ray.ops import ifnotexists
    cust = rd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])
    rich = cust.map_batches(
        lambda df: pd.DataFrame({"id": "C" + df[df.c_acctbal > 5000]
                                 .c_custkey.astype(str)}),
        batch_format="pandas")
    return ifnotexists(_edges_orders(sf), rich)


def _q_join(sf: str):
    from kgtk_ray.ops import kgtk_join
    return kgtk_join(_edges_nation(sf), _edges_supplier(sf), join_on=["node1"])


def _q_lift(sf: str):
    from kgtk_ray.ops import lift
    nat = rd.read_parquet(f"{sf}/nation.parquet")
    reg = rd.read_parquet(f"{sf}/region.parquet")
    nlab = nat.map_batches(lambda df: pd.DataFrame({
        "node1": "N" + df.n_nationkey.astype(str), "label": "label",
        "node2": "'" + df.n_name.astype(str).str.strip() + "'@en"}),
        batch_format="pandas")
    rlab = reg.map_batches(lambda df: pd.DataFrame({
        "node1": "R" + df.r_regionkey.astype(str), "label": "label",
        "node2": "'" + df.r_name.astype(str).str.strip() + "'@en"}),
        batch_format="pandas")
    labels = nlab.union(rlab)
    return lift(_edges_nation(sf).drop_columns(["n_name"]), labels)


def _q_add_id(sf: str):
    from kgtk_ray.ops import add_id
    return add_id(_edges_nation(sf).drop_columns(["n_name"]),
                  style="node1-label-node2")


def _q_add_id_num(sf: str):
    from kgtk_ray.ops import add_id
    return add_id(_edges_lineitem(sf), style="node1-label-num")


def _q_cskg_dedup(sf: str):
    """cskg_utils.deduplicate_with_transformations: comma-list merge
    per (node1, label) group (kgtk/cskg_utils.py:17-30)."""
    import ray.data as _rd

    from kgtk_ray.ops import dedup_with_transforms
    nat = _rd.read_parquet(f"{sf}/nation.parquet",
                           columns=["n_regionkey", "n_name"])
    rows = nat.map_batches(lambda df: pd.DataFrame({
        "node1": "R" + df.n_regionkey.astype(str),
        "label": "has_nation",
        "vals": df.n_name.astype(str).str.strip() + ",common",
    }), batch_format="pandas")
    return dedup_with_transforms(rows, ["node1", "label"], ["vals"])


def _q_add_id_prefix(sf: str):
    from kgtk_ray.ops import add_id
    return add_id(_edges_nation(sf).drop_columns(["n_name"]),
                  style="prefix###", id_prefix="E", initial_id=1,
                  id_prefix_num_width=4)


def _q_expand(sf: str):
    from kgtk_ray.ops import expand_lists
    nat = _edges_nation(sf)
    withlist = nat.map_batches(lambda df: pd.DataFrame({
        "node1": df.node1, "label": df.label, "node2": df.node2,
        "q": df.n_name.astype(str).str.strip() + "|" + df.node1}),
        batch_format="pandas")
    return expand_lists(withlist, ["q"])


def _q_normalize_nodes(sf: str):
    from kgtk_ray.ops import normalize_nodes
    cust = rd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment", "c_nationkey"])
    nodes = cust.map_batches(lambda df: pd.DataFrame({
        "id": "C" + df.c_custkey.astype(str),
        "segment": df.c_mktsegment.astype(str),
        "nation": "N" + df.c_nationkey.astype(str)}),
        batch_format="pandas")
    return normalize_nodes(nodes)


def _part_values(sf: str):
    part = rd.read_parquet(f"{sf}/part.parquet",
                           columns=["p_partkey", "p_size", "p_brand"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        k = df.p_size % 5
        node2 = np.select(
            [k == 0, k == 1, k == 2, k == 3],
            [df.p_size.astype(str),
             '"part ' + df.p_partkey.astype(str) + '"',
             df.p_size.astype(str) + "m",
             "^19" + (df.p_size % 90 + 10).astype(str) + "-01-01"],
            default=df.p_brand.astype(str).str.replace(" ", "", regex=False),
        )
        return pd.DataFrame({"node1": "P" + df.p_partkey.astype(str),
                             "label": "value", "node2": node2})

    return part.map_batches(f, batch_format="pandas")


def _q_explode(sf: str):
    from kgtk_ray.ops import explode_node2
    ex = explode_node2(_part_values(sf), fields=["data_type", "number"])
    return ex.map_batches(
        lambda df: df[["node1", "node2", "node2;kgtk:data_type",
                       "node2;kgtk:number"]],
        batch_format="pandas")


def _q_clean_repair(sf: str):
    from kgtk_ray.ops import clean_edges
    part = rd.read_parquet(f"{sf}/part.parquet", columns=["p_partkey", "p_size"])
    vals = part.map_batches(lambda df: pd.DataFrame({
        "node1": "P" + df.p_partkey.astype(str), "label": "born",
        "node2": "^" + (1900 + df.p_size).astype(str) + "-00-00"}),
        batch_format="pandas")
    return clean_edges(vals, ["node2"])


def _q_calc(sf: str):
    from kgtk_ray.ops import calc_percentage
    li = rd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])
    ds = li.map_batches(lambda df: pd.DataFrame({
        "node1": "O" + df.l_orderkey.astype(str),
        "ln": df.l_linenumber.astype(str),
        "v": df.l_quantity, "t": 50.0}),
        batch_format="pandas")
    return calc_percentage(ds, "v", "t")


def _q_cat(sf: str):
    from kgtk_ray.ops import cat
    nat = _edges_nation(sf).map_batches(
        lambda df: df.rename(columns={"node1": "from", "label": "predicate",
                                      "node2": "to"}),
        batch_format="pandas")
    return cat(nat, _edges_supplier(sf))


def _q_sort(sf: str):
    from kgtk_ray.ops import sort_edges
    return sort_edges(_edges_nation(sf), ["node1"])


def _q_dedup_exact(sf: str):
    from kgtk_ray.dedup import dedup_exact
    docs = rd.read_parquet(f"{sf}/documents.parquet")
    return dedup_exact(docs)


def _q_degrees(sf: str):
    from kgtk_ray.ops import degrees
    return degrees(_edges_lineitem(sf), direction="out")


def _q_reachable(sf: str):
    from kgtk_ray.ops import reachable_nodes
    sup_nat = _edges_supplier(sf).map_batches(
        lambda df: pd.DataFrame({"node1": df.node2, "label": "in_nation",
                                 "node2": df.node1}),
        batch_format="pandas")
    edges = sup_nat.union(_edges_nation(sf).drop_columns(["n_name"]))
    return reachable_nodes(edges, ["S1", "S2", "S3"])


def _q_reachable_distributed(sf: str):
    """Same BFS as ``reachable`` but through the Dataset-state path
    (frontier/visited stay Datasets; driver sees only counters) —
    oracle-checks the scale path, not just the driver-frontier one."""
    from kgtk_ray.ops import reachable_nodes
    sup_nat = _edges_supplier(sf).map_batches(
        lambda df: pd.DataFrame({"node1": df.node2, "label": "in_nation",
                                 "node2": df.node1}),
        batch_format="pandas")
    edges = sup_nat.union(_edges_nation(sf).drop_columns(["n_name"]))
    return reachable_nodes(edges, ["S1", "S2", "S3"], distributed=True,
                           num_partitions=4)


def _q_connected_components(sf: str):
    from kgtk_ray.ops import connected_components
    return connected_components(_edges_nation(sf).drop_columns(["n_name"]))


def _q_scc(sf: str):
    """Strongly connected components (--strong): nation->region edges
    are one-way; suppliers serve their nation and every third supplier
    is also served_by back, so the only cycles are those mutual pairs —
    each SCC is a nation plus its %3 suppliers, everything else
    singleton."""
    from kgtk_ray.ops import connected_components
    sup = rd.read_parquet(f"{sf}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    serves = sup.map_batches(lambda df: pd.DataFrame({
        "node1": "S" + df.s_suppkey.astype(str), "label": "serves",
        "node2": "N" + df.s_nationkey.astype(str)}),
        batch_format="pandas")
    served_by = sup.map_batches(lambda df: pd.DataFrame({
        "node1": "N" + df.s_nationkey.astype(str), "label": "served_by",
        "node2": "S" + df.s_suppkey.astype(str)})[
        (df.s_suppkey % 3 == 0).to_numpy()],
        batch_format="pandas")
    edges = _edges_nation(sf).drop_columns(["n_name"]).union(
        serves, served_by)
    return connected_components(edges, strong=True)


def _q_tumbling(sf: str):
    from kgtk_ray.ops import tumbling_window
    ev = rd.read_parquet(f"{sf}/events.parquet")
    out = tumbling_window(ev, window_s=3600)
    return _round_cols(out, ["total", "vmin", "vmax"], 4)


def _q_sliding(sf: str):
    from kgtk_ray.ops.window import sliding_window
    ev = rd.read_parquet(f"{sf}/events.parquet")
    out = sliding_window(ev, window_s=3600, slide_s=1800)
    return _round_cols(out, ["total", "vmin", "vmax"], 4)


def _q_sessions(sf: str):
    from kgtk_ray.ops.window import session_window
    ev = rd.read_parquet(f"{sf}/events.parquet")
    return session_window(ev, gap_s=1800)


def _q_agg_pricing(sf: str):
    from kgtk_ray.ops.agg import grouped_aggregate
    li = rd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def revenue(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["revenue"] = df.l_extendedprice * (1 - df.l_discount)
        return df

    out = grouped_aggregate(
        li.map_batches(revenue, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"], {
            "sum_qty": ("l_quantity", "sum"),
            "sum_revenue": ("revenue", "sum"),
            "avg_disc": ("l_discount", "mean"),
            "n": (None, "count"),
        }, num_buckets=8)
    return _round_cols(out, ["sum_qty", "sum_revenue", "avg_disc"], 4)


def _q_langid(sf: str):
    from kgtk_ray.text import langid
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return langid(docs).select_columns(["doc_id", "lang_pred"])


def _q_quality(sf: str):
    from kgtk_ray.text import quality_score
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    out = quality_score(docs).select_columns(
        ["doc_id", "n_tokens", "punct_ratio", "stop_ratio", "quality"])
    return _round_cols(out, ["punct_ratio", "stop_ratio", "quality"], 6)


def _q_tokens(sf: str):
    from kgtk_ray.text import token_counts
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return token_counts(docs).select_columns(["doc_id", "ws_tokens", "bpe_tokens"])


def _q_fingerprint(sf: str):
    from kgtk_ray.text import fingerprint
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return fingerprint(docs).select_columns(["doc_id", "fingerprint"])


def _q_repetition(sf: str):
    from kgtk_ray.text import repetition_signals
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    out = repetition_signals(docs)
    return _round_cols(out, ["dup_word_frac", "top_word_frac",
                             "top_bigram_frac", "mean_word_len"], 6)


def _q_gopher_filter(sf: str):
    from kgtk_ray.text import gopher_filter
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return gopher_filter(docs, min_tokens=30, max_dup_word_frac=0.55,
                         max_top_word_frac=0.13)


def _q_dup_ngrams(sf: str):
    from kgtk_ray.text import corpus_dup_ngram_frac
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    out = corpus_dup_ngram_frac(docs, k=3, min_docs=2)
    return _round_cols(out, ["dup_gram_frac"], 6)


def _q_pii_scrub(sf: str):
    from kgtk_ray.text import scrub_pii
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    # the corpus text carries no PII, so append deterministic synthetic
    # PII (mirrored verbatim in the oracle SQL) so the redaction
    # kernels are actually exercised
    aug = docs.map_batches(lambda df: pd.DataFrame({
        "doc_id": df.doc_id,
        "text": df.text + " contact user" + df.doc_id.astype(str)
                + "@mail.example.com or +1 555 01"
                + (df.doc_id % 89).astype(str) + " from 10."
                + (df.doc_id % 200).astype(str) + ".0."
                + (df.doc_id % 250).astype(str) + " ssn "
                + (df.doc_id % 900 + 100).astype(str) + "-"
                + (df.doc_id % 90 + 10).astype(str) + "-"
                + (df.doc_id % 9000 + 1000).astype(str)}),
        batch_format="pandas")
    return scrub_pii(aug)


def _q_lm_score(sf: str):
    from kgtk_ray.text import unigram_logprob
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ref = docs.map_batches(lambda df: df[df.doc_id % 10 == 0],
                           batch_format="pandas")
    corpus = docs.map_batches(lambda df: df[df.doc_id % 10 != 0],
                              batch_format="pandas")
    return _round_cols(unigram_logprob(corpus, ref), ["lm_score"], 6)


def _q_decontaminate(sf: str):
    from kgtk_ray.text import decontaminate
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ev = docs.map_batches(lambda df: df[df.doc_id % 50 == 0],
                          batch_format="pandas")
    corpus = docs.map_batches(lambda df: df[df.doc_id % 50 != 0],
                              batch_format="pandas")
    return decontaminate(corpus, ev, k=4)


def _q_chunk_text(sf: str):
    from kgtk_ray.text import chunk_text
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return chunk_text(docs, size=128, overlap=32)


def _q_semdedup(sf: str):
    """Plant exact duplicates (vectors 0..49 re-appear as vec_id+10000,
    as in embedding_dedup): identical vectors always share a k-means
    cluster and have cosine 1.0, so each planted copy is the semantic
    duplicate of its lower-id original, while the raw table has no pair
    above eps (max pairwise cosine ~0.51) — the keep flag is plain SQL.
    The cluster column (k-means-dependent) is pytest-checked against a
    single-process replay instead (tests/test_semdedup.py)."""
    from kgtk_ray.dedup import semdedup
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    dup = emb.map_batches(
        lambda df: df[df.vec_id < 50].assign(
            vec_id=lambda d: d.vec_id + 10000),
        batch_format="pandas")
    return semdedup(emb.union(dup), eps=0.95).drop_columns(["cluster"])


def _q_pack_sequences(sf: str):
    from kgtk_ray.text import pack_sequences
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return pack_sequences(docs, max_tokens=512, n_bins=16)


def _q_dedup_against(sf: str):
    """Corpus = documents; reference = the doc_id%7==0 subset (same
    text, separate id namespace).  Every %7 doc is trivially flagged
    (Jaccard 1 with its own copy); the interesting rows are the corpus
    docs that are genuine near-dups of a %7 doc — fixture oracle from
    the single-process replay (scripts/make_fixtures.py)."""
    from kgtk_ray.dedup import dedup_against
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ref = docs.map_batches(
        lambda df: df[df.doc_id % 7 == 0].rename(columns={"doc_id": "ref_id"}),
        batch_format="pandas")
    return dedup_against(docs, ref, ref_id_col="ref_id")


def _q_sample_per_group(sf: str):
    from kgtk_ray.ops import sample_per_group
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source"])
    return sample_per_group(docs, group_col="source", id_col="doc_id", n=10)


def _q_split_dataset(sf: str):
    from kgtk_ray.ops import split_dataset
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source"])
    return split_dataset(docs, id_col="doc_id",
                         fractions={"train": 0.8, "valid": 0.1,
                                    "test": 0.1})


def _q_dedup_spans(sf: str):
    from kgtk_ray.text import dedup_spans
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return dedup_spans(docs, k=3)


def _q_corpus_stats(sf: str):
    from kgtk_ray.ops import grouped_profile
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["source", "n_chars"])
    return _round_cols(grouped_profile(docs, group_col="source",
                                       value_col="n_chars"), ["mean"], 6)


def _q_shard_assign(sf: str):
    from kgtk_ray.ops import shard_assign
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source"])
    return shard_assign(docs, id_col="doc_id", n_shards=8)


def _q_corpus_curation(sf: str):
    """Flagship web-text curation chain: Gopher quality filter -> PII
    scrub -> C4 span dedup -> deterministic train/valid/test split.
    Every stage is individually oracle-checked elsewhere; this entry
    pins their COMPOSITION (stage order, schema hand-off, determinism
    of the chained result)."""
    from kgtk_ray.ops import split_dataset
    from kgtk_ray.text import dedup_spans, gopher_filter, scrub_pii
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    kept = gopher_filter(docs, min_tokens=30, max_dup_word_frac=0.55,
                         max_top_word_frac=0.13)
    deduped = dedup_spans(scrub_pii(kept), k=3)
    return split_dataset(deduped, id_col="doc_id",
                         fractions={"train": 0.8, "valid": 0.1,
                                    "test": 0.1})


def _q_weighted_sample(sf: str):
    from kgtk_ray.ops import weighted_sample
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source"])
    return weighted_sample(docs, rate_col="source", id_col="doc_id",
                           rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
                           default_rate=0.1)


def _q_topk_cosine(sf: str):
    from kgtk_ray.ann import topk_cosine
    import pyarrow.parquet as pq
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    qt = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    Q = np.stack(qt.embedding.to_numpy()).astype(np.float64)
    out = topk_cosine(emb, Q, k=10)
    return _round_cols(out.select_columns(["query_id", "vec_id", "score"]),
                       ["score"], 6)


_EX_NS = {"http://example.org/": "ex"}


def _nt_lines(sf: str):
    """Deterministic N-triples lines derived from nation (same derivation
    inlined in the oracle SQL)."""
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        base = "<http://example.org/"
        reg = (base + "N" + df.n_nationkey.astype(str) + "> "
               + base + "in_region> "
               + base + "R" + df.n_regionkey.astype(str) + "> .")
        name = (base + "N" + df.n_nationkey.astype(str) + "> "
                + base + "name> \"" + df.n_name.astype(str).str.strip()
                + "\" .")
        return pd.DataFrame({"line": pd.concat([reg, name], ignore_index=True)})

    return n.map_batches(f, batch_format="pandas")


def _q_import_ntriples(sf: str):
    from kgtk_ray.io import import_ntriples
    # oracle models plain conversion: no n1.. allocation pass, no
    # appended used-namespace rows (reference CLI extras)
    return import_ntriples(_nt_lines(sf), namespaces=_EX_NS,
                           allocate_namespaces=False)


def _q_generate_ntriples(sf: str):
    from kgtk_ray.io import generate_ntriples
    return generate_ntriples(_edges_nation(sf).drop_columns(["n_name"]),
                             namespaces=_EX_NS)


def _reified_orders(sf: str):
    o = rd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderstatus"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        st = "ST" + df.o_orderkey.astype(str)
        frames = [
            pd.DataFrame({"node1": st, "label": "rdf:type",
                          "node2": "rdf:Statement"}),
            pd.DataFrame({"node1": st, "label": "rdf:subject",
                          "node2": "C" + df.o_custkey.astype(str)}),
            pd.DataFrame({"node1": st, "label": "rdf:predicate",
                          "node2": "placed"}),
            pd.DataFrame({"node1": st, "label": "rdf:object",
                          "node2": "O" + df.o_orderkey.astype(str)}),
            pd.DataFrame({"node1": st, "label": "status",
                          "node2": df.o_orderstatus.astype(str)}),
        ]
        return pd.concat(frames, ignore_index=True)

    return o.map_batches(f, batch_format="pandas")


def _q_unreify(sf: str):
    from kgtk_ray.ops import unreify_rdf_statements
    return unreify_rdf_statements(_reified_orders(sf))


def _q_validate_properties(sf: str):
    """Exercises the widened rule engine: full-match patterns, numeric
    ranges, per-group cardinality, isa inheritance and a node2_chain
    (suppliers may only be located in nations whose in_region edge
    survived validation — regionkey 4 nations fail the R[0-3] pattern,
    so their suppliers fail the chain)."""
    from kgtk_ray.ops import validate_properties
    part_sizes = rd.read_parquet(f"{sf}/part.parquet",
                                 columns=["p_partkey", "p_size"]) \
        .map_batches(lambda df: pd.DataFrame({
            "node1": "P" + df.p_partkey.astype(str), "label": "size",
            "node2": df.p_size.astype(str)}), batch_format="pandas")
    located = rd.read_parquet(f"{sf}/supplier.parquet",
                              columns=["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda df: pd.DataFrame({
            "node1": "S" + df.s_suppkey.astype(str), "label": "located_in",
            "node2": "N" + df.s_nationkey.astype(str)}),
            batch_format="pandas")
    edges = _edges_nation(sf).drop_columns(["n_name"]).union(
        _edges_supplier(sf).drop_columns(["s_name"]),
        part_sizes, located)
    patterns = pd.DataFrame({
        "prop": ["in_region", "in_region", "in_region", "has_supplier",
                 "size", "size", "located_in", "nation_dt"],
        "kind": ["isa", "node1_pattern", "node2_pattern", "maxoccurs",
                 "minval", "maxval", "node2_chain", "node1_pattern"],
        "value": ["nation_dt", r"N\d+", r"R[0-3]", "3",
                  "10", "40", "nation_dt", r"N\d+"],
    })
    # per-row mode (the oracle SQL models row-level rejection; the
    # library default is the reference's grouped node1 rejection)
    return validate_properties(edges, patterns, reject_node1_groups=False)


def _q_paths(sf: str):
    from kgtk_ray.ops import paths
    sup_nat = _edges_supplier(sf).map_batches(
        lambda df: pd.DataFrame({"node1": df.node2, "label": "in_nation",
                                 "node2": df.node1}),
        batch_format="pandas")
    edges = sup_nat.union(_edges_nation(sf).drop_columns(["n_name"]))
    return paths(edges, ["S1", "S2", "S3"],
                 ["R0", "R1", "R2", "R3", "R4"], max_hops=2)


def _q_paths_distributed(sf: str):
    """Same all-simple-paths as ``paths`` but through the Dataset-state
    frontier (one bucketed_join + one dedup shuffle per hop; driver sees
    only counters) — oracle-checks the scale path."""
    from kgtk_ray.ops import paths
    sup_nat = _edges_supplier(sf).map_batches(
        lambda df: pd.DataFrame({"node1": df.node2, "label": "in_nation",
                                 "node2": df.node1}),
        batch_format="pandas")
    edges = sup_nat.union(_edges_nation(sf).drop_columns(["n_name"]))
    return paths(edges, ["S1", "S2", "S3"],
                 ["R0", "R1", "R2", "R3", "R4"], max_hops=2,
                 distributed=True, num_partitions=4)


def _q_export_neo4j(sf: str):
    from kgtk_ray.io import export_neo4j
    return export_neo4j(_edges_nation(sf).drop_columns(["n_name"]))


def _q_export_entities(sf: str):
    from kgtk_ray.io import export_entities_json
    return export_entities_json(_edges_supplier(sf).drop_columns(["s_name"]))


def _q_lower(sf: str):
    from kgtk_ray.ops import lower_labels, dedup_exact_edges
    lifted = _q_lift(sf)
    _, labels = lower_labels(lifted)
    return dedup_exact_edges(labels)


def _q_implode(sf: str):
    from kgtk_ray.ops import explode_node2, implode_node2
    ex = explode_node2(_part_values(sf))
    out = implode_node2(ex)
    return out.select_columns(["node1", "label", "node2"])


def _q_every_nth(sf: str):
    from kgtk_ray.ops import every_nth
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source", "lang"])
    return every_nth(docs, 10, key="doc_id")


def _q_tail(sf: str):
    from kgtk_ray.ops import tail
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source", "lang"])
    return tail(docs, 100, key="doc_id")


def _q_text_normalize(sf: str):
    from kgtk_ray.text import normalize_text
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return normalize_text(docs).select_columns(["doc_id", "text_norm"])


def _q_text_embedding(sf: str):
    from kgtk_ray.pipelines.embed import text_embedding
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    out = text_embedding(docs, concurrency=(1, 4), batch_size=512)

    def flat(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        v = np.stack([np.asarray(x) for x in df["embedding"]]) \
            .astype(np.float64)
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "e0": v[:, 0].round(6), "e1": v[:, 1].round(6)})

    return out.map_batches(flat, batch_format="pandas")


def _q_import_wikidata(sf: str):
    from kgtk_ray.io import import_wikidata, split_wikidata
    import json as _json
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def to_json(df: pd.DataFrame) -> pd.DataFrame:
        lines = []
        for nk, name, rk in zip(df.n_nationkey, df.n_name, df.n_regionkey):
            lines.append(_json.dumps({
                "id": f"Q{nk}",
                "labels": {"en": {"value": str(name).strip()}},
                "claims": {
                    "P1": [{"id": f"Q{nk}$c1",
                            "mainsnak": {"datavalue": {
                                "type": "wikibase-entityid",
                                "value": {"id": f"R{rk}"}}}}],
                    "P2": [{"mainsnak": {"datavalue": {
                        "type": "quantity",
                        "value": {"amount": f"+{nk}", "unit": "1"}}}}],
                },
            }))
        return pd.DataFrame({"line": lines})

    _, edges, _ = split_wikidata(import_wikidata(n.map_batches(
        to_json, batch_format="pandas")))
    return edges


def _q_unreify_values(sf: str):
    from kgtk_ray.ops import unreify_values
    part = rd.read_parquet(f"{sf}/part.parquet",
                           columns=["p_partkey", "p_size"])

    def reify(df: pd.DataFrame) -> pd.DataFrame:
        v = "V" + df.p_partkey.astype(str)
        return pd.concat([
            pd.DataFrame({"node1": v, "label": "rdf:type",
                          "node2": "wikibase:QuantityValue"}),
            pd.DataFrame({"node1": v, "label": "amount",
                          "node2": df.p_size.astype(str)}),
            pd.DataFrame({"node1": "P" + df.p_partkey.astype(str),
                          "label": "size", "node2": v}),
        ], ignore_index=True)

    return unreify_values(
        part.map_batches(reify, batch_format="pandas"),
        trigger_label="rdf:type", trigger_node2="wikibase:QuantityValue",
        value_label="amount", old_label="size", new_label="size")


def _q_hits(sf: str):
    from kgtk_ray.ops import hits
    return hits(_edges_nation(sf).drop_columns(["n_name"]), iters=5)


# ---- rows-only checks (approximate / not SQL-expressible) ----

def _q_minhash(sf: str):
    from kgtk_ray.dedup import minhash_dedup
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return minhash_dedup(docs, threshold=0.8)


def _q_simhash(sf: str):
    from kgtk_ray.dedup import simhash_dedup
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dedup(docs, max_hamming=3)


def _q_ngram_dedup(sf: str):
    from kgtk_ray.dedup import ngram_jaccard_dedup
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_dedup(docs, n=3, threshold=0.8)


def _q_embedding_dedup(sf: str):
    """The raw embeddings table has no near-dup pairs (max pairwise
    cosine ~0.51), so plant exact duplicates: vectors 0..49 re-appear
    as vec_id+10000.  Identical vectors land in identical LSH buckets
    in every table, so the expected clustering is LSH-independent and
    the oracle is plain SQL."""
    from kgtk_ray.dedup import embedding_dedup
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    dup = emb.map_batches(
        lambda df: df[df.vec_id < 50].assign(
            vec_id=lambda d: d.vec_id + 10000),
        batch_format="pandas")
    return embedding_dedup(emb.union(dup), threshold=0.98)


def _q_ivf_ann(sf: str):
    from kgtk_ray.ann import ivf_topk_cosine
    import pyarrow.parquet as pq
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    qt = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    Q = np.stack(qt.embedding.to_numpy()).astype(np.float64)
    return _round_cols(ivf_topk_cosine(emb, Q, k=10, n_centroids=16, nprobe=4),
                       ["score"])


def _q_ivf_index(sf: str):
    """Partition-pruned IVF (the 100-TB ANN shape): build writes the
    corpus ONCE as bucket-partitioned parquet; search reads only the
    nprobe probed partitions.  Same centroid training (seed/sample) as
    ivf_topk_cosine, so the ivf_ann fixture is the oracle."""
    import tempfile
    from kgtk_ray.ann import IVFIndex
    import pyarrow.parquet as pq
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    qt = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    Q = np.stack(qt.embedding.to_numpy()).astype(np.float64)
    with tempfile.TemporaryDirectory(prefix="ivfidx_") as td:
        idx = IVFIndex.build(emb, td, n_centroids=16)
        out = _round_cols(idx.search(Q, k=10, nprobe=4), ["score"])
        # consume before the tmpdir vanishes
        return out.to_pandas()


def _q_winnowing(sf: str):
    from kgtk_ray.text import winnowing_fingerprints
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return winnowing_fingerprints(docs)


def _q_pagerank(sf: str):
    from kgtk_ray.ops.graph import pagerank
    return pagerank(_edges_nation(sf).drop_columns(["n_name"]), iters=5)


def _q_multimodal(sf: str):
    from kgtk_ray.multimodal import decode_features, synthesize_media
    media = synthesize_media(256)
    out = decode_features(media)
    return out.map_batches(
        lambda df: pd.DataFrame({"media_id": df["media_id"],
                                 "f0": [float(v[0]) for v in df["features"]]}),
        batch_format="pandas")


def _q_frame_sample(sf: str):
    """Frame-sampling fan-out over the seeded media table; digest per
    frame = (ts_ms, byte length, first byte) vs the single-process
    fixture (scripts/make_fixtures.py:ref_frame_sample)."""
    from kgtk_ray.multimodal import sample_frames, synthesize_media
    out = sample_frames(synthesize_media(256), num_frames=4)
    return out.map_batches(
        lambda t: pd.DataFrame({
            "media_id": t["media_id"].to_pandas().astype("int64"),
            "frame_idx": t["frame_idx"].to_pandas().astype("int64"),
            "ts_ms": t["ts_ms"].to_pandas().astype("int64"),
            "n_bytes": [len(b) for b in t["payload"].to_pylist()],
            "b0": [b[0] for b in t["payload"].to_pylist()],
        }).astype({"n_bytes": "int64", "b0": "int64"}),
        batch_format="pyarrow")


def _q_generate_mediawiki(sf: str):
    from kgtk_ray.io import generate_mediawiki_jsons
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        n1 = "N" + df.n_nationkey.astype(str)
        return pd.concat([
            pd.DataFrame({"node1": n1, "label": "in_region",
                          "node2": "R" + df.n_regionkey.astype(str)}),
            pd.DataFrame({"node1": n1, "label": "label",
                          "node2": df.n_name.astype(str).str.strip()}),
            pd.DataFrame({"node1": ["in_region"], "label": ["data_type"],
                          "node2": ["item"]}),
        ], ignore_index=True)

    return generate_mediawiki_jsons(n.map_batches(f, batch_format="pandas"))


def _q_generate_ttl(sf: str):
    """Truthy Turtle stanzas per entity over nation-derived statement
    edges; the single-statement-per-entity case is exactly
    reconstructable in SQL (the goldens pin the general serializer,
    tests/test_ttl_golden.py)."""
    from kgtk_ray.io.rdf import generate_wikidata_ttl
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        nk = df.n_nationkey.astype(str)
        return pd.DataFrame({
            "node1": "Q" + nk,
            "label": "P1",
            "node2": "R" + df.n_regionkey.astype(str),
            "id": "Q" + nk + "-P1-1",
        })

    return generate_wikidata_ttl(n.map_batches(f, batch_format="pandas"),
                                 {"P1": "item"})


def _q_import_conceptnet(sf: str):
    """ConceptNet-shaped assertion rows synthesized from nation; the
    oracle replicates the reference's exact field mapping
    (import_conceptnet.py:36-68)."""
    from kgtk_ray.io.importers import import_conceptnet
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        nk = df.n_nationkey.astype(str)
        rk = df.n_regionkey.astype(str)
        return pd.DataFrame({
            "assertion": "/a/x" + nk,
            "rel": "/r/AtLocation",
            "subj": "/c/en/nation_" + nk,
            "obj": "/c/en/region_" + rk,
            "metadata": '{"surfaceText": "nation ' + nk
                        + ' is in region ' + rk + '"}',
        })

    return import_conceptnet(n.map_batches(f, batch_format="pandas"))


def _q_import_concept_pairs(sf: str):
    """Concept-pair rows synthesized from nation; oracle replicates the
    reference's field mapping (import_concept_pairs.py:40-67: lowercased
    source prefix on node ids, labels strip the 3-char namespace)."""
    from kgtk_ray.io.importers import import_concept_pairs
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        nk = df.n_nationkey.astype(str)
        rk = df.n_regionkey.astype(str)
        return pd.DataFrame({"node1": "wn:nation_" + nk,
                             "node2": "wn:region_" + rk})

    return import_concept_pairs(n.map_batches(f, batch_format="pandas"),
                                source="WN", relation="/r/PartOf")


def _q_import_atomic(sf: str):
    """ATOMIC-shaped rows (event + JSON-list relation columns)
    synthesized from nation; oracle replicates the reference's
    per-row/column/member emission (import_atomic.py:36-120): 'none'
    members skipped, labels lowered/cleaned with the '|' variant join,
    node ids from the first label with spaces as underscores."""
    import json as _json

    from kgtk_ray.io.importers import import_atomic
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        rk = df.n_regionkey.astype(str)
        return pd.DataFrame({
            "event": "PersonX visits region_" + rk + ".",
            "xWant": _json.dumps(["to relax", "none"]),
            "xAttr": [_json.dumps(["curious", f"seen in region_{r}"])
                      for r in rk],
        })

    return import_atomic(n.map_batches(f, batch_format="pandas"))


def _q_import_visualgenome(sf: str):
    """Visual-Genome scene graphs synthesized from nation (one image
    per nation: a nation object with an adjective + verb attribute and
    an IN relationship to its region object); oracle replicates the
    reference's mapping (import_visualgenome.py:40-146)."""
    from kgtk_ray.io.importers import import_visualgenome
    n = rd.read_parquet(f"{sf}/nation.parquet")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for nk, rk in zip(df.n_nationkey.astype(str),
                          df.n_regionkey.astype(str)):
            recs.append({
                "image_id": int(nk),
                "objects": [
                    {"object_id": 1, "names": [f"Nation {nk}."],
                     "synsets": [f"nation_{nk}.n.01"],
                     "attributes": ["large", "moving"]},
                    {"object_id": 2, "names": [f"region {rk}"],
                     "synsets": [f"region_{rk}.n.01"],
                     "attributes": []},
                ],
                "relationships": [
                    {"predicate": "IN", "subject_id": 1, "object_id": 2},
                ],
            })
        return pd.DataFrame({"image_id": [r["image_id"] for r in recs],
                             "objects": [r["objects"] for r in recs],
                             "relationships": [r["relationships"]
                                               for r in recs]})

    scenes = n.map_batches(f, batch_format="pandas")
    return import_visualgenome(
        scenes, {"large": "large.a.01", "moving": "move.v.01"})


def _q_jsonl_roundtrip(sf: str):
    """Lossless jsonl round-trip: nation edges -> write_jsonl ->
    read_kgtk_jsonl; oracle is the original edge synth (the round trip
    must be the identity on KGTK string cells)."""
    import tempfile

    from kgtk_ray.io import read_kgtk_jsonl, write_jsonl
    out = tempfile.mkdtemp(prefix="kgtk_jsonl_rt_")
    write_jsonl(_edges_nation(sf), out)
    return read_kgtk_jsonl(out)


def _q_paths_statistics(sf: str):
    """Reference `paths --statistics-only` output format
    (docs/analysis/paths.md): numbered edge-id path records over the
    supplier->nation->region 2-hop graph."""
    from kgtk_ray.ops import paths_statistics
    sup = rd.read_parquet(f"{sf}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    nat = rd.read_parquet(f"{sf}/nation.parquet",
                          columns=["n_nationkey", "n_regionkey"])
    e1 = sup.map_batches(lambda df: pd.DataFrame({
        "node1": "S" + df.s_suppkey.astype(str), "label": "located_in",
        "node2": "N" + df.s_nationkey.astype(str),
        "id": "LS" + df.s_suppkey.astype(str)}), batch_format="pandas")
    e2 = nat.map_batches(lambda df: pd.DataFrame({
        "node1": "N" + df.n_nationkey.astype(str), "label": "in_region",
        "node2": "R" + df.n_regionkey.astype(str),
        "id": "LN" + df.n_nationkey.astype(str)}), batch_format="pandas")
    sources = [f"S{k}" for k in range(20)]
    targets = [f"R{k}" for k in range(5)]
    return paths_statistics(e1.union(e2), sources, targets, max_hops=2)


def _q_wikidata_jsons(sf: str):
    """Reference-exact generate-mediawiki-jsons (io/mediawiki.py; the
    per-document bytes are pinned against the reference's own goldens
    in tests/test_mediawiki_golden.py) over a nation-derived edge synth
    covering item/time/quantity/string snaks, labels, and a qualifier;
    oracle = sequential single-process replay fixture
    (scripts/make_fixtures.py:ref_wikidata_jsons)."""
    from kgtk_ray.io import generate_wikidata_jsons
    n = rd.read_parquet(f"{sf}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for nk, rk in zip(df.n_nationkey.astype(int),
                          df.n_regionkey.astype(int)):
            q = f"Q{nk}"
            frames.extend([
                (q, "label", f"'nation {nk}'@en", f"{q}-label-1", 6 * nk),
                (q, "P1", f"Q9{rk}", f"{q}-P1-1", 6 * nk + 1),
                (f"{q}-P1-1", "P5", f"order {rk}", f"{q}-P1-1-P5-1",
                 6 * nk + 2),
                (q, "P2", f"^{1900 + nk}-01-01T00:00:00Z/9", f"{q}-P2-1",
                 6 * nk + 3),
                (q, "P3", f"{nk}.5[{nk},{nk + 1}]Q199", f"{q}-P3-1",
                 6 * nk + 4),
                (q, "P4", f"value {nk}", f"{q}-P4-1", 6 * nk + 5),
            ])
        return pd.DataFrame(frames, columns=["node1", "label", "node2",
                                             "id", "ord"])

    edges = n.map_batches(f, batch_format="pandas")
    ptypes = {"P1": "wikibase-item", "P2": "time", "P3": "quantity",
              "P4": "string", "P5": "string"}
    return generate_wikidata_jsons(edges, ptypes, order_col="ord")


def _q_link_embedding(sf: str):
    """north_rule entity linking with BOTH resolution tiers: alias-dict
    hits (doc_id%3==0), embedding-index fuzzy matches (%3==1:
    '<src> network' vs entity name '<src> media network'), and
    passthrough (%3==2).  Oracle = single-process replay fixture
    (scripts/make_fixtures.py:ref_link_embedding)."""
    import pyarrow.parquet as _pq

    from kgtk_ray.pipelines import build_entity_index, link_entities
    src_tbl = _pq.read_table(f"{sf}/documents.parquet", columns=["source"])
    sources = sorted(set(src_tbl["source"].to_pylist()))
    entities = pd.DataFrame({"qid": ["E_" + s for s in sources],
                             "name": [f"{s} media network" for s in sources]})
    index = build_entity_index(entities)
    alias = {f"Source {s}": f"E_{s}" for s in sources}

    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        did = df.doc_id.astype("int64")
        src = df.source.astype(str)
        import numpy as np
        return pd.DataFrame({
            "doc_id": did,
            "mention": np.where(did % 3 == 0, "Source " + src,
                                np.where(did % 3 == 1, src + " network",
                                         "completely unrelated text here")),
        })

    mentions = docs.map_batches(mk, batch_format="pandas")
    out = link_entities(mentions, alias, columns=("mention",),
                        entity_index=index, threshold=0.6)
    return out.map_batches(lambda df: df.rename(
        columns={"mention": "linked"}), batch_format="pandas")


def _q_graph_statistics_edges(sf: str):
    """Reference `graph-statistics --statistics-only` per-vertex edge
    output (docs/analysis/graph_statistics.md) over the nation->region
    graph; pagerank has a closed form on this depth-1 DAG, so the
    oracle computes it exactly in SQL (L1-normalized, 6dp)."""
    from kgtk_ray.ops import graph_statistics_edges
    e = _edges_nation(sf).drop_columns(["n_name"])
    out = graph_statistics_edges(e, iters=4)  # exact after 2 on this depth-1 DAG

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        m = df.label == "vertex_pagerank"
        df.loc[m, "node2"] = df.loc[m, "node2"].astype(float) \
            .map("{:.6f}".format)
        return df

    return out.map_batches(fmt, batch_format="pandas")


def _q_graph_statistics(sf: str):
    from kgtk_ray.ops import graph_statistics
    edges = _edges_nation(sf).drop_columns(["n_name"]).union(
        _edges_supplier(sf).drop_columns(["s_name"]))
    stats = graph_statistics(edges)
    out = pd.DataFrame([{
        "num_edges": stats["num_edges"],
        "num_nodes": stats["num_nodes"],
        "mean_out_degree": round(stats["mean_out_degree"], 6),
        "max_out_degree": stats["max_out_degree"],
    }])
    return out


def _q_column_ops(sf: str):
    from kgtk_ray.ops import remove_columns, rename_columns, reorder_columns
    e = _edges_supplier(sf)
    e = remove_columns(e, ["s_name"])
    e = rename_columns(e, {"node2": "supplier"})
    return reorder_columns(e, ["supplier", "label", "node1"])


def _messy_urls(sf: str, *, page_div: int = 1):
    """Deterministic Common-Crawl-style messy URL table from documents:
    five syntactic variants (default port, uppercase scheme/host,
    tracking params, unsorted params, fragments, trailing slash) over
    seven hosts.  ``page_div > 1`` makes consecutive doc_ids share a
    page so canonical forms collide (the url_dedup case).  Mirrored
    verbatim in the oracle SQL."""
    import numpy as np
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        i = df.doc_id.astype("int64")
        page = (i // page_div).astype(str)
        host = "Site" + (i // page_div % 7).astype(str) + ".ORG"
        v = (i % 5).to_numpy()
        url = np.select(
            [v == 0, v == 1, v == 2, v == 3],
            [("https://" + host + ":443/page/" + page + "/").to_numpy(),
             ("HTTP://" + host + "/page/" + page
              + "?utm_source=feed&b=2&a=1").to_numpy(),
             ("https://www." + host.str.lower() + "/page/" + page
              + "#sec").to_numpy(),
             ("http://" + host + ":80/page/" + page
              + "?z=9&y=8&fbclid=xx").to_numpy()],
            default=("https://" + host + "/page/" + page).to_numpy())
        return pd.DataFrame({"doc_id": df.doc_id, "url": url})

    return docs.map_batches(f, batch_format="pandas")


def _q_url_canon(sf: str):
    """CCNet/RefinedWeb-style URL canonicalization (lowercase
    scheme+host, default ports, fragments, tracking params, param
    sort, trailing slash), hash-verified against an independent SQL
    reimplementation of the same rule."""
    from kgtk_ray.text import canonicalize_urls
    return canonicalize_urls(_messy_urls(sf))


def _q_url_dedup(sf: str):
    """URL-level dedup: five messy variants per page collapse to three
    canonical forms (https with no/empty query; the two http variants
    keep distinct surviving params); min doc_id wins per form."""
    from kgtk_ray.text import dedup_urls
    return dedup_urls(_messy_urls(sf, page_div=5), strip_www=True)


def _q_dsir_scores(sf: str):
    """DSIR importance log-weights (arXiv:2302.03169) of the 90% raw
    slice toward the 10% target slice of documents; golden fixture =
    single-process pandas computation of the same seeded algorithm."""
    from kgtk_ray.text import dsir_scores
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    tgt = docs.map_batches(lambda df: df[df.doc_id % 10 == 0],
                           batch_format="pandas")
    raw = docs.map_batches(lambda df: df[df.doc_id % 10 != 0],
                           batch_format="pandas")
    return _round_cols(dsir_scores(raw, tgt), ["dsir_score"])


def _q_dsir_sample(sf: str):
    """DSIR Gumbel top-k resampling: the 100 most target-like raw
    documents under score + Gumbel(id) noise (deterministic in the
    document id, so reproducible across runs/blocks/cluster sizes)."""
    from kgtk_ray.text import dsir_sample
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    tgt = docs.map_batches(lambda df: df[df.doc_id % 10 == 0],
                           batch_format="pandas")
    raw = docs.map_batches(lambda df: df[df.doc_id % 10 != 0],
                           batch_format="pandas")
    return _round_cols(dsir_sample(raw, tgt, k=100),
                       ["dsir_score", "dsir_key"])


def _clf_slices(sf: str):
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    pos = docs.map_batches(lambda df: df[df.doc_id % 10 == 0],
                           batch_format="pandas")
    neg = docs.map_batches(lambda df: df[df.doc_id % 10 == 5],
                           batch_format="pandas")
    corpus = docs.map_batches(
        lambda df: df[(df.doc_id % 10 != 0) & (df.doc_id % 10 != 5)],
        batch_format="pandas")
    return corpus, pos, neg


def _q_clf_scores(sf: str):
    """GPT-3/CCNet-style quality classifier (hashed bag-of-words
    logistic regression, bounded hash-ordered training sample,
    broadcast weights): score the 80% corpus slice against a 10%
    positive / 10% negative split; golden fixture = single-process
    computation of the same seeded algorithm."""
    from kgtk_ray.text import quality_classifier_scores
    corpus, pos, neg = _clf_slices(sf)
    return _round_cols(quality_classifier_scores(corpus, pos, neg),
                       ["clf_score"])


def _q_clf_filter(sf: str):
    """GPT-3 lottery filtering: keep a document iff u(id) <
    clf_score**2 with u the Knuth-hash uniform of the id —
    deterministic across runs/blocks/cluster sizes."""
    from kgtk_ray.text import classifier_filter
    corpus, pos, neg = _clf_slices(sf)
    return _round_cols(classifier_filter(corpus, pos, neg,
                                         lottery_alpha=2.0),
                       ["clf_score"])


def _q_c4_lines(sf: str):
    """C4 line-level filtering (Raffel et al. 2020 §2.2) over
    deterministic multi-line pages synthesized from documents: kept
    lines end in terminal punctuation with >=5 words and no
    'javascript'; pages with 'lorem ipsum' / '{' or <3 surviving lines
    drop entirely.  The oracle replicates every rule with DuckDB
    list_filter (order-preserving)."""
    from kgtk_ray.text.lines import c4_line_filter
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source", "lang"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        i = df.doc_id.astype("int64").to_numpy()
        sid = df.doc_id.astype(str)
        nl = "\n"
        text = ("Doc " + sid + " from " + df.source + " in " + df.lang
                + " is documented here."
                + nl + "too short."
                + nl + "This long line has no terminal punctuation at the end"
                + np.where(i % 7 == 0, nl + "This javascript line is long "
                           "and would otherwise be kept.", "")
                + np.where(i % 11 == 0, nl + "lorem ipsum dolor sit amet "
                           "consectetur adipiscing elit.", "")
                + np.where(i % 13 == 0, nl + "A template brace { lurks "
                           "in this page body.", "")
                + nl + "Another proper sentence to keep for document "
                + sid + "!"
                + nl + "Is sentence three of document " + sid
                + " surviving now?")
        return pd.DataFrame({"doc_id": df.doc_id, "text": text})

    return c4_line_filter(docs.map_batches(mk, batch_format="pandas"))


def _q_domain_filter(sf: str):
    """Domain blocklist filtering (UT1-blocklist shape): hosts site1/
    site4 dropped via a broadcast set, host column kept for stats."""
    from kgtk_ray.text import filter_domains
    return filter_domains(_messy_urls(sf),
                          blocklist={"site1.org", "site4.org"})


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from kgtk_ray.pipelines import kg_pipeline
    return kg_pipeline("/root/testdata/sf0.001", check_extraction=True)


def queries() -> dict[str, Callable[[str], Any]]:
    # NOTE on ordering: the driver samples the FIRST 50 entries.  The
    # round-5 head is the 50 queries whose last driver row is from the
    # round-3 tree (the round-4 window verified the other 50, recorded
    # in CORRECTNESS_r04.json) — after this final rotation every query
    # has a driver row on round-4-or-later code.  The round-4-verified
    # entries fill the tail; the ones whose kernels were touched in
    # round 5 (langid/quality/token_counts Arrow migration, every_nth,
    # jsonl formats, clf hash salting) are additionally covered by
    # pytest oracle-parity tests against the same DuckDB SQL / fixtures.
    return {
        # --- last driver-verified on the r3 tree; re-verify on r5 ---
        "kg_pipeline": _q_kg_pipeline,
        "column_ops": _q_column_ops,
        "validate_properties": _q_validate_properties,
        "compact": _q_compact,
        "unreify_values": _q_unreify_values,
        "minhash_dedup": _q_minhash,
        "lift": _q_lift,
        "clean_repair": _q_clean_repair,
        "explode": _q_explode,
        "ifexists": _q_ifexists,
        "corpus_curation": _q_corpus_curation,
        "ngram_dedup": _q_ngram_dedup,
        "corpus_stats": _q_corpus_stats,
        "split_dataset": _q_split_dataset,
        "pii_scrub": _q_pii_scrub,
        "semdedup": _q_semdedup,
        "hits": _q_hits,
        "pagerank": _q_pagerank,
        "generate_mediawiki": _q_generate_mediawiki,
        "text_embedding": _q_text_embedding,
        "simhash_dedup": _q_simhash,
        "embedding_dedup": _q_embedding_dedup,
        "ivf_ann": _q_ivf_ann,
        "winnowing": _q_winnowing,
        "multimodal_features": _q_multimodal,
        "reachable_distributed": _q_reachable_distributed,
        "ivf_index": _q_ivf_index,
        "paths_distributed": _q_paths_distributed,
        "frame_sample": _q_frame_sample,
        "dedup_against": _q_dedup_against,
        "repetition": _q_repetition,
        "gopher_filter": _q_gopher_filter,
        "dup_ngrams": _q_dup_ngrams,
        "chunk_text": _q_chunk_text,
        "sample_per_group": _q_sample_per_group,
        "weighted_sample": _q_weighted_sample,
        "decontaminate": _q_decontaminate,
        "lm_score": _q_lm_score,
        "pack_sequences": _q_pack_sequences,
        "dedup_spans": _q_dedup_spans,
        "shard_assign": _q_shard_assign,
        "filter": _q_filter,
        "ifempty": _q_ifempty,
        "ifnotempty": _q_ifnotempty,
        "unique": _q_unique,
        "ifnotexists": _q_ifnotexists,
        "kgtk_join": _q_join,
        "add_id": _q_add_id,
        "calc": _q_calc,
        "topk_cosine": _q_topk_cosine,
        # --- new in round 5 (oracle-checked in pytest; tail slot) ---
        "cskg_dedup": _q_cskg_dedup,
        # --- driver-verified in round 4 (CORRECTNESS_r04: 50/50 green);
        # tail of the final window.  Kernels touched in round 5 carry
        # pytest oracle-parity coverage (see tests/). ---
        "url_canon": _q_url_canon,
        "url_dedup": _q_url_dedup,
        "domain_filter": _q_domain_filter,
        "dsir_scores": _q_dsir_scores,
        "dsir_sample": _q_dsir_sample,
        "c4_lines": _q_c4_lines,
        "clf_scores": _q_clf_scores,
        "clf_filter": _q_clf_filter,
        "import_atomic": _q_import_atomic,
        "import_concept_pairs": _q_import_concept_pairs,
        "import_visualgenome": _q_import_visualgenome,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "sort": _q_sort,
        "dedup_exact": _q_dedup_exact,
        "degrees": _q_degrees,
        "reachable": _q_reachable,
        "connected_components": _q_connected_components,
        "tumbling_window": _q_tumbling,
        "sliding_window": _q_sliding,
        "session_window": _q_sessions,
        "agg_pricing": _q_agg_pricing,
        "langid": _q_langid,
        "quality": _q_quality,
        "token_counts": _q_tokens,
        "scc": _q_scc,
        "import_ntriples": _q_import_ntriples,
        "generate_ntriples": _q_generate_ntriples,
        "unreify_rdf": _q_unreify,
        "paths": _q_paths,
        "export_neo4j": _q_export_neo4j,
        "export_entities": _q_export_entities,
        "lower": _q_lower,
        "implode": _q_implode,
        "fingerprint": _q_fingerprint,
        "tail": _q_tail,
        "text_normalize": _q_text_normalize,
        "import_wikidata": _q_import_wikidata,
        "import_conceptnet": _q_import_conceptnet,
        "generate_ttl": _q_generate_ttl,
        "graph_statistics": _q_graph_statistics,
        "expand": _q_expand,
        "normalize_nodes": _q_normalize_nodes,
        "add_id_num": _q_add_id_num,
        "add_id_prefix": _q_add_id_prefix,
        "wikidata_jsons": _q_wikidata_jsons,
        "link_embedding": _q_link_embedding,
        "paths_statistics": _q_paths_statistics,
        "graph_statistics_edges": _q_graph_statistics_edges,
        "cat": _q_cat,
        "every_nth": _q_every_nth,
    }


# Golden-output parquet fixtures for the non-SQL-expressible queries,
# generated by scripts/make_fixtures.py: a single-process pandas/numpy
# reference implementation of the same seeded algorithms (independent of
# Ray block structure / batch boundaries / task order — exactly what a
# distributed re-implementation can get wrong).  Valid for the driver's
# sf0.01 correctness runs; regenerate with the script if an algorithm
# constant changes.
import os as _os

_FIXDIR = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "kgtk_ray", "_fixtures", "sf001")


def _fixture(name: str) -> str:
    return _os.path.join(_FIXDIR, name).replace("'", "''")


def _url_sql_ctes(page_div: int = 1, strip_www: bool = False) -> str:
    """SQL reimplementation of _messy_urls + the URL canonicalization
    rule (kgtk_ray/text/urls.py) as a CTE chain ending in
    (doc_id, url, url_canon, u, head) — an independent DuckDB oracle
    for the vectorized pandas kernels."""
    from kgtk_ray.text.urls import TRACKING_PARAM_RE
    h2 = ("regexp_replace(regexp_replace(lower(head),"
          " '^(http://[^/?:]*):80$', '\\1'),"
          " '^(https://[^/?:]*):443$', '\\1')")
    if strip_www:
        h2 = f"regexp_replace({h2}, '^([a-z][a-z0-9+.-]*://)www\\.', '\\1')"
    return f"""
        u0 AS (
          SELECT doc_id,
                 'Site' || CAST((doc_id // {page_div}) % 7 AS VARCHAR)
                        || '.ORG' AS host,
                 CAST(doc_id // {page_div} AS VARCHAR) AS page,
                 doc_id % 5 AS v
          FROM documents),
        urls AS (
          SELECT doc_id, CASE v
            WHEN 0 THEN 'https://' || host || ':443/page/' || page || '/'
            WHEN 1 THEN 'HTTP://' || host || '/page/' || page
                        || '?utm_source=feed&b=2&a=1'
            WHEN 2 THEN 'https://www.' || lower(host) || '/page/' || page
                        || '#sec'
            WHEN 3 THEN 'http://' || host || ':80/page/' || page
                        || '?z=9&y=8&fbclid=xx'
            ELSE 'https://' || host || '/page/' || page END AS url
          FROM u0),
        c0 AS (SELECT doc_id, url,
                      regexp_replace(trim(url), '#.*$', '') AS u FROM urls),
        c1 AS (SELECT *, regexp_extract(u,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*') AS head FROM c0),
        c2 AS (SELECT *,
                 CASE WHEN head = '' THEN ''
                      ELSE substr(u, length(head) + 1) END AS rest,
                 {h2} AS h2
               FROM c1),
        c3 AS (SELECT *,
                 regexp_replace(regexp_replace(rest, '\\?.*$', ''),
                                '/$', '') AS path,
                 coalesce(array_to_string(list_sort(list_filter(
                     string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
                     x -> x <> '' AND NOT regexp_matches(x,
                         '{TRACKING_PARAM_RE}'))), '&'), '') AS q
               FROM c2),
        canon AS (
          SELECT doc_id, url, u, head,
                 CASE WHEN head = '' THEN u
                      ELSE h2 || path || CASE WHEN q = '' THEN ''
                                              ELSE '?' || q END
                 END AS url_canon
          FROM c3)
    """


def oracle_sql() -> dict[str, str]:
    stop_cnt = " + ".join(
        f"len(list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x='{w}'))"
        for w in ["the", "a", "and", "of", "to"])
    lang_score = {
        code: " + ".join(
            f"len(list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x='{w}'))"
            for w in words)
        for code, words in [("en", ["the", "and", "of"]),
                            ("de", ["der", "und", "die"]),
                            ("fr", ["le", "et", "les"]),
                            ("es", ["el", "y", "los"]),
                            ("zh", ["de5", "shi4", "le5"])]
    }
    return {
        "kg_pipeline": """
            WITH e AS (
              SELECT 'D'||CAST(doc_id AS VARCHAR) AS node1, 'published_by' AS label,
                     source AS node2, 'https://example.org/doc/'||CAST(doc_id AS VARCHAR) AS url
              FROM documents
              UNION ALL
              SELECT 'D'||CAST(doc_id AS VARCHAR), 'written_in', lang,
                     'https://example.org/doc/'||CAST(doc_id AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'D'||CAST(doc_id AS VARCHAR), 'char_count', CAST(n_chars AS VARCHAR),
                     'https://example.org/doc/'||CAST(doc_id AS VARCHAR)
              FROM documents)
            SELECT node1||'-'||label||'-'||node2 AS id, node1, label, node2, url FROM e
        """,
        "url_canon": f"""
            WITH {_url_sql_ctes()}
            SELECT doc_id, url, url_canon FROM canon
        """,
        "url_dedup": f"""
            WITH {_url_sql_ctes(page_div=5, strip_www=True)}
            SELECT doc_id, url, url_canon FROM canon
            QUALIFY row_number() OVER (PARTITION BY url_canon
                                       ORDER BY doc_id) = 1
        """,
        "c4_lines": """
            WITH pages AS (
              SELECT doc_id,
                'Doc ' || CAST(doc_id AS VARCHAR) || ' from ' || source
                || ' in ' || lang || ' is documented here.'
                || chr(10) || 'too short.'
                || chr(10) || 'This long line has no terminal punctuation at the end'
                || CASE WHEN doc_id % 7 = 0 THEN chr(10)
                     || 'This javascript line is long and would otherwise be kept.'
                     ELSE '' END
                || CASE WHEN doc_id % 11 = 0 THEN chr(10)
                     || 'lorem ipsum dolor sit amet consectetur adipiscing elit.'
                     ELSE '' END
                || CASE WHEN doc_id % 13 = 0 THEN chr(10)
                     || 'A template brace { lurks in this page body.'
                     ELSE '' END
                || chr(10) || 'Another proper sentence to keep for document '
                || CAST(doc_id AS VARCHAR) || '!'
                || chr(10) || 'Is sentence three of document '
                || CAST(doc_id AS VARCHAR) || ' surviving now?' AS text
              FROM documents),
            keep AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)), x ->
                         regexp_matches(x, '[.!?\"]\\s*$')
                         AND len(string_split_regex(trim(x), '\\s+')) >= 5
                         AND NOT regexp_matches(lower(x), '\\bjavascript\\b')
                     ) AS kept
              FROM pages
              WHERE NOT contains(lower(text), 'lorem ipsum')
                AND NOT contains(text, '{'))
            SELECT doc_id, array_to_string(kept, chr(10)) AS text
            FROM keep WHERE len(kept) >= 3
        """,
        "clf_scores": f"""
            SELECT doc_id, n_feats, clf_score
            FROM read_parquet('{_fixture("clf_scores.parquet")}')
        """,
        "clf_filter": f"""
            SELECT doc_id, n_feats, clf_score
            FROM read_parquet('{_fixture("clf_filter.parquet")}')
        """,
        "dsir_scores": f"""
            SELECT doc_id, n_feats, dsir_score
            FROM read_parquet('{_fixture("dsir_scores.parquet")}')
        """,
        "dsir_sample": f"""
            SELECT doc_id, n_feats, dsir_score, dsir_key
            FROM read_parquet('{_fixture("dsir_sample.parquet")}')
        """,
        "domain_filter": f"""
            WITH {_url_sql_ctes()},
            h AS (SELECT doc_id, url,
                    regexp_replace(lower(regexp_extract(trim(url),
                        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?:#]*)', 1)),
                        '^www\\.', '') AS host
                  FROM urls)
            SELECT doc_id, url, host FROM h
            WHERE host NOT IN ('site1.org', 'site4.org')
        """,
        "filter": f"""
            SELECT * FROM ({_EDGE_SQL_LI})
            WHERE node1 IN ('O1','O2','O3','O32','O33')
        """,
        "ifempty": f"SELECT * FROM ({_EDGE_SQL_ORDERS}) WHERE status = ''",
        "ifnotempty": f"SELECT * FROM ({_EDGE_SQL_ORDERS}) WHERE status <> ''",
        "compact": f"""
            SELECT node1, label, node2,
                   string_agg(DISTINCT supp, '|' ORDER BY supp) AS supp
            FROM ({_EDGE_SQL_LI}) GROUP BY node1, label, node2
        """,
        "unique": f"""
            SELECT node1, 'count' AS label, CAST(COUNT(*) AS VARCHAR) AS node2
            FROM ({_EDGE_SQL_LI}) GROUP BY node1
        """,
        "ifexists": f"""
            SELECT * FROM ({_EDGE_SQL_ORDERS}) e
            WHERE EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_acctbal > 5000
                            AND 'C'||CAST(c.c_custkey AS VARCHAR) = e.node1)
        """,
        "ifnotexists": f"""
            SELECT * FROM ({_EDGE_SQL_ORDERS}) e
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_acctbal > 5000
                                AND 'C'||CAST(c.c_custkey AS VARCHAR) = e.node1)
        """,
        "kgtk_join": f"""
            WITH l AS ({_EDGE_SQL_NATION}), r AS ({_EDGE_SQL_SUPP}),
                 k AS (SELECT node1 FROM l INTERSECT SELECT node1 FROM r)
            SELECT node1, label, node2, n_name, '' AS s_name FROM l
              WHERE node1 IN (SELECT node1 FROM k)
            UNION ALL
            SELECT node1, label, node2, '' AS n_name, s_name FROM r
              WHERE node1 IN (SELECT node1 FROM k)
        """,
        "lift": f"""
            WITH lab AS (
              SELECT 'N'||CAST(n_nationkey AS VARCHAR) AS node1,
                     ''''||trim(n_name)||'''@en' AS lbl FROM nation
              UNION ALL
              SELECT 'R'||CAST(r_regionkey AS VARCHAR),
                     ''''||trim(r_name)||'''@en' FROM region)
            SELECT e.node1, e.label, e.node2,
                   COALESCE(l1.lbl, '') AS "node1;label",
                   '' AS "label;label",
                   COALESCE(l2.lbl, '') AS "node2;label"
            FROM (SELECT node1, label, node2 FROM ({_EDGE_SQL_NATION})) e
            LEFT JOIN lab l1 ON l1.node1 = e.node1
            LEFT JOIN lab l2 ON l2.node1 = e.node2
        """,
        "add_id": f"""
            SELECT node1||'-'||label||'-'||node2 AS id, node1, label, node2
            FROM (SELECT node1, label, node2 FROM ({_EDGE_SQL_NATION}))
        """,
        "cskg_dedup": """
            WITH rows AS (
              SELECT 'R'||CAST(n_regionkey AS VARCHAR) AS node1,
                     'has_nation' AS label,
                     trim(n_name)||',common' AS vals
              FROM nation),
            ex AS (SELECT node1, label,
                          unnest(string_split(vals, ',')) AS v
                   FROM rows)
            SELECT node1, label,
                   array_to_string(list_sort(list(DISTINCT v)), ',') AS vals
            FROM ex GROUP BY node1, label
        """,
        "add_id_num": f"""
            SELECT node1||'-'||label||'-'||lpad(CAST(
                     row_number() OVER (PARTITION BY node1, label
                                        ORDER BY node2, supp, ln) - 1
                   AS VARCHAR), 4, '0') AS id,
                   node1, label, node2, supp, ln
            FROM ({_EDGE_SQL_LI})
        """,
        "add_id_prefix": f"""
            SELECT 'E'||lpad(CAST(
                     row_number() OVER (ORDER BY node1, label, node2)
                   AS VARCHAR), 4, '0') AS id,
                   node1, label, node2
            FROM (SELECT node1, label, node2 FROM ({_EDGE_SQL_NATION}))
        """,
        "expand": f"""
            SELECT node1, label, node2, u.q
            FROM (SELECT node1, label, node2,
                         trim(n_name)||'|'||node1 AS lst
                  FROM ({_EDGE_SQL_NATION})) t,
                 UNNEST(string_split(t.lst, '|')) AS u(q)
        """,
        "normalize_nodes": """
            SELECT 'C'||CAST(c_custkey AS VARCHAR) AS node1,
                   'segment' AS label, c_mktsegment AS node2 FROM customer
            UNION ALL
            SELECT 'C'||CAST(c_custkey AS VARCHAR), 'nation',
                   'N'||CAST(c_nationkey AS VARCHAR) FROM customer
        """,
        "explode": """
            SELECT 'P'||CAST(p_partkey AS VARCHAR) AS node1,
                   CASE p_size % 5
                     WHEN 0 THEN CAST(p_size AS VARCHAR)
                     WHEN 1 THEN '"part '||CAST(p_partkey AS VARCHAR)||'"'
                     WHEN 2 THEN CAST(p_size AS VARCHAR)||'m'
                     WHEN 3 THEN '^19'||CAST(p_size % 90 + 10 AS VARCHAR)||'-01-01'
                     ELSE replace(p_brand, ' ', '')
                   END AS node2,
                   CASE p_size % 5
                     WHEN 0 THEN 'number' WHEN 1 THEN 'string'
                     WHEN 2 THEN 'quantity' WHEN 3 THEN 'date_and_times'
                     ELSE 'symbol'
                   END AS "node2;kgtk:data_type",
                   CASE WHEN p_size % 5 IN (0, 2) THEN CAST(p_size AS DOUBLE)
                        ELSE NULL END AS "node2;kgtk:number"
            FROM part
        """,
        "clean_repair": """
            SELECT 'P'||CAST(p_partkey AS VARCHAR) AS node1, 'born' AS label,
                   '^'||CAST(1900 + p_size AS VARCHAR)||'-01-01' AS node2
            FROM part
        """,
        "calc": """
            SELECT 'O'||CAST(l_orderkey AS VARCHAR) AS node1,
                   CAST(l_linenumber AS VARCHAR) AS ln,
                   l_quantity AS v, 50.0 AS t,
                   printf('%5.2f', 100.0 * l_quantity / 50.0) AS result
            FROM lineitem
        """,
        "cat": f"""
            SELECT node1, label, node2, n_name, '' AS s_name
            FROM ({_EDGE_SQL_NATION})
            UNION ALL
            SELECT node1, label, node2, '' AS n_name, s_name
            FROM ({_EDGE_SQL_SUPP})
        """,
        "sort": _EDGE_SQL_NATION,
        "dedup_exact": """
            SELECT * FROM documents
            QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
        """,
        "degrees": f"""
            SELECT node1, 'outdegree' AS label,
                   CAST(COUNT(*) AS VARCHAR) AS node2
            FROM ({_EDGE_SQL_LI}) GROUP BY node1
        """,
        "reachable": f"""
            WITH RECURSIVE e AS (
              SELECT node2 AS node1, node1 AS node2 FROM ({_EDGE_SQL_SUPP})
              UNION ALL
              SELECT node1, node2 FROM ({_EDGE_SQL_NATION})),
            r(root, node) AS (
              SELECT node1, node2 FROM e WHERE node1 IN ('S1','S2','S3')
              UNION
              SELECT r.root, e.node2 FROM r JOIN e ON e.node1 = r.node)
            SELECT root AS node1, 'reachable' AS label, node AS node2 FROM r
        """,
        "reachable_distributed": f"""
            WITH RECURSIVE e AS (
              SELECT node2 AS node1, node1 AS node2 FROM ({_EDGE_SQL_SUPP})
              UNION ALL
              SELECT node1, node2 FROM ({_EDGE_SQL_NATION})),
            r(root, node) AS (
              SELECT node1, node2 FROM e WHERE node1 IN ('S1','S2','S3')
              UNION
              SELECT r.root, e.node2 FROM r JOIN e ON e.node1 = r.node)
            SELECT root AS node1, 'reachable' AS label, node AS node2 FROM r
        """,
        "connected_components": f"""
            WITH e AS ({_EDGE_SQL_NATION}),
                 rep AS (SELECT node2 AS region,
                                LEAST(MIN(node1), node2) AS rep
                         FROM e GROUP BY node2)
            SELECT e.node1 AS node1, 'connected_component' AS label,
                   rep.rep AS node2
            FROM (SELECT DISTINCT node1, node2 FROM e) e
            JOIN rep ON rep.region = e.node2
            UNION
            SELECT region, 'connected_component', rep FROM rep
        """,
        "scc": f"""
            WITH RECURSIVE e AS (
              SELECT node1 AS a, node2 AS b FROM ({_EDGE_SQL_NATION})
              UNION ALL
              SELECT 'S' || CAST(s_suppkey AS VARCHAR),
                     'N' || CAST(s_nationkey AS VARCHAR) FROM supplier
              UNION ALL
              SELECT 'N' || CAST(s_nationkey AS VARCHAR),
                     'S' || CAST(s_suppkey AS VARCHAR)
              FROM supplier WHERE s_suppkey % 3 = 0
            ),
            nodes AS (SELECT a AS v FROM e UNION SELECT b FROM e),
            mut AS (
              SELECT DISTINCT e1.a, e1.b FROM e e1
              JOIN e e2 ON e1.a = e2.b AND e1.b = e2.a
            ),
            reach(a, b) AS (
              SELECT v, v FROM nodes
              UNION
              SELECT r.a, m.b FROM reach r JOIN mut m ON r.b = m.a
            )
            SELECT a AS node1, 'connected_component' AS label,
                   MIN(b) AS node2
            FROM reach GROUP BY a
        """,
        "tumbling_window": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n,
                   round(SUM(value), 4) AS total,
                   round(MIN(value), 4) AS vmin,
                   round(MAX(value), 4) AS vmax
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "sliding_window": """
            WITH e AS (
              SELECT user_id, value,
                     time_bucket(INTERVAL 1800 SECOND, ts)
                       - j * INTERVAL 1800 SECOND AS window_start
              FROM events CROSS JOIN (SELECT unnest([0, 1]) AS j))
            SELECT user_id, window_start,
                   COUNT(*) AS n,
                   round(SUM(value), 4) AS total,
                   round(MIN(value), 4) AS vmin,
                   round(MAX(value), 4) AS vmax
            FROM e GROUP BY user_id, window_start
        """,
        "session_window": """
            WITH x AS (
              SELECT user_id, ts,
                     CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               IS NULL
                          OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL 1800 SECOND
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            y AS (SELECT user_id, ts,
                         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
                  FROM x)
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM y GROUP BY user_id, sid
        """,
        "agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(SUM(l_quantity), 4) AS sum_qty,
                   round(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue,
                   round(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "repetition": r"""
            -- empty-token filter: string_split_regex('') yields ['']
            -- (one empty token); the spec (Python str.split / the Arrow
            -- kernel) counts an empty/whitespace-only document as ZERO
            -- tokens, with dup=1-0/max(n,1)=1, top=0, mwl=0
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), b AS (
              SELECT *, list_transform(
                          list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                          s -> s[1] || ' ' || s[2]) AS bigrams
              FROM t
            )
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   ROUND(1.0 - len(list_distinct(toks))*1.0
                         / GREATEST(len(toks), 1), 6) AS dup_word_frac,
                   ROUND(coalesce(list_max(list_transform(list_distinct(toks),
                           w -> len(list_filter(toks, x -> x = w)))), 0)
                         *1.0/GREATEST(len(toks), 1), 6) AS top_word_frac,
                   CASE WHEN len(bigrams) > 0 THEN
                     ROUND(list_max(list_transform(list_distinct(bigrams),
                             g -> len(list_filter(bigrams, x -> x = g))))
                           *1.0/len(bigrams), 6) END AS top_bigram_frac,
                   ROUND(len(regexp_replace(text, '\s', '', 'g'))
                         *1.0/GREATEST(len(toks), 1), 6) AS mean_word_len
            FROM b
        """,
        "gopher_filter": r"""
            WITH t AS (
              SELECT doc_id, text,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents
            ), m AS (
              SELECT doc_id, text, len(toks) AS n,
                     1.0 - len(list_distinct(toks))*1.0/len(toks) AS dupf,
                     list_max(list_transform(list_distinct(toks),
                       w -> len(list_filter(toks, x -> x = w))))
                       *1.0/len(toks) AS topf,
                     len(regexp_replace(text, '\s', '', 'g'))
                       *1.0/len(toks) AS mwl
              FROM t
            )
            SELECT doc_id, text FROM m
            WHERE n BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
              AND dupf <= 0.55 AND topf <= 0.13
        """,
        "dup_ngrams": r"""
            -- list_filter drops the [''] artifact of splitting an
            -- empty document (the operator counts zero tokens there)
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, unnest(list_transform(
                       list_zip(toks[1:len(toks)-2], toks[2:len(toks)-1],
                                toks[3:len(toks)]),
                       s -> s[1]||' '||s[2]||' '||s[3])) AS gram
              FROM t
            ), cnt AS (
              SELECT gram, count(DISTINCT doc_id) AS ndocs
              FROM g GROUP BY gram
            )
            SELECT g.doc_id, count(*) AS n_grams,
                   ROUND(sum(CASE WHEN cnt.ndocs >= 2 THEN 1 ELSE 0 END)
                         *1.0/count(*), 6) AS dup_gram_frac
            FROM g JOIN cnt USING (gram) GROUP BY g.doc_id
        """,
        "dedup_spans": r"""
            WITH w0 AS (
              SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws,1) AS i
              FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                    FROM documents)
            ), w AS (
              -- drop the [''] artifact of splitting an empty document
              -- (the operator spec: no tokens -> the document is
              -- dropped; trimmed non-empty text never yields empties)
              SELECT * FROM w0 WHERE word <> ''
            ), sp AS (
              SELECT doc_id, (i-1)//3 AS span_idx,
                     string_agg(word, ' ' ORDER BY i) AS span_text
              FROM w GROUP BY doc_id, (i-1)//3
            ), keep AS (
              SELECT doc_id, span_idx, span_text,
                     row_number() OVER (PARTITION BY span_text
                                        ORDER BY doc_id, span_idx) AS rn
              FROM sp
            )
            SELECT doc_id, string_agg(span_text, ' ' ORDER BY span_idx) AS text
            FROM keep WHERE rn = 1 GROUP BY doc_id
        """,
        "corpus_stats": r"""
            SELECT source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS total,
                   ROUND(avg(n_chars), 6) AS mean,
                   min(n_chars) AS vmin, max(n_chars) AS vmax,
                   quantile_disc(n_chars, 0.5) AS p50,
                   quantile_disc(n_chars, 0.9) AS p90
            FROM documents GROUP BY source
        """,
        "pii_scrub": r"""
            WITH a AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@mail.example.com or +1 555 01'
                       || CAST(doc_id % 89 AS VARCHAR) || ' from 10.'
                       || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                       || CAST(doc_id % 250 AS VARCHAR) || ' ssn '
                       || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
                       || CAST(doc_id % 90 + 10 AS VARCHAR) || '-'
                       || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS text
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                     '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                     '\+\d[\d()\- ]{6,}\d', '<PHONE>', 'g') AS text
            FROM a
        """,
        "lm_score": r"""
            -- empty tokens filtered on both sides (string_split_regex
            -- of an empty document yields ['']); a token-less
            -- reference corpus defines no model, so no scores
            WITH ref AS (
              SELECT unnest(list_filter(
                       string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS tok
              FROM documents WHERE doc_id % 10 = 0
            ), cnt AS (
              SELECT tok, count(*) AS c FROM ref GROUP BY tok
            ), stats AS (
              SELECT (SELECT count(*) FROM ref) AS n,
                     (SELECT count(*) FROM cnt) AS v
            ), toks AS (
              SELECT doc_id,
                     unnest(list_filter(
                       string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS tok
              FROM documents WHERE doc_id % 10 != 0
            )
            SELECT t.doc_id, count(*) AS n_tokens,
                   ROUND(avg(ln((coalesce(c.c, 0) + 0.5)
                                / (s.n + 0.5 * s.v))), 6) AS lm_score
            FROM toks t LEFT JOIN cnt c USING (tok), stats s
            WHERE s.v > 0
            GROUP BY t.doc_id
        """,
        "decontaminate": r"""
            WITH t AS (
              SELECT doc_id, text,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, unnest(list_transform(
                       list_zip(toks[1:len(toks)-3], toks[2:len(toks)-2],
                                toks[3:len(toks)-1], toks[4:len(toks)]),
                       s -> s[1]||' '||s[2]||' '||s[3]||' '||s[4])) AS gram
              FROM t
            ), ev AS (
              SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0
            ), hit AS (
              SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram)
              WHERE g.doc_id % 50 != 0
            )
            SELECT doc_id, text FROM t
            WHERE doc_id % 50 != 0
              AND doc_id NOT IN (SELECT doc_id FROM hit)
        """,
        "semdedup": """
            SELECT vec_id, TRUE AS keep FROM embeddings
            UNION ALL
            SELECT vec_id + 10000, FALSE FROM embeddings WHERE vec_id < 50
        """,
        "pack_sequences": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     len(regexp_extract_all(text,
                         '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS n_tokens,
                     ((doc_id*2654435761)%4294967296)%16 AS bin,
                     row_number() OVER (
                       PARTITION BY ((doc_id*2654435761)%4294967296)%16
                       ORDER BY doc_id) AS rn
              FROM documents
            ), packed AS (
              SELECT doc_id, n_tokens, bin, rn,
                     CAST(0 AS BIGINT) AS seq, n_tokens AS acc
              FROM toks WHERE rn = 1
              UNION ALL
              SELECT t.doc_id, t.n_tokens, t.bin, t.rn,
                     CASE WHEN p.acc > 0 AND p.acc + t.n_tokens > 512
                          THEN p.seq + 1 ELSE p.seq END,
                     CASE WHEN p.acc > 0 AND p.acc + t.n_tokens > 512
                          THEN t.n_tokens ELSE p.acc + t.n_tokens END
              FROM packed p JOIN toks t ON t.bin = p.bin AND t.rn = p.rn + 1
            )
            SELECT doc_id, n_tokens, bin, seq FROM packed
        """,
        "dedup_against": f"""
            SELECT * FROM read_parquet('{_fixture("dedup_against.parquet")}')
        """,
        "chunk_text": """
            WITH n AS (
              SELECT doc_id, text,
                     CASE WHEN len(text) > 0
                          THEN (len(text)-1)//96 + 1 ELSE 0 END AS nc
              FROM documents
            ), e AS (
              SELECT doc_id, text, unnest(range(nc)) AS chunk_id FROM n
            )
            SELECT doc_id, chunk_id,
                   substr(text, CAST(chunk_id*96 AS INT) + 1, 128) AS chunk
            FROM e
        """,
        "sample_per_group": """
            SELECT doc_id, source FROM documents
            QUALIFY row_number() OVER (PARTITION BY source
              ORDER BY (doc_id*2654435761)%4294967296, doc_id) <= 10
        """,
        "weighted_sample": """
            SELECT doc_id, source FROM documents
            WHERE ((doc_id*2654435761)%4294967296) % 10000 <
              CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                          WHEN 'src2' THEN 2500 ELSE 1000 END
        """,
        "corpus_curation": r"""
            WITH t AS (
              SELECT doc_id, text,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents
            ), m AS (
              SELECT doc_id, text, len(toks) AS n,
                     1.0 - len(list_distinct(toks))*1.0/len(toks) AS dupf,
                     list_max(list_transform(list_distinct(toks),
                       w -> len(list_filter(toks, x -> x = w))))
                       *1.0/len(toks) AS topf,
                     len(regexp_replace(text, '\s', '', 'g'))
                       *1.0/len(toks) AS mwl
              FROM t
            ), f AS (
              SELECT doc_id, text FROM m
              WHERE n BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
                AND dupf <= 0.55 AND topf <= 0.13
            ), s AS (
              SELECT doc_id,
                     regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                       '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                       '\+\d[\d()\- ]{6,}\d', '<PHONE>', 'g') AS text
              FROM f
            ), w AS (
              SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws,1) AS i
              FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                    FROM s)
            ), sp AS (
              SELECT doc_id, (i-1)//3 AS span_idx,
                     string_agg(word, ' ' ORDER BY i) AS span_text
              FROM w GROUP BY doc_id, (i-1)//3
            ), keep AS (
              SELECT doc_id, span_idx, span_text,
                     row_number() OVER (PARTITION BY span_text
                                        ORDER BY doc_id, span_idx) AS rn
              FROM sp
            ), red AS (
              SELECT doc_id,
                     string_agg(span_text, ' ' ORDER BY span_idx) AS text
              FROM keep WHERE rn = 1 GROUP BY doc_id
            )
            SELECT doc_id, text,
                   CASE WHEN ((doc_id*2654435761)%4294967296)%10000 < 8000
                        THEN 'train'
                        WHEN ((doc_id*2654435761)%4294967296)%10000 < 9000
                        THEN 'valid'
                        ELSE 'test' END AS split
            FROM red
        """,
        "shard_assign": """
            SELECT doc_id, source,
                   CAST(((doc_id*2654435761)%4294967296)%8 AS BIGINT) AS shard,
                   CAST(row_number() OVER (
                     PARTITION BY ((doc_id*2654435761)%4294967296)%8
                     ORDER BY (doc_id*2654435761)%4294967296, doc_id) - 1
                     AS BIGINT) AS pos
            FROM documents
        """,
        "split_dataset": """
            SELECT doc_id, source,
                   CASE WHEN ((doc_id*2654435761)%4294967296)%10000 < 8000
                        THEN 'train'
                        WHEN ((doc_id*2654435761)%4294967296)%10000 < 9000
                        THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "langid": f"""
            SELECT doc_id,
                   CASE
                     WHEN GREATEST({lang_score['en']}, {lang_score['de']},
                                   {lang_score['fr']}, {lang_score['es']},
                                   {lang_score['zh']}) = 0 THEN 'und'
                     WHEN {lang_score['en']} >= GREATEST({lang_score['de']},
                          {lang_score['fr']}, {lang_score['es']},
                          {lang_score['zh']}) THEN 'en'
                     WHEN {lang_score['de']} >= GREATEST({lang_score['fr']},
                          {lang_score['es']}, {lang_score['zh']}) THEN 'de'
                     WHEN {lang_score['fr']} >= GREATEST({lang_score['es']},
                          {lang_score['zh']}) THEN 'fr'
                     WHEN {lang_score['es']} >= {lang_score['zh']} THEN 'es'
                     ELSE 'zh'
                   END AS lang_pred
            FROM documents
        """,
        "quality": f"""
            WITH m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '\\S+')) AS n_tokens,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                     {stop_cnt} AS n_stop
              FROM documents)
            SELECT doc_id, n_tokens,
                   round(CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1), 6)
                     AS punct_ratio,
                   round(CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1), 6)
                     AS stop_ratio,
                   round(
                     LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                     + GREATEST(LEAST(1.0 - 5.0 * CAST(n_punct AS DOUBLE)
                                      / GREATEST(n_chars, 1), 1.0), 0.0) * 0.3
                     + LEAST(5.0 * CAST(n_stop AS DOUBLE)
                             / GREATEST(n_tokens, 1), 1.0) * 0.3, 6) AS quality
            FROM m
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+')) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS bpe_tokens
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))
                     AS fingerprint
            FROM documents
        """,
        "import_ntriples": """
            SELECT 'ex:N'||CAST(n_nationkey AS VARCHAR) AS node1,
                   'ex:in_region' AS label,
                   'ex:R'||CAST(n_regionkey AS VARCHAR) AS node2 FROM nation
            UNION ALL
            SELECT 'ex:N'||CAST(n_nationkey AS VARCHAR), 'ex:name',
                   '"'||trim(n_name)||'"' FROM nation
        """,
        "generate_ntriples": """
            SELECT '<http://example.org/N'||CAST(n_nationkey AS VARCHAR)
                   ||'> <http://example.org/in_region> <http://example.org/R'
                   ||CAST(n_regionkey AS VARCHAR)||'> .' AS line
            FROM nation
        """,
        "wikidata_jsons": f"""
            SELECT qnode, doc
            FROM read_parquet('{_fixture("wikidata_jsons.parquet")}')
        """,
        "link_embedding": f"""
            SELECT doc_id, linked
            FROM read_parquet('{_fixture("link_embedding.parquet")}')
        """,
        "graph_statistics_edges": """
            WITH e AS (
              SELECT 'N'||CAST(n_nationkey AS VARCHAR) AS node1,
                     'R'||CAST(n_regionkey AS VARCHAR) AS node2
              FROM nation),
            nodes AS (SELECT node1 AS node FROM e
                      UNION SELECT node2 FROM e),
            ind AS (SELECT node2 AS node, COUNT(*) AS c FROM e GROUP BY 1),
            outd AS (SELECT node1 AS node, COUNT(*) AS c FROM e GROUP BY 1),
            params AS (SELECT (SELECT COUNT(*) FROM nodes) AS n,
                              (SELECT COUNT(*) FROM e) AS m),
            stats AS (
              SELECT nd.node,
                     COALESCE(i.c, 0) AS ind_c,
                     COALESCE(o.c, 0) AS outd_c,
                     -- closed-form pagerank on this depth-1 DAG
                     -- (every in-edge source is a pure source with
                     -- out-degree 1), L1-normalized:
                     (1.0 + 0.85 * COALESCE(i.c, 0))
                       / ((SELECT n FROM params)
                          + 0.85 * (SELECT m FROM params)) AS pr,
                     ROW_NUMBER() OVER (ORDER BY nd.node) - 1 AS vi
              FROM nodes nd
              LEFT JOIN ind i ON i.node = nd.node
              LEFT JOIN outd o ON o.node = nd.node)
            SELECT node AS node1, 'vertex_in_degree' AS label,
                   CAST(ind_c AS VARCHAR) AS node2,
                   node||'-vertex_in_degree-'||CAST(3*vi AS VARCHAR) AS id
            FROM stats
            UNION ALL
            SELECT node, 'vertex_out_degree', CAST(outd_c AS VARCHAR),
                   node||'-vertex_out_degree-'||CAST(3*vi+1 AS VARCHAR)
            FROM stats
            UNION ALL
            SELECT node, 'vertex_pagerank', printf('%.6f', pr),
                   node||'-vertex_pagerank-'||CAST(3*vi+2 AS VARCHAR)
            FROM stats
        """,
        "paths_statistics": """
            WITH p AS (
              SELECT 'LS'||CAST(s_suppkey AS VARCHAR) AS e0,
                     'LN'||CAST(s_nationkey AS VARCHAR) AS e1
              FROM supplier WHERE s_suppkey < 20),
            ordered AS (
              SELECT e0, e1,
                     ROW_NUMBER() OVER (ORDER BY e0, e1) - 1 AS i FROM p)
            SELECT 'p'||CAST(i AS VARCHAR) AS node1, '0' AS label,
                   e0 AS node2,
                   'p'||CAST(i AS VARCHAR)||'-0-'||CAST(2*i AS VARCHAR)
                     AS id
            FROM ordered
            UNION ALL
            SELECT 'p'||CAST(i AS VARCHAR), '1', e1,
                   'p'||CAST(i AS VARCHAR)||'-1-'||CAST(2*i+1 AS VARCHAR)
            FROM ordered
        """,
        "unreify_rdf": """
            SELECT 'C'||CAST(o_custkey AS VARCHAR) AS node1,
                   'placed' AS label,
                   'O'||CAST(o_orderkey AS VARCHAR) AS node2,
                   'ST'||CAST(o_orderkey AS VARCHAR) AS id
            FROM orders
            UNION ALL
            SELECT 'ST'||CAST(o_orderkey AS VARCHAR), 'status',
                   o_orderstatus,
                   'ST'||CAST(o_orderkey AS VARCHAR)||'-1' FROM orders
        """,
        "validate_properties": f"""
            WITH e AS (
              SELECT node1, label, node2
              FROM ({_EDGE_SQL_NATION})
              UNION ALL
              SELECT node1, label, node2 FROM ({_EDGE_SQL_SUPP})
              UNION ALL
              SELECT 'P'||CAST(p_partkey AS VARCHAR), 'size',
                     CAST(p_size AS VARCHAR) FROM part
              UNION ALL
              SELECT 'S'||CAST(s_suppkey AS VARCHAR), 'located_in',
                     'N'||CAST(s_nationkey AS VARCHAR) FROM supplier),
            cnt AS (SELECT node1, COUNT(*) AS c FROM e
                    WHERE label = 'has_supplier' GROUP BY node1),
            valid_region AS (
              SELECT node1 FROM e
              WHERE label = 'in_region'
                AND regexp_full_match(node1, 'N\\d+')
                AND regexp_full_match(node2, 'R[0-3]'))
            SELECT node1, label, node2 FROM e
            WHERE (label = 'in_region' AND node1 IN
                     (SELECT node1 FROM valid_region))
               OR (label = 'has_supplier'
                   AND node1 IN (SELECT node1 FROM cnt WHERE c <= 3))
               OR (label = 'size'
                   AND CAST(node2 AS DOUBLE) BETWEEN 10 AND 40)
               OR (label = 'located_in'
                   AND node2 IN (SELECT node1 FROM valid_region))
        """,
        "paths": """
            SELECT 'S'||CAST(s_suppkey AS VARCHAR) AS node1,
                   'path' AS label,
                   'R'||CAST(n_regionkey AS VARCHAR) AS node2,
                   'S'||CAST(s_suppkey AS VARCHAR)
                     ||'->N'||CAST(s_nationkey AS VARCHAR)
                     ||'->R'||CAST(n_regionkey AS VARCHAR) AS path,
                   CAST(2 AS BIGINT) AS hops
            FROM supplier JOIN nation ON n_nationkey = s_nationkey
            WHERE s_suppkey IN (1, 2, 3)
        """,
        "paths_distributed": """
            SELECT 'S'||CAST(s_suppkey AS VARCHAR) AS node1,
                   'path' AS label,
                   'R'||CAST(n_regionkey AS VARCHAR) AS node2,
                   'S'||CAST(s_suppkey AS VARCHAR)
                     ||'->N'||CAST(s_nationkey AS VARCHAR)
                     ||'->R'||CAST(n_regionkey AS VARCHAR) AS path,
                   CAST(2 AS BIGINT) AS hops
            FROM supplier JOIN nation ON n_nationkey = s_nationkey
            WHERE s_suppkey IN (1, 2, 3)
        """,
        "export_neo4j": f"""
            SELECT 'MATCH (a:Node {{id: '''||node1||'''}}), (b:Node {{id: '''
                   ||node2||'''}}) CREATE (a)-[:'
                   ||upper(regexp_replace(label, '[^A-Za-z0-9_]', '_', 'g'))
                   ||']->(b);' AS cypher
            FROM (SELECT node1, label, node2 FROM ({_EDGE_SQL_NATION}))
        """,
        "export_entities": f"""
            SELECT node1 AS qnode,
                   '{{"claims": {{"has_supplier": ["'
                   || string_agg(node2, '", "' ORDER BY node2)
                   || '"]}}, "id": "'||node1||'"}}' AS doc
            FROM ({_EDGE_SQL_SUPP}) GROUP BY node1
        """,
        "lower": """
            SELECT 'N'||CAST(n_nationkey AS VARCHAR) AS node1,
                   'label' AS label,
                   ''''||trim(n_name)||'''@en' AS node2 FROM nation
            UNION ALL
            SELECT DISTINCT 'R'||CAST(r_regionkey AS VARCHAR), 'label',
                   ''''||trim(r_name)||'''@en'
            FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nation)
        """,
        "implode": """
            SELECT 'P'||CAST(p_partkey AS VARCHAR) AS node1,
                   'value' AS label,
                   CASE p_size % 5
                     WHEN 0 THEN CAST(p_size AS VARCHAR)
                     WHEN 1 THEN '"part '||CAST(p_partkey AS VARCHAR)||'"'
                     WHEN 2 THEN CAST(p_size AS VARCHAR)||'m'
                     WHEN 3 THEN '^19'||CAST(p_size % 90 + 10 AS VARCHAR)||'-01-01'
                     ELSE replace(p_brand, ' ', '')
                   END AS node2
            FROM part
        """,
        "every_nth": """
            SELECT doc_id, source, lang FROM documents WHERE doc_id % 10 = 0
        """,
        "tail": """
            SELECT doc_id, source, lang FROM documents
            ORDER BY doc_id DESC LIMIT 100
        """,
        "text_normalize": """
            SELECT doc_id,
                   lower(trim(regexp_replace(
                     regexp_replace(text,
                       '[!"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', ' ', 'g'),
                     '\\s+', ' ', 'g'))) AS text_norm
            FROM documents
        """,
        "import_wikidata": """
            SELECT 'Q'||CAST(n_nationkey AS VARCHAR)||'-c1' AS id,
                   'Q'||CAST(n_nationkey AS VARCHAR) AS node1,
                   'P1' AS label,
                   'R'||CAST(n_regionkey AS VARCHAR) AS node2 FROM nation
            UNION ALL
            SELECT 'Q'||CAST(n_nationkey AS VARCHAR)||'-P2-'
                     ||CAST(n_nationkey AS VARCHAR),
                   'Q'||CAST(n_nationkey AS VARCHAR), 'P2',
                   CAST(n_nationkey AS VARCHAR) FROM nation
        """,
        "unreify_values": """
            SELECT 'P'||CAST(p_partkey AS VARCHAR) AS node1,
                   'size' AS label, CAST(p_size AS VARCHAR) AS node2,
                   'V'||CAST(p_partkey AS VARCHAR) AS id
            FROM part
        """,
        "topk_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
                       WHERE vec_id < 5),
                 s AS (SELECT q.query_id, e.vec_id,
                              list_cosine_similarity(
                                CAST(q.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS score
                       FROM q CROSS JOIN embeddings e)
            SELECT query_id, vec_id, round(score, 6) AS score FROM s
            QUALIFY row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id) <= 10
        """,
        "graph_statistics": f"""
            WITH e AS ({_EDGE_SQL_NATION} UNION ALL {_EDGE_SQL_SUPP}),
                 deg AS (SELECT node1, count(*) AS d FROM e GROUP BY node1),
                 n AS (SELECT node1 AS v FROM e UNION SELECT node2 FROM e)
            SELECT (SELECT count(*) FROM e) AS num_edges,
                   (SELECT count(*) FROM n) AS num_nodes,
                   round((SELECT avg(d) FROM deg), 6) AS mean_out_degree,
                   (SELECT max(d) FROM deg) AS max_out_degree
        """,
        "column_ops": f"""
            SELECT node2 AS supplier, label, node1
            FROM ({_EDGE_SQL_SUPP})
        """,
        # The nation edge graph is bipartite (nations -> regions) and
        # nations have no in-edges, so 5 rounds of power iteration have
        # an exact closed form: nation rank settles at (1-d)/n after
        # round 1 and each region at base*(1+d*c) where c is its
        # in-degree.  Matches kgtk_ray.ops.graph.pagerank to 1e-15
        # relative, far inside the %.10f formatting.
        "pagerank": f"""
            WITH e AS (SELECT node1, node2 FROM ({_EDGE_SQL_NATION})),
                 n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM
                       (SELECT node1 AS v FROM e UNION SELECT node2 FROM e)),
                 c AS (SELECT node2 AS r, CAST(COUNT(*) AS DOUBLE) AS c
                       FROM e GROUP BY node2)
            SELECT node1, 'pagerank' AS label,
                   printf('%.10f', 0.15 / n.cnt) AS node2
            FROM (SELECT DISTINCT node1 FROM e), n
            UNION ALL
            SELECT c.r, 'pagerank',
                   printf('%.10f', (0.15 / n.cnt) * (1 + 0.85 * c.c))
            FROM c, n
        """,
        # Same bipartite structure: after t HITS rounds the normalized
        # scores reduce to auth_j = c_j^t / sqrt(sum c^2t) on regions
        # (0 on nations) and hub_i = c_{region(i)}^t / sqrt(sum c^(2t+1))
        # on nations (0 on regions); t=5 here.
        "hits": f"""
            WITH e AS (SELECT node1, node2 FROM ({_EDGE_SQL_NATION})),
                 c AS (SELECT node2 AS r, CAST(COUNT(*) AS DOUBLE) AS c
                       FROM e GROUP BY node2),
                 norms AS (SELECT sqrt(SUM(pow(c, 10))) AS na,
                                  sqrt(SUM(pow(c, 11))) AS nh FROM c)
            SELECT e.node1 AS node1, 'hub' AS label,
                   printf('%.10f', pow(c.c, 5) / norms.nh) AS node2
            FROM e JOIN c ON c.r = e.node2, norms
            UNION ALL
            SELECT c.r, 'hub', printf('%.10f', 0.0) FROM c
            UNION ALL
            SELECT c.r, 'authority', printf('%.10f', pow(c.c, 5) / norms.na)
            FROM c, norms
            UNION ALL
            SELECT e.node1, 'authority', printf('%.10f', 0.0) FROM e
        """,
        "generate_ttl": """
            SELECT 'Q'||CAST(n_nationkey AS VARCHAR) AS entity,
                   'wd:Q'||CAST(n_nationkey AS VARCHAR)
                   ||' a wikibase:Item ;'||chr(10)
                   ||'    p:P1 wds:Q'||CAST(n_nationkey AS VARCHAR)
                   ||'-Q'||CAST(n_nationkey AS VARCHAR)||'-P1-1 ;'||chr(10)
                   ||'    wdt:P1 wd:R'||CAST(n_regionkey AS VARCHAR)
                   ||' .'||chr(10)||chr(10)
                   ||'wds:Q'||CAST(n_nationkey AS VARCHAR)
                   ||'-Q'||CAST(n_nationkey AS VARCHAR)
                   ||'-P1-1 a wikibase:Statement ;'||chr(10)
                   ||'    wikibase:rank wikibase:BestRank ;'||chr(10)
                   ||'    <http://www.isi.edu/etk/createdBy> '
                   ||'<http://www.isi.edu/datamart> ;'||chr(10)
                   ||'    ps:P1 wd:R'||CAST(n_regionkey AS VARCHAR)
                   ||' .'||chr(10)||chr(10)
                   ||'wd:R'||CAST(n_regionkey AS VARCHAR)
                   ||' a wikibase:Item .'||chr(10) AS ttl
            FROM nation
        """,
        "import_conceptnet": """
            SELECT '/c/en/nation_'||CAST(n_nationkey AS VARCHAR) AS node1,
                   '/r/AtLocation' AS relation,
                   '/c/en/region_'||CAST(n_regionkey AS VARCHAR) AS node2,
                   '"nation '||CAST(n_nationkey AS VARCHAR)||'"'
                     AS "node1;label",
                   '"region '||CAST(n_regionkey AS VARCHAR)||'"'
                     AS "node2;label",
                   '"at location"' AS "relation;label",
                   '' AS "relation;dimension",
                   '"CN"' AS source,
                   '"nation '||CAST(n_nationkey AS VARCHAR)
                     ||' is in region '||CAST(n_regionkey AS VARCHAR)||'"'
                     AS sentence
            FROM nation
        """,
        "import_concept_pairs": """
            SELECT 'wn:wn:nation_'||CAST(n_nationkey AS VARCHAR) AS node1,
                   '/r/PartOf' AS relation,
                   'wn:wn:region_'||CAST(n_regionkey AS VARCHAR) AS node2,
                   '"nation_'||CAST(n_nationkey AS VARCHAR)||'"'
                     AS "node1;label",
                   '"region_'||CAST(n_regionkey AS VARCHAR)||'"'
                     AS "node2;label",
                   '"part of"' AS "relation;label",
                   '' AS "relation;dimension",
                   '"WN"' AS source,
                   '' AS sentence
            FROM nation
        """,
        "import_atomic": """
            WITH base AS (
              SELECT CAST(n_regionkey AS VARCHAR) AS rk,
                     'at:personx_visits_region_'
                       ||CAST(n_regionkey AS VARCHAR) AS node1,
                     '"personx visits region_'||CAST(n_regionkey AS VARCHAR)
                       ||'"|"visits region_'||CAST(n_regionkey AS VARCHAR)
                       ||'"' AS n1l
              FROM nation)
            SELECT node1, 'at:xAttr' AS relation, 'at:curious' AS node2,
                   n1l AS "node1;label", '"curious"' AS "node2;label",
                   '"person x has attribute"' AS "relation;label",
                   '' AS "relation;dimension", '"AT"' AS source,
                   '' AS sentence
            FROM base
            UNION ALL
            SELECT node1, 'at:xAttr', 'at:seen_in_region_'||rk, n1l,
                   '"seen in region_'||rk||'"', '"person x has attribute"',
                   '', '"AT"', ''
            FROM base
            UNION ALL
            SELECT node1, 'at:xWant', 'at:to_relax', n1l, '"to relax"',
                   '"person x wants"', '', '"AT"', ''
            FROM base
        """,
        "import_visualgenome": """
            WITH n AS (SELECT CAST(n_nationkey AS VARCHAR) AS nk,
                              CAST(n_regionkey AS VARCHAR) AS rk FROM nation)
            SELECT 'wn:nation_'||nk||'.n.01' AS node1,
                   'mw:MayHaveProperty' AS relation,
                   'wn:large.a.01' AS node2,
                   '"nation '||nk||'"' AS "node1;label",
                   '"large"' AS "node2;label",
                   '"may have property"' AS "relation;label",
                   '' AS "relation;dimension", '"VG"' AS source,
                   '' AS sentence
            FROM n
            UNION ALL
            SELECT 'wn:nation_'||nk||'.n.01', '/r/CapableOf',
                   'wn:move.v.01', '"nation '||nk||'"', '"moving"',
                   '"capable of"', '', '"VG"', ''
            FROM n
            UNION ALL
            SELECT 'wn:nation_'||nk||'.n.01', '/r/LocatedNear',
                   'wn:region_'||rk||'.n.01', '"nation '||nk||'"',
                   '"region '||rk||'"', '"in"', '', '"VG"', ''
            FROM n
        """,
        "jsonl_roundtrip": _EDGE_SQL_NATION,
        # --- fixture-backed oracles (see scripts/make_fixtures.py) ---
        # near-dup clusters: fixture holds only non-singleton members;
        # every other doc is its own cluster
        "minhash_dedup": f"""
            SELECT d.doc_id, COALESCE(f.cluster, d.doc_id) AS cluster
            FROM documents d
            LEFT JOIN read_parquet('{_fixture("minhash_clusters.parquet")}') f
            USING (doc_id)
        """,
        "simhash_dedup": f"""
            SELECT d.doc_id, COALESCE(f.cluster, d.doc_id) AS cluster
            FROM documents d
            LEFT JOIN read_parquet('{_fixture("simhash_clusters.parquet")}') f
            USING (doc_id)
        """,
        "ngram_dedup": f"""
            SELECT d.doc_id, COALESCE(f.cluster, d.doc_id) AS cluster
            FROM documents d
            LEFT JOIN read_parquet('{_fixture("ngram_clusters.parquet")}') f
            USING (doc_id)
        """,
        # planted exact duplicates (vec_id+10000 copies of vecs 0..49)
        # cluster with their source; everything else is a singleton —
        # LSH-independent, so plain SQL
        "embedding_dedup": """
            SELECT vec_id, vec_id AS cluster FROM embeddings
            UNION ALL
            SELECT vec_id + 10000, vec_id FROM embeddings WHERE vec_id < 50
        """,
        "ivf_ann": f"""
            SELECT query_id, vec_id, score
            FROM read_parquet('{_fixture("ivf_ann.parquet")}')
        """,
        # IVFIndex.build trains the same centroids (same seed/sample
        # protocol) as ivf_topk_cosine, so partition-pruned search over
        # the same probes returns the same top-k — one fixture serves both.
        "ivf_index": f"""
            SELECT query_id, vec_id, score
            FROM read_parquet('{_fixture("ivf_ann.parquet")}')
        """,
        "winnowing": f"""
            SELECT doc_id, pos, hash
            FROM read_parquet('{_fixture("winnowing.parquet")}')
        """,
        "text_embedding": f"""
            SELECT doc_id, e0, e1
            FROM read_parquet('{_fixture("text_embedding.parquet")}')
        """,
        "multimodal_features": f"""
            SELECT media_id, f0
            FROM read_parquet('{_fixture("multimodal.parquet")}')
        """,
        "frame_sample": f"""
            SELECT media_id, frame_idx, ts_ms, n_bytes, b0
            FROM read_parquet('{_fixture("frame_sample.parquet")}')
        """,
        "generate_mediawiki": f"""
            SELECT qnode, doc
            FROM read_parquet('{_fixture("mediawiki.parquet")}')
        """,
    }
