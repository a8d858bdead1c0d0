"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "kg_pipeline_wall", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <dir>, "num_cpus": N,
   "triples": T, "triples_per_sec": R}

Headline = the flagship KG-construction pipeline (read pages ->
extract -> triples -> link -> canonicalize -> write parquet) over a
page corpus derived from $GRAFT_SF_DIR/documents.parquet, replicated
``GRAFT_PAGE_REP`` times (default 10) into /tmp parquet ONCE (untimed,
reused across runs and parallelism levels so both levels read the same
bytes).

``--scaling`` runs bench.py twice in fresh processes at
RAY_GRAFT_CPUS=8 and 32 and reports the throughput scaling efficiency
(the sandbox substitute for the N vs 4N-node cluster criterion).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGE_REP = int(os.environ.get("GRAFT_PAGE_REP", "30"))


def corpus_dir(rep: int = PAGE_REP) -> str:
    tag = SF_DIR.strip("/").replace("/", "_")
    return f"/tmp/graft_pages_{tag}_rep{rep}"


def ensure_corpus(rep: int = PAGE_REP) -> str:
    """Generate the replicated page corpus once (untimed)."""
    out = corpus_dir(rep)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import pandas as pd
    import pyarrow.parquet as pq
    from kgtk_ray.pipelines.corpus import _expected_text, _page_html, BASE_TS

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    os.makedirs(out, exist_ok=True)
    for r in range(rep):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * 1_000_000
        rows = {
            "url": "https://example.org/doc/" + d["doc_id"].astype(str),
            "warc_ts": BASE_TS + pd.to_timedelta(d["doc_id"], unit="s"),
            "html": [_page_html(i, t, l, s, n).encode()
                     for i, t, l, s, n in zip(d.doc_id, d.text, d.lang,
                                              d.source, d.n_chars)],
            "text": [_expected_text(i, t, l, s, n)
                     for i, t, l, s, n in zip(d.doc_id, d.text, d.lang,
                                              d.source, d.n_chars)],
            "lang": d["lang"].astype(str),
        }
        pd.DataFrame(rows).to_parquet(os.path.join(out, f"part-{r:03d}.parquet"),
                                      index=False)
    open(marker, "w").close()
    return out


def _steal_jiffies() -> int:
    """Aggregate stolen CPU time (jiffies) from /proc/stat — nonzero
    when the sandbox's hypervisor neighbor is busy.  Used to annotate
    bench output: identical runs on identical code measured 8.5 s vs
    19.2 s purely from external steal, so wall times are only
    comparable at similar steal levels."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def run_bench() -> dict:
    steal0, t0 = _steal_jiffies(), time.time()
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Executor tuning, measured on the headline pipeline (see
    # BASELINE.md "executor configuration"): the default per-operator
    # resource reservation splits the CPU budget across the ~6 plan
    # operators, which on small CPU counts throttles the hot fused map
    # stage to ~1 concurrent task (8-CPU leg: 60 s -> 11 s from this
    # one flag).  Disabling reservation silently drops Ray Data's
    # memory-limit fraction from 0.5 to 0.25, which the page-corpus
    # read then saturates — so pin the fraction back explicitly.
    ctx.op_resource_reservation_enabled = False
    ctx.override_object_store_memory_limit_fraction = 0.5

    import numpy as np
    import pandas as pd
    import ray.data as rd

    pages_path = ensure_corpus()
    # warm the page cache so both parallelism levels measure compute+shuffle
    n_pages = rd.read_parquet(pages_path).count()

    results: dict[str, float] = {}

    # ---- headline: flagship KG pipeline -> parquet sink ----
    from kgtk_ray.pipelines import kg_pipeline_from_pages
    from kgtk_ray.pipelines.kg import doc_alias_map
    from kgtk_ray.pipelines.triples import DOC_PATTERNS

    alias = doc_alias_map(SF_DIR)
    out_dir = f"/tmp/bench_kg_out_{NUM_CPUS}"
    import shutil

    def run_headline() -> None:
        shutil.rmtree(out_dir, ignore_errors=True)
        # parallelism scaled to the session's CPU budget (the cluster-size
        # proxy): ~2 blocks per CPU keeps per-task scheduling overhead
        # amortized.  The dict-only linker runs as stateless tasks (the
        # concurrency arg only sizes the actor pool of the
        # embedding-index tier, unused here — a 16-actor pool re-spawned
        # per execution measured ~9 s of stall on this corpus).
        # link_batch_size scales with ROWS PER CPU, not with the CPU
        # count: an explicit map_batches batch_size bundles upstream
        # blocks into tasks of >= that many rows, so the round-4
        # CPU-scaled formula (16384 at 32 CPUs) collapsed the fused
        # extract->triples->link chain to 9 tasks on 32 cores for the
        # rep-30 corpus (3.25 s vs 1.64 s at 4096).  On the big scaling
        # corpora the task count is block-bound either way and larger
        # batches amortize per-batch overhead (rep-480 @ 4 CPUs: 74.4 s
        # at 16384 vs 76.7 s at 4096) — so pick the largest batch that
        # still leaves ~4 bundles per CPU, clamped to [4096, 16384].
        pages = rd.read_parquet(pages_path,
                                override_num_blocks=2 * NUM_CPUS)
        edges = kg_pipeline_from_pages(
            pages, alias, DOC_PATTERNS,
            concurrency=max(2, NUM_CPUS // 2),
            link_batch_size=max(4096, min(16384,
                                          n_pages // (4 * NUM_CPUS))))
        edges.write_parquet(out_dir)

    # untimed warm-up: starts Ray worker processes and caches imports so
    # the timed runs measure steady-state throughput (the quantity that
    # matters for a long-running 100 TB job), not cold-start latency.
    # Headline = median of 3 timed runs: single-node wall time for this
    # job swings with page-cache flushes of the parquet sink, and the
    # median is the stable estimator of steady state.
    run_headline()
    if os.environ.get("GRAFT_STATS"):
        # per-stage profile of one run (reads the sink dataset's stats
        # after a full execution) — printed to stderr so the JSON line
        # on stdout stays parseable
        shutil.rmtree(out_dir, ignore_errors=True)
        pages = rd.read_parquet(pages_path, override_num_blocks=2 * NUM_CPUS)
        edges = kg_pipeline_from_pages(
            pages, alias, DOC_PATTERNS,
            concurrency=max(2, NUM_CPUS // 2),
            link_batch_size=max(4096, min(16384,
                                          n_pages // (4 * NUM_CPUS))))
        edges.write_parquet(out_dir)
        print(edges.stats(), file=sys.stderr)
    runs = []
    for _ in range(3):
        t0 = time.time()
        run_headline()
        runs.append(round(time.time() - t0, 3))
    headline = sorted(runs)[1]
    results["kg_pipeline"] = headline
    results["kg_pipeline_runs"] = runs
    n_triples = rd.read_parquet(out_dir).count()

    # ---- operator benchmarks over sf tables ----
    def timed(name, fn):
        t = time.time()
        fn()
        results[name] = round(time.time() - t, 3)

    import __ray_entry__ as E

    timed("compact", lambda: E._q_compact(SF_DIR).count())

    # zipfian hot-key stress: ONE entity holds ~30% of the edges.  The
    # phase-1 per-batch combiner bounds what the hot key's bucket
    # receives (<=1 row per upstream batch), so wall-time should track
    # the uniform `compact` entry rather than the hot key's row count.
    def bench_compact_zipf():
        import numpy as np
        from kgtk_ray.ops import compact
        li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"])

        def skew(df):
            hot = (df.l_orderkey % 10 < 3).to_numpy()
            return pd.DataFrame({
                "node1": np.where(hot, "HOT",
                                  "O" + df.l_orderkey.astype(str)),
                "label": "has_part",
                "node2": "P" + df.l_partkey.astype(str)})

        edges = li.map_batches(skew, batch_format="pandas")
        n = compact(edges, ["node1", "label"]).count()
        results["compact_zipf_rows"] = n

    timed("compact_zipf", bench_compact_zipf)
    timed("agg_pricing", lambda: E._q_agg_pricing(SF_DIR).count())
    timed("tumbling_window", lambda: E._q_tumbling(SF_DIR).count())
    timed("minhash_dedup", lambda: E._q_minhash(SF_DIR).count())
    timed("topk_cosine", lambda: E._q_topk_cosine(SF_DIR).count())
    timed("langid", lambda: E._q_langid(SF_DIR).count())
    timed("dup_ngrams", lambda: E._q_dup_ngrams(SF_DIR).count())
    timed("semdedup", lambda: E._q_semdedup(SF_DIR).count())
    timed("pack_sequences", lambda: E._q_pack_sequences(SF_DIR).count())
    timed("dedup_against", lambda: E._q_dedup_against(SF_DIR).count())
    timed("dedup_spans", lambda: E._q_dedup_spans(SF_DIR).count())
    timed("corpus_stats", lambda: E._q_corpus_stats(SF_DIR).count())
    timed("shard_assign", lambda: E._q_shard_assign(SF_DIR).count())
    timed("corpus_curation", lambda: E._q_corpus_curation(SF_DIR).count())
    timed("url_dedup", lambda: E._q_url_dedup(SF_DIR).count())
    timed("dsir_sample", lambda: E._q_dsir_sample(SF_DIR).count())

    # the FULL webtext curation stack as one stream (headline #2):
    # url front door -> langid -> gopher quality -> PII -> span dedup
    # -> MinHash near-dup -> decontaminate vs an eval slice ->
    # quality-classifier lottery -> split -> shard.  Each stage is
    # oracle-checked individually (queries()); this measures their
    # composition at bench scale.
    def bench_curation_full():
        from kgtk_ray.dedup import minhash_dedup
        from kgtk_ray.ops import shard_assign, split_dataset
        from kgtk_ray.text import (classifier_filter, decontaminate,
                                   dedup_spans, dedup_urls, gopher_filter,
                                   langid, scrub_pii)
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"])
        docs = docs.map_batches(lambda df: df.assign(
            url="https://s" + (df.doc_id % 50).astype(str) + ".org/d/"
                + df.doc_id.astype(str)), batch_format="pandas")
        ev = docs.map_batches(lambda df: df[df.doc_id % 97 == 0],
                              batch_format="pandas")
        pos = docs.map_batches(lambda df: df[df.doc_id % 10 == 0],
                               batch_format="pandas")
        from kgtk_ray.ops.shuffle import ifexists
        ds = dedup_urls(docs)
        ds = langid(ds)
        ds = gopher_filter(ds, min_tokens=30, max_dup_word_frac=0.55,
                           max_top_word_frac=0.13)
        # checkpoint: the span-deduped corpus feeds two consumers (the
        # MinHash cluster pass and the representative semi-join input)
        ds = dedup_spans(scrub_pii(ds), k=3).materialize()
        # near-dup clusters -> keep the min-member representative
        reps = minhash_dedup(ds).map_batches(
            lambda df: df[df.doc_id == df.cluster][["doc_id"]],
            batch_format="pandas")
        ds = ifexists(ds, reps, input_keys=["doc_id"],
                      filter_keys=["doc_id"])
        # checkpoint the reduced corpus: three consumers branch off it
        # (classifier negative sampling, scoring, and the final
        # semi-join) — without this the lazy chain upstream re-executes
        # once per consumer.  At 100 TB this is the persist-to-parquet
        # phase boundary the kg pipeline's materialize_edges provides.
        ds = decontaminate(ds, ev, k=4).materialize()
        kept = classifier_filter(ds, pos, lottery_alpha=2.0).map_batches(
            lambda df: df[["doc_id"]], batch_format="pandas")
        final = split_dataset(
            shard_assign(ifexists(ds, kept, input_keys=["doc_id"],
                                  filter_keys=["doc_id"]),
                         id_col="doc_id", n_shards=8),
            id_col="doc_id",
            fractions={"train": 0.9, "valid": 0.05, "test": 0.05})
        results["curation_full_rows"] = final.count()

    timed("curation_full", bench_curation_full)

    # distributed pagerank on the full lineitem edge table (the graph
    # iteratives' scale check: rank state stays a Dataset; driver RSS
    # flat vs input size)
    def bench_pagerank():
        import pyarrow as pa
        import pyarrow.compute as pc

        from kgtk_ray.ops.graph import pagerank
        li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"])

        def build(t: "pa.Table") -> "pa.Table":
            empty = pa.scalar("", pa.large_string())

            def tag(prefix, col):
                return pc.binary_join_element_wise(
                    pa.scalar(prefix, pa.large_string()),
                    pc.cast(t[col], pa.large_string()), empty)

            return pa.table({
                "node1": tag("O", "l_orderkey"),
                "label": pc.fill_null(
                    pa.nulls(t.num_rows, pa.large_string()), "has_part"),
                "node2": tag("P", "l_partkey"),
            })

        edges = li.map_batches(build, batch_format="pyarrow")
        pagerank(edges, iters=3, num_partitions=2 * NUM_CPUS).count()

    timed("pagerank", bench_pagerank)

    ray.shutdown()
    # external CPU steal as % of the machine's 32-CPU capacity over the
    # whole bench (jiffies are 100 Hz)
    steal_pct = round((_steal_jiffies() - steal0)
                      / (32 * max(time.time() - t0, 1e-9)), 1)
    return {
        "metric": "kg_pipeline_wall",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "page_rep": PAGE_REP,
        "triples": int(n_triples),
        "triples_per_sec": round(n_triples / headline, 1),
        "external_cpu_steal_pct": steal_pct,
    }


def run_scaling() -> dict:
    # The scaling criterion simulates N vs 4N cluster nodes.  It must be
    # measured in the compute-bound regime (the 100 TB regime), not the
    # fixed-overhead regime: per-wave dispatch + the sort barrier cost a
    # roughly data-independent ~6-10 s on the 32-CPU leg, which no
    # amount of CPUs removes — at small corpus sizes that constant IS
    # the 32-CPU wall time.  The round-4 executor/pipeline speedups
    # (vectorized merge, task-based linker, single-exchange sorted
    # compact, reservation fix) cut the per-page cost ~3x, so the
    # corpus needed to stay compute-bound grew accordingly: 480
    # replications (7.2M pages, ~2.9M output edges) put the high-CPU
    # leg's scalable work at ~3x its constant overhead for the default
    # 4->16 pair (use ~960 for 8->32).
    rep = int(os.environ.get("GRAFT_SCALING_REP", str(max(PAGE_REP, 480))))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_PAGE_REP=str(rep))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    ensure_corpus(rep)
    # N and 4N CPUs.  Default 4->16: both legs sit below this host's
    # DRAM-bandwidth knee (~16-24 concurrent string-heavy workers), so
    # the ratio measures the PIPELINE's scaling, which is what a real
    # N->4N-node cluster (each node bringing its own memory bus) sees.
    # GRAFT_SCALING_CPUS="8,32" reproduces the bandwidth-capped pair —
    # see BASELINE.md for both measurements and the map-only evidence
    # separating the two effects.
    lo, hi = (int(x) for x in
              os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(","))
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "triples_per_sec_lo": r_lo["triples_per_sec"],
        "triples_per_sec_hi": r_hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR, "page_rep": rep,
        "external_cpu_steal_pct_lo": r_lo.get("external_cpu_steal_pct"),
        "external_cpu_steal_pct_hi": r_hi.get("external_cpu_steal_pct"),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
