"""Head-to-head single-node throughput: reference KGTK vs kgtk_ray.

Runs the reference's own operator implementations (KgtkCompact,
KgtkIfExists, Unique, KgtkLift, and the clean-data reader/writer loop
— imported from /root/reference with tiny stub modules for its unused
optional deps) and our Ray Data equivalents on the SAME derived edge
TSV/parquet at a given scale factor, and prints one JSON line of wall
times.  This is the "matches-or-beats the reference's single-node
throughput" evidence for BASELINE.md.

Usage:  python scripts/bench_reference.py [sf_dir] [num_cpus]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHIM = "/tmp/refshim"


def make_shims() -> None:
    os.makedirs(f"{SHIM}/lz4", exist_ok=True)
    open(f"{SHIM}/lz4/__init__.py", "w").write("from . import frame\n")
    open(f"{SHIM}/lz4/frame.py", "w").write(
        "def open(*a, **k):\n"
        "    raise NotImplementedError('lz4 shim')\n")
    open(f"{SHIM}/sh.py", "w").write(
        "class ErrorReturnCode(Exception): pass\n"
        "class SignalException_SIGPIPE(Exception): pass\n")
    # pycountry's full ISO-639 table is not in this container; the shim
    # accepts any syntactic 2/3-letter code (so language-code TABLE
    # membership is out of scope for parity runs — both engines then
    # validate codes syntactically)
    open(f"{SHIM}/iso639.py", "w").write(
        "def find(code=None, language=None):\n"
        "    return {'iso639_1': code, 'name': 'x'} if code else None\n"
        "class _Langs:\n"
        "    def get(self, **kw):\n"
        "        raise KeyError(kw)\n"
        "languages = _Langs()\n"
        "def is_valid639_1(c): return True\n"
        "def is_valid639_2(c): return True\n")
    open(f"{SHIM}/pycountry.py", "w").write(
        "class _Lang:\n"
        "    name = 'x'\n"
        "class _DB:\n"
        "    def get(self, **kw):\n"
        "        v = next(iter(kw.values()), '')\n"
        "        return _Lang() if isinstance(v, str) and v.isalpha() else None\n"
        "    def lookup(self, *a): return None\n"
        "languages = _DB(); countries = _DB()\n")


def build_inputs(sf: str, rep: int = 1) -> tuple[str, str]:
    """Derive the lineitem edge table once as TSV (reference input) and
    parquet (our input) — identical rows.  ``rep`` replicates the table
    with disjoint order keys to scale the comparison into the regime
    where fixed costs amortize (the 100 TB-relevant regime)."""
    import duckdb
    edges_tsv = f"/tmp/refbench_edges_r{rep}.tsv"
    # a DIRECTORY of part files — a single parquet file would serialize
    # the Ray read into one task (real corpora are always many files)
    edges_pq = f"/tmp/refbench_edges_r{rep}_pq"
    filt_tsv = "/tmp/refbench_filter.tsv"
    filt_pq = "/tmp/refbench_filter.parquet"
    if not (os.path.exists(edges_tsv) and os.path.exists(edges_pq)):
        con = duckdb.connect()
        con.sql(f"""
            CREATE VIEW e AS
            SELECT 'O'||CAST(l_orderkey + 10000000*r AS VARCHAR) AS node1,
                   'has_part' AS label,
                   'P'||CAST(l_partkey AS VARCHAR) AS node2,
                   'S'||CAST(l_suppkey AS VARCHAR) AS supp,
                   CAST(l_linenumber AS VARCHAR) AS ln
            FROM '{sf}/lineitem.parquet', generate_series(0, {rep - 1}) AS g(r)""")
        con.sql(f"COPY e TO '{edges_tsv}' (FORMAT CSV, DELIMITER '\t', HEADER)")
        con.sql(f"COPY e TO '{edges_pq}' "
                f"(FORMAT PARQUET, FILE_SIZE_BYTES '8MB')")
        con.sql(f"""
            CREATE VIEW f AS
            SELECT DISTINCT 'O'||CAST(o_orderkey AS VARCHAR) AS id
            FROM '{sf}/orders.parquet' WHERE o_orderkey % 7 = 0""")
        con.sql(f"COPY f TO '{filt_tsv}' (FORMAT CSV, DELIMITER '\t', HEADER)")
        con.sql(f"COPY f TO '{filt_pq}' (FORMAT PARQUET)")
    labels_tsv = "/tmp/refbench_labels.tsv"
    labels_pq = "/tmp/refbench_labels.parquet"
    if not (os.path.exists(labels_tsv) and os.path.exists(labels_pq)):
        import duckdb
        con = duckdb.connect()
        con.sql(f"""
            CREATE VIEW lbl AS
            SELECT 'P'||CAST(p_partkey AS VARCHAR) AS node1,
                   'label' AS label, p_name AS node2
            FROM '{sf}/part.parquet'""")
        con.sql(f"COPY lbl TO '{labels_tsv}' "
                "(FORMAT CSV, DELIMITER '\t', HEADER)")
        con.sql(f"COPY lbl TO '{labels_pq}' (FORMAT PARQUET)")
    return edges_tsv, edges_pq


def _best_of(n: int, fn) -> float:
    """min of n timed runs — the steady-state estimator both engines
    get (back-to-back runs in one process jitter with GC/page cache)."""
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def bench_reference(edges_tsv: str) -> dict[str, float]:
    make_shims()
    sys.path.insert(0, SHIM)
    sys.path.insert(0, "/root/reference")
    from kgtk.iff.kgtkifexists import KgtkIfExists
    from kgtk.io.kgtkreader import KgtkReader, KgtkReaderOptions
    from kgtk.io.kgtkwriter import KgtkWriter
    from kgtk.join.unique import Unique
    from kgtk.lift.kgtklift import KgtkLift
    from kgtk.reshape.kgtkcompact import KgtkCompact
    from kgtk.utils.validationaction import ValidationAction

    times: dict[str, float] = {}
    times["ref_compact"] = _best_of(2, lambda: KgtkCompact(
        input_file_path=Path(edges_tsv),
        output_file_path=Path("/tmp/refbench_ref_compact.tsv"),
        key_column_names=["node1", "label", "node2"],
        verify_sort=False).process())
    times["ref_unique"] = _best_of(2, lambda: Unique(
        input_file_path=Path(edges_tsv),
        column_name="node2",
        output_file_path=Path("/tmp/refbench_ref_unique.tsv")).process())
    times["ref_ifexists"] = _best_of(2, lambda: KgtkIfExists(
        input_file_path=Path(edges_tsv),
        filter_file_path=Path("/tmp/refbench_filter.tsv"),
        input_keys=["node1"], filter_keys=["id"],
        output_file_path=Path("/tmp/refbench_ref_ifexists.tsv")).process())
    times["ref_lift"] = _best_of(2, lambda: KgtkLift(
        input_file_path=Path(edges_tsv),
        label_file_path=Path("/tmp/refbench_labels.tsv"),
        output_file_path=Path("/tmp/refbench_ref_lift.tsv")).process())

    def ref_clean() -> None:
        # the reference clean-data core (kgtk/cli/clean_data.py:115-131):
        # a validating KgtkReader streamed row-by-row into a KgtkWriter,
        # invalid values excluded (strict default KgtkValueOptions)
        ropts = KgtkReaderOptions(
            repair_and_validate_values=True,
            invalid_value_action=ValidationAction.EXCLUDE)
        kr = KgtkReader.open(Path(edges_tsv), options=ropts)
        kw = KgtkWriter.open(kr.column_names,
                             Path("/tmp/refbench_ref_clean.tsv"))
        for row in kr:
            kw.write(row)
        kw.close()

    times["ref_clean"] = _best_of(2, ref_clean)
    return times


def bench_ours(edges_pq: str, num_cpus: int) -> dict[str, float]:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    import kgtk_ray.ops as O

    times: dict[str, float] = {}
    # warm-up (worker start + imports, untimed — steady state is the
    # comparable quantity; the reference pays no comparable one-time cost)
    O.compact(rd.read_parquet(edges_pq), ["node1", "label", "node2"]).count()

    import shutil

    def sink(ds, name):
        shutil.rmtree(f"/tmp/refbench_{name}", ignore_errors=True)
        ds.write_parquet(f"/tmp/refbench_{name}")

    times["ray_compact"] = _best_of(2, lambda: sink(
        O.compact(rd.read_parquet(edges_pq), ["node1", "label", "node2"]),
        "ray_compact"))
    times["ray_unique"] = _best_of(2, lambda: sink(
        O.unique_counts(rd.read_parquet(edges_pq), "node2"), "ray_unique"))
    times["ray_ifexists"] = _best_of(2, lambda: sink(
        O.ifexists(rd.read_parquet(edges_pq),
                   rd.read_parquet("/tmp/refbench_filter.parquet"),
                   input_keys=["node1"], filter_keys=["id"]), "ray_ifexists"))
    times["ray_lift"] = _best_of(2, lambda: sink(
        O.lift(rd.read_parquet(edges_pq),
               rd.read_parquet("/tmp/refbench_labels.parquet")), "ray_lift"))
    from kgtk_ray.values import ValueOptions
    times["ray_clean"] = _best_of(2, lambda: sink(
        O.clean_edges(rd.read_parquet(edges_pq),
                      ["node1", "label", "node2", "supp", "ln"],
                      options=ValueOptions()), "ray_clean"))
    ray.shutdown()
    return times


def main() -> None:
    import shutil
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    for d in ("ray_compact", "ray_unique", "ray_ifexists", "ray_lift",
              "ray_clean"):
        shutil.rmtree(f"/tmp/refbench_{d}", ignore_errors=True)
    edges_tsv, edges_pq = build_inputs(sf, rep)
    n_rows = sum(1 for _ in open(edges_tsv)) - 1
    ref = bench_reference(edges_tsv)
    ours = bench_ours(edges_pq, ncpu)
    out = {"sf": sf, "rows": n_rows, "num_cpus": ncpu, "rep": rep,
           **ref, **ours}
    for op in ("compact", "unique", "ifexists", "lift", "clean"):
        out[f"speedup_{op}"] = round(ref[f"ref_{op}"] / ours[f"ray_{op}"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
