#!/usr/bin/env python3
"""Same-window matched A/B bench: round-3 code vs current code (round-4
verdict task 1). BENCH_r04 measured nearly every wall metric 1.4-2.9x
slower than BENCH_r03, in DIFFERENT windows on a host whose deliverable
compute swings 2-4x — this tool settles host-noise vs regression by
interleaving the SAME measurements over three code variants in ONE window:

  A  round-3 tree (git worktree at the r3 final commit)
  B  current tree, finalize_segments=True  (the new r4 build default)
  C  current tree, finalize_segments=False (isolates the finalize cost)

Each (variant, round) runs in its own python+JVM subprocess (fresh session,
untimed 60k-doc warmup build, then timed: 600k-doc build with tree-CPU
accounting, routed query suite best-of-2, 2x30k append, merge_appends,
file:// URI build). The measurement code is THIS file for every variant —
only PYTHONPATH/cwd select which visigoth_spark gets measured — so a delta
can only come from the engine code or the window, and the window is shared.
Rounds rotate the variant order (ABC/BCA/CAB) to cancel linear drift; a
fixed pure-python CPU probe runs between children as window evidence.

Usage: python tools/ab_bench.py [--rounds 3] [--ndocs 600000]
Child mode (internal): --child --tree P --finalize on|off [--ndocs N]
Writes ab_bench_out.json; the BENCH.md addendum is written from it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_COMMIT = "d3ccfb9"  # "round 3: verdict/advice/correctness/bench"
R3_TREE = os.path.join(_REPO, ".bench", "ab_r3_tree")

QUERY_SUITE = [
    ("bm25_2term_head", "programación java", "bm25"),
    ("bm25_3term", "curso completo programacion", "bm25"),
    ("bm25_tail", "huevos", "bm25"),
    ("bm25_head", "curso", "bm25"),
    ("bm25_2tail", "zampo casco", "bm25"),
    ("bm25_or_2term", "programación java", "bm25_or"),
    ("hits_1term", "java", "hits"),
    ("hits_2term", "programacion web", "hits"),
    ("linear_2term", "python web", "linear"),
]
CORES = 8  # the BENCH_r03/r04 build-throughput comparison level


def cpu_probe() -> float:
    """Fixed single-thread CPU workload (~1.5s nominal): wall seconds.
    Ratio across the window = deliverable-compute drift evidence."""
    import hashlib

    t0 = time.time()
    h = b"x" * 64
    for _ in range(400_000):
        h = hashlib.md5(h).digest()
    return time.time() - t0


def _cpu_tree_seconds() -> float:
    clk = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    procs: dict[int, tuple[int, float]] = {}
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        try:
            with open(f"/proc/{ent}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        rp = raw.rindex(")")
        fields = raw[rp + 2:].split()
        procs[int(ent)] = (int(fields[1]),
                           (int(fields[11]) + int(fields[12])) / clk)
    total = 0.0
    for pid, (ppid, cpu) in procs.items():
        p = pid
        while p > 1:
            if p == me:
                total += cpu
                break
            p = procs.get(p, (0, 0.0))[0]
    return total


# --------------------------------------------------------------------------
# child: measure one variant once
# --------------------------------------------------------------------------

def child_main(args) -> None:
    sys.path.insert(0, args.tree)
    import inspect

    from pyspark.sql import SparkSession

    from visigoth_spark.build import append_index, build_index, merge_appends
    from visigoth_spark.corpus import generate_corpus
    from visigoth_spark.query import SearchIndex

    n_docs = args.ndocs
    corpus_path = args.corpus
    warm_path = args.warm_corpus

    os.makedirs("/dev/shm/vg_spark_local", exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CORES}]")
        .appName("visigoth-ab")
        .config("spark.local.dir", "/dev/shm/vg_spark_local")
        .config("spark.sql.shuffle.partitions", str(CORES * 4))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .config("spark.io.compression.codec", "lz4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _warm(it):
        from visigoth_spark.stemmer_es import stem_cached

        stem_cached("programación")
        for pdf in it:
            yield pdf

    spark.range(0, CORES * 4, 1, CORES * 4).toDF("id").mapInPandas(
        _warm, "id long").count()

    bkw = {}
    if "finalize_segments" in inspect.signature(build_index).parameters:
        bkw["finalize_segments"] = args.finalize == "on"

    out: dict = {"tree": args.tree, "finalize": args.finalize}
    corpus = spark.read.parquet(corpus_path)
    corpus.select("url").count()  # page-cache prime

    tmp = tempfile.mkdtemp(prefix="vg_ab_", dir="/dev/shm")
    try:
        idx = os.path.join(tmp, "idx")
        build_index(spark, spark.read.parquet(warm_path), idx,
                    num_partitions=CORES * 2, assume_sorted=True, **bkw)
        shutil.rmtree(idx, ignore_errors=True)

        c0 = _cpu_tree_seconds()
        t0 = time.time()
        build_index(spark, corpus, idx, num_partitions=CORES * 2,
                    assume_sorted=True, **bkw)
        build_wall = time.time() - t0
        out["build_docs_per_sec"] = round(n_docs / build_wall, 1)
        out["build_wall"] = round(build_wall, 2)
        out["build_cpu"] = round(_cpu_tree_seconds() - c0, 1)

        ix = SearchIndex(spark, idx)
        ix.search("programación", "bm25", 10).collect()  # warm
        qs: dict[str, float] = {}
        t_suite = time.time()
        for _pass in range(2):
            for name, q, engine in QUERY_SUITE:
                t0 = time.time()
                ix.search(q, engine, 10).collect()
                dt = round(time.time() - t0, 4)
                if name not in qs or dt < qs[name]:
                    qs[name] = dt
        out["suite_wall"] = round((time.time() - t_suite) / 2, 2)
        out["bm25_p50"] = round(statistics.median(
            [qs[n] for n, _, e in QUERY_SUITE if e == "bm25"]), 4)
        out["queries"] = qs

        n_app = max(1_000, n_docs // 20)
        extra = generate_corpus(2 * n_app, seed=1042)
        extra["url"] = "m-" + extra["url"]
        t_app = time.time()
        for half in (extra.iloc[:n_app], extra.iloc[n_app:]):
            append_index(
                spark, spark.createDataFrame(half[["url", "text", "lang"]]),
                idx, num_partitions=CORES,
            )
        append_wall = time.time() - t_app
        out["append_docs_per_sec"] = round(2 * n_app / append_wall, 1)
        out["append_wall"] = round(append_wall, 2)

        t0 = time.time()
        merge_appends(spark, idx, num_partitions=CORES * 2)
        out["merge_wall"] = round(time.time() - t0, 2)

        uri_idx = os.path.join(tmp, "uri_idx")
        t0 = time.time()
        build_index(spark, corpus, "file://" + uri_idx,
                    num_partitions=CORES * 2, assume_sorted=True, **bkw)
        out["uri_build_docs_per_sec"] = round(n_docs / (time.time() - t0), 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print("AB_RESULT " + json.dumps(out))


# --------------------------------------------------------------------------
# parent: worktree + interleave + aggregate
# --------------------------------------------------------------------------

def ensure_r3_tree() -> str:
    if not os.path.isdir(os.path.join(R3_TREE, "visigoth_spark")):
        os.makedirs(os.path.dirname(R3_TREE), exist_ok=True)
        subprocess.run(["git", "worktree", "add", "--detach", R3_TREE,
                        R3_COMMIT], cwd=_REPO, check=True)
    return R3_TREE


def ensure_corpus(n_docs: int) -> tuple[str, str]:
    sys.path.insert(0, _REPO)
    from visigoth_spark.corpus import write_corpus_parquet

    cache = os.path.join(_REPO, ".bench")
    os.makedirs(cache, exist_ok=True)
    paths = []
    for n in (n_docs, max(2_000, n_docs // 10)):
        p = os.path.join(cache, f"corpus_{n}.parquet")
        if not os.path.exists(p):
            write_corpus_parquet(p, n)
        paths.append(p)
    return paths[0], paths[1]


def run_child(tree: str, finalize: str, n_docs: int, corpus: str,
              warm: str) -> dict | None:
    env = dict(os.environ, PYTHONPATH=tree)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         "--tree", tree, "--finalize", finalize, "--ndocs", str(n_docs),
         "--corpus", corpus, "--warm-corpus", warm],
        capture_output=True, text=True, cwd=tree, env=env, timeout=1200,
    )
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("AB_RESULT ")), None)
    if line is None:
        print(f"# child failed ({tree}, finalize={finalize}): "
              f"{proc.stderr[-800:]}", file=sys.stderr)
        return None
    return json.loads(line[len("AB_RESULT "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--tree", default=_REPO)
    ap.add_argument("--finalize", default="on")
    ap.add_argument("--ndocs", type=int, default=600_000)
    ap.add_argument("--corpus")
    ap.add_argument("--warm-corpus")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    if args.child:
        child_main(args)
        return

    r3 = ensure_r3_tree()
    corpus, warm = ensure_corpus(args.ndocs)
    variants = {
        "A_r3": (r3, "on"),        # r3 ignores the flag (no such kwarg)
        "B_cur_finalize": (_REPO, "on"),
        "C_cur_nofinalize": (_REPO, "off"),
    }
    order = list(variants)
    results: dict[str, list[dict]] = {k: [] for k in variants}
    probes: list[float] = [cpu_probe()]
    t_start = time.time()
    for rnd in range(args.rounds):
        rot = order[rnd % 3:] + order[:rnd % 3]
        for key in rot:
            tree, fin = variants[key]
            r = run_child(tree, fin, args.ndocs, corpus, warm)
            probes.append(cpu_probe())
            if r is None:
                continue
            r["round"] = rnd
            results[key].append(r)
            print(f"# r{rnd} {key}: build={r['build_docs_per_sec']:.0f}d/s "
                  f"cpu={r['build_cpu']:.0f}s suite={r['suite_wall']}s "
                  f"p50={r['bm25_p50']}s append={r['append_docs_per_sec']:.0f}d/s "
                  f"merge={r['merge_wall']}s uri={r['uri_build_docs_per_sec']:.0f}d/s",
                  file=sys.stderr)

    def best(key: str, metric: str, lo_is_good: bool) -> float | None:
        vals = [r[metric] for r in results[key] if metric in r]
        if not vals:
            return None
        return min(vals) if lo_is_good else max(vals)

    summary = {
        "ndocs": args.ndocs,
        "rounds": args.rounds,
        "wall_total": round(time.time() - t_start, 1),
        "cpu_probe_walls": [round(p, 3) for p in probes],
        "cpu_probe_drift": round(max(probes) / min(probes), 3),
        "build_cpu_by_variant": {
            k: [r["build_cpu"] for r in v] for k, v in results.items()},
        "best": {
            k: {
                "build_docs_per_sec": best(k, "build_docs_per_sec", False),
                "suite_wall": best(k, "suite_wall", True),
                "bm25_p50": best(k, "bm25_p50", True),
                "append_docs_per_sec": best(k, "append_docs_per_sec", False),
                "merge_wall": best(k, "merge_wall", True),
                "uri_build_docs_per_sec": best(
                    k, "uri_build_docs_per_sec", False),
            }
            for k in variants
        },
        "raw": results,
    }
    with open(os.path.join(_REPO, "ab_bench_out.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary["best"], indent=1))
    print(f"# cpu probe drift across window: {summary['cpu_probe_drift']}")


if __name__ == "__main__":
    main()
