#!/usr/bin/env python3
"""sf1 (6M-doc, 10x the committed bench) headline run — round-4 verdict
task 2: demonstrate size-linearity of the 100-TB design claims at the
largest corpus this host fits comfortably.

Measures, at sf1 with the same protocol as bench.py (fresh sessions,
untimed warmup at a tenth the docs, tmpfs spill, tree-CPU accounting):
  - one matched (2, 8)-core build pair -> scaling efficiency + CPU-work
    invariance at sf1 (run --pairs N for retries in a dirty window)
  - routed query suite (best of 2) + forced-distributed p50, by df band
  - append (2 x 5%) + merge_appends + compact walls
Writes sf1_bench_out.json; the BASELINE.md round-5 section reports the
size-vs-sf0.1 ratios.

Usage: python tools/sf1_bench.py [--ndocs 6000000] [--pairs 1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402  (the committed bench harness — same protocol)

CORES_LO, CORES_HI = 2, 8


def timed_build(corpus_path: str, n_docs: int, cores: int,
                warm_path: str) -> tuple[float, float]:
    """(docs/sec, tree-cpu-seconds) for one cold build in a fresh session,
    after an untimed warmup build at a tenth the docs."""
    from visigoth_spark.build import build_index

    spark = bench.make_session(cores, cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)
    corpus.select("url").count()
    tmp = tempfile.mkdtemp(prefix=f"vg_sf1_{cores}_", dir="/dev/shm")
    idx = os.path.join(tmp, "idx")
    try:
        build_index(spark, spark.read.parquet(warm_path), idx,
                    num_partitions=cores * 2, assume_sorted=True)
        shutil.rmtree(idx, ignore_errors=True)
        c0 = bench._cpu_tree_seconds()
        t0 = time.time()
        build_index(spark, corpus, idx, num_partitions=cores * 2,
                    assume_sorted=True)
        wall = time.time() - t0
        return n_docs / wall, bench._cpu_tree_seconds() - c0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndocs", type=int, default=6_000_000)
    ap.add_argument("--pairs", type=int, default=1)
    args = ap.parse_args()
    n_docs = args.ndocs

    t_all = time.time()
    corpus_path = bench.get_corpus_path(n_docs)
    warm_path = bench.get_corpus_path(max(2_000, n_docs // 10))
    out: dict = {"ndocs": n_docs}

    # --- matched (2, 8) pair(s) ------------------------------------------
    pairs = []
    for _ in range(args.pairs):
        dps_lo, cpu_lo = timed_build(corpus_path, n_docs, CORES_LO,
                                     warm_path)
        dps_hi, cpu_hi = timed_build(corpus_path, n_docs, CORES_HI,
                                     warm_path)
        eff = dps_hi / (dps_lo * (CORES_HI / CORES_LO))
        pairs.append({"lo": round(dps_lo, 1), "hi": round(dps_hi, 1),
                      "cpu_lo": round(cpu_lo, 1),
                      "cpu_hi": round(cpu_hi, 1),
                      "eff": round(eff, 3),
                      "cpu_invariance": round(cpu_lo / cpu_hi, 3)})
        print(f"# pair: {pairs[-1]}", file=sys.stderr)
        if 0.8 <= eff <= 1.15:
            break
    out["pairs"] = pairs
    best = min(pairs, key=lambda p: p["cpu_lo"] + p["cpu_hi"])
    out["scaling"] = {**best, "eff_clamped": min(best["eff"], 1.0)}

    # --- index for the suite + maintenance at 8 cores ---------------------
    from visigoth_spark.build import (append_index, build_index,
                                      compact_index, merge_appends)
    from visigoth_spark.corpus import generate_corpus
    from visigoth_spark.query import SearchIndex

    spark = bench.make_session(CORES_HI, CORES_HI * 4)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="vg_sf1_main_", dir="/dev/shm")
    idx_dir = os.path.join(tmp, "idx")
    t0 = time.time()
    build_index(spark, spark.read.parquet(corpus_path), idx_dir,
                num_partitions=CORES_HI * 2, assume_sorted=True)
    out["suite_index_build_wall"] = round(time.time() - t0, 1)

    ix = SearchIndex(spark, idx_dir)
    ix.search("programación", "bm25", 10).collect()  # warm
    qs: dict[str, float] = {}
    t_suite = time.time()
    for _pass in range(2):
        for name, q, engine in bench.QUERY_SUITE:
            t1 = time.time()
            ix.search(q, engine, 10).collect()
            dt = round(time.time() - t1, 4)
            if name not in qs or dt < qs[name]:
                qs[name] = dt
    out["suite_wall"] = round((time.time() - t_suite) / 2, 2)
    out["queries"] = qs
    bm25 = [qs[n] for n, _, e in bench.QUERY_SUITE if e == "bm25"]
    out["bm25_p50"] = round(statistics.median(bm25), 4)
    out["bm25_p95"] = round(sorted(bm25)[-1], 4)
    # df bands: head = single high-df term, tail = low-df
    out["by_band"] = {
        "head": qs.get("bm25_head"), "2term_head": qs.get("bm25_2term_head"),
        "tail": qs.get("bm25_tail"), "2tail": qs.get("bm25_2tail"),
    }
    qd: dict[str, float] = {}
    ix.search("programación", "bm25", 10, route="spark").collect()
    for _pass in range(2):
        for name, q, engine in bench.QUERY_SUITE:
            t1 = time.time()
            ix.search(q, engine, 10, route="spark").collect()
            dt = round(time.time() - t1, 4)
            if name not in qd or dt < qd[name]:
                qd[name] = dt
    out["bm25_p50_distributed"] = round(statistics.median(
        [qd[n] for n, _, e in bench.QUERY_SUITE if e == "bm25"]), 4)

    # --- maintenance: append 2x5%, merge, compact --------------------------
    n_app = n_docs // 20
    extra = generate_corpus(2 * n_app, seed=1042)
    extra["url"] = "m-" + extra["url"]
    t0 = time.time()
    for half in (extra.iloc[:n_app], extra.iloc[n_app:]):
        append_index(spark,
                     spark.createDataFrame(half[["url", "text", "lang"]]),
                     idx_dir, num_partitions=CORES_HI)
    wall = time.time() - t0
    out["append_docs_per_sec"] = round(2 * n_app / wall, 1)
    out["append_wall"] = round(wall, 1)
    t0 = time.time()
    merge_appends(spark, idx_dir, num_partitions=CORES_HI * 2)
    out["merge_wall"] = round(time.time() - t0, 1)
    t0 = time.time()
    compact_index(spark, idx_dir, num_partitions=CORES_HI * 2)
    out["compact_wall"] = round(time.time() - t0, 1)
    ixc = SearchIndex(spark, idx_dir)
    ixc.search("programación", "bm25", 10).collect()
    t0 = time.time()
    ixc.search("programación java", "bm25", 10).collect()
    out["bm25_head_compacted"] = round(time.time() - t0, 4)
    out["seg_files_planned_per_query"] = bench._planned_per_query(ixc)
    out["seg_files_total"] = len(ixc._segfiles or [])
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()

    out["wall_total"] = round(time.time() - t_all, 1)
    with open(os.path.join(_REPO, "sf1_bench_out.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
