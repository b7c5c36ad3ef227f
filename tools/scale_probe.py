#!/usr/bin/env python3
"""One-off corpus-size scaling probe: build + query at N docs (default
6,000,000 — 10x the sf0.1 bench corpus) at the bench's hi parallelism.
Evidence that build throughput is size-linear (the docs/s at 10x the
corpus should match the bench number within window noise) and that query
latency stays flat (head-term df grows 10x but the kernels stay
bucket-bounded). Prints ONE JSON line.

Usage: python tools/scale_probe.py [--docs N] [--cores C]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("PYTHONPATH", _REPO)

import bench  # noqa: E402  (reuses corpus cache + session + cpu helpers)


def main() -> None:
    docs = 6_000_000
    cores = 8
    if "--docs" in sys.argv:
        docs = int(sys.argv[sys.argv.index("--docs") + 1])
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])

    t0 = time.time()
    corpus_path = bench.get_corpus_path(docs)
    gen_wall = time.time() - t0
    from visigoth_spark.query import SearchIndex

    out = tempfile.mkdtemp(prefix="vg_scale_", dir="/dev/shm")
    idx_dir = os.path.join(out, "idx")
    cpu0 = bench._cpu_tree_seconds()
    # one_build times the build itself (its fresh session + worker warmup
    # happen before its clock starts)
    dps = bench.one_build(corpus_path, docs, cores, out)
    build_wall = docs / dps
    build_cpu = bench._cpu_tree_seconds() - cpu0

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    idx = SearchIndex(spark, idx_dir)
    queries = [("bm25_2term_head", "programación java", "bm25"),
               ("bm25_head", "curso", "bm25"),
               ("bm25_tail", "huevos", "bm25"),
               ("hits_2term", "programacion web", "hits")]
    idx.search("programación", "bm25", 10).collect()  # warm
    lat: dict[str, float] = {}
    for _ in range(2):
        for name, q, eng in queries:
            t1 = time.time()
            idx.search(q, eng, 10).collect()
            dt = round(time.time() - t1, 4)
            if name not in lat or dt < lat[name]:
                lat[name] = dt
    ex = idx.explain_query("programación java")
    result = {
        "metric": "scale_probe_build_docs_per_sec",
        "value": round(docs / build_wall, 1),
        "unit": "docs/sec",
        "n_docs": docs,
        "cores": cores,
        "gen_wall": round(gen_wall, 1),
        "build_wall": round(build_wall, 1),
        "build_cpu": round(build_cpu, 1),
        "queries": lat,
        "head_term_dfs": ex["dfs"],
        "route_head_query": ex["route"],
        "n_postings": idx.stats["n_postings"],
        "bytes_blob": idx.stats["bytes_blob"],
        "bytes_per_posting": round(
            idx.stats["bytes_blob"] / idx.stats["n_postings"], 3),
    }
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
