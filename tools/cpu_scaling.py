#!/usr/bin/env python3
"""Measure this host's RAW cpu scaling (no Spark): N busy-loop processes,
aggregate throughput. Justifies the bench's choice of parallelism levels for
the N->4N scaling-efficiency evidence (BASELINE.md): on this sandbox VM the
aggregate peaks around 12-16 processes and DEGRADES at 32, i.e. the 32
advertised vCPUs are oversubscribed ~2.5x. Any wall-clock comparison above
the host's physical-core budget measures the hypervisor, not the engine.

Usage: python tools/cpu_scaling.py [n_procs ...]   (default: 1 2 4 8 16 32)
"""

import multiprocessing as mp
import sys
import time

N = 20_000_000


def burn(n: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i
    return time.time() - t0


def measure(nproc: int) -> float:
    t0 = time.time()
    with mp.Pool(nproc) as p:
        p.map(burn, [N] * nproc)
    wall = time.time() - t0
    agg = nproc * N / wall / 1e6
    print(f"{nproc:3d} procs: wall={wall:6.2f}s "
          f"aggregate={agg:6.0f}M iters/s  per-proc={agg/nproc:5.1f}M")
    return agg


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    for n in levels:
        measure(n)
