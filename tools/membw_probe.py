"""Memory-bandwidth scaling ceiling probe (scaling-protocol control).

The N→4N criterion is evidenced on one box by running 2 vs 8 cores; cores
share that box's memory system, so any memory-bound stage inherits the
box's aggregate-bandwidth scaling ceiling — a physical property a real 4N
-executor cluster (4× memory channels) does not have. This probe measures
that ceiling with two synthetic workloads, no engine code:

- stream: a triad-like pass (c = a*x + b) over per-process 64 MiB float64
  arrays — pure memory traffic, the worst case for core scaling here.
- compute: an integer xorshift loop on a tiny in-cache array — pure
  ALU/register work, the best case (should scale ~1.0).

Usage: python tools/membw_probe.py  → one JSON line with per-level
aggregate throughput and the 2→8 efficiency for both workloads.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 64
SECONDS = 6.0


def stream_worker(_):
    n = (ARR_MB << 20) // 8
    a = np.ones(n)
    b = np.ones(n)
    c = np.empty(n)
    x = 1.000001
    # warm-up passes OUTSIDE the timed window: first-touch page faults on
    # this VM cost ~300 µs/page and would otherwise be the whole
    # measurement — the probe targets steady-state bandwidth
    for _ in range(2):
        np.multiply(a, x, out=c)
        c += b
    t0 = time.time()
    passes = 0
    while time.time() - t0 < SECONDS:
        np.multiply(a, x, out=c)
        c += b
        passes += 1
    dt = time.time() - t0
    # 3 arrays touched per pass (read a, read b, write c) × 2 ops ≈ 4
    # effective streams of ARR_MB; report conservative 3×
    return passes * 3 * ARR_MB / 1024.0 / dt  # GiB/s per process


def compute_worker(_):
    a = np.arange(4096, dtype=np.uint64)
    t0 = time.time()
    iters = 0
    while time.time() - t0 < SECONDS:
        for _ in range(200):
            a ^= a << np.uint64(13)
            a ^= a >> np.uint64(7)
            a ^= a << np.uint64(17)
        iters += 200
    dt = time.time() - t0
    return iters * 4096 * 3 / dt / 1e9  # G-ops/s per process


def gather_worker_small(_):
    return _gather(8)


def gather_worker_large(_):
    return _gather(64)


def _gather(mb: int):
    """Random gather over a per-process ``mb`` MiB table — the engine's
    scoring shape (scatter-add into accumulators, posting-id gathers).
    A working set that fits the per-process SHARE of the last-level cache
    at 2 procs but not at 8 isolates LLC-capacity contention from DRAM
    bandwidth (the ``stream`` workload)."""
    n = (mb << 20) // 8
    table = np.ones(n)
    rng = np.random.RandomState(0)
    idx = rng.randint(0, n, size=1 << 20)
    acc = np.zeros(1 << 20)
    for _ in range(2):
        np.add(acc, table[idx], out=acc)  # warm-up / fault-in
    t0 = time.time()
    passes = 0
    while time.time() - t0 < SECONDS:
        np.add(acc, table[idx], out=acc)
        passes += 1
    dt = time.time() - t0
    return passes * (1 << 20) / dt / 1e6  # M-gathers/s per process


def run(worker, nproc: int) -> float:
    ctx = mp.get_context("spawn")
    with ctx.Pool(nproc) as p:
        vals = p.map(worker, range(nproc))
    return float(sum(vals))


def main():
    out = {}
    for name, worker in (
        ("stream", stream_worker),
        ("compute", compute_worker),
        ("gather_8mb", gather_worker_small),
        ("gather_64mb", gather_worker_large),
    ):
        agg = {}
        for nproc in (2, 8):
            agg[nproc] = round(run(worker, nproc), 2)
        out[name] = {
            "agg_2proc": agg[2],
            "agg_8proc": agg[8],
            "eff_2_to_8": round(agg[8] / agg[2] / 4.0, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
