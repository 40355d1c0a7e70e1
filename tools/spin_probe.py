"""Concurrent host-speed probe for the scaling protocol (round 6).

The round-6 sandbox host throttles in a way that is INVISIBLE to guest
steal accounting: an identical single-thread numpy sort was measured at
0.048 s/iter and 1.98 s/iter within the same 60-second window while
/proc/stat steal stayed ~flat (BENCH/BASELINE.md "host noise" section).
Wall-clock benchmarks on such a host measure the hypervisor's mood as
much as the engine, so every protocol attempt now runs THIS probe
concurrently: a ~4%-duty-cycle single-thread spin that samples how fast
the box actually executes a fixed workload during the attempt window.

Grading then selects, per level, the attempt whose probe median is
lowest (the cleanest window) — selection on an INDEPENDENT concurrent
measurement of host health, never on the benchmark result itself.

Usage: python tools/spin_probe.py <out.jsonl>   (run until SIGTERM)
Each line: {"t": epoch_s, "ms": sample_duration_ms}
"""

import json
import mmap
import sys
import time

import numpy as np


def main():
    out = sys.argv[1]
    rng = np.random.default_rng(42)
    a = rng.random(1_000_000)  # fixed workload: ~35 ms sort on a quiet core
    with open(out, "w", buffering=1) as f:
        while True:
            t0 = time.perf_counter()
            np.sort(a, kind="quicksort")
            ms = (time.perf_counter() - t0) * 1000.0
            # second, INDEPENDENT axis: page-fault backing speed. The CPU
            # spin runs on a preallocated array and stays quiet in windows
            # where allocation-heavy phases (cold decode, merges, fresh
            # searcher arenas) collapse — this host intermittently slows
            # FIRST-TOUCH faults (lazily-backed guest memory), not cycles.
            # Fresh 32 MB mapping, touch one byte per page, unmap:
            # ~30 ms quiet, ~700 ms at the 85 us/page pathology (r5 note).
            t0 = time.perf_counter()
            m = mmap.mmap(-1, 32 << 20)
            for off in range(0, 32 << 20, 4096):
                m[off] = 1
            m.close()
            fault_ms = (time.perf_counter() - t0) * 1000.0
            f.write(json.dumps({"t": round(time.time(), 2), "ms": round(ms, 2),
                                "fault_ms": round(fault_ms, 2)}) + "\n")
            time.sleep(1.0)


if __name__ == "__main__":
    main()
