"""Transparent-huge-page first-touch probe (round-5 allocator finding).

This VM runs khugepaged at 100% of a core (observed during any busy
window), and the first touch of a fresh anonymous arena is pathologically
slow while it runs: a 256 MB numpy ones() measured 65.6 s on first touch
vs 0.18 s on reuse — and 0.13 s in the SAME process after
``prctl(PR_SET_THP_DISABLE)``. Hugepage allocation/compaction stalls in
the fault path dwarf the actual work by ~500×.

The engine therefore opts its processes out of THP in
memtune.tune_allocator (the flag is per-mm and inherited across fork, so
Spark python workers forked from a tuned daemon keep it). This probe
reproduces the measurement standalone so the number in BENCH/BASELINE.md
can be re-checked on any host.

Usage: python tools/thp_probe.py [mb]   (default 128; spawns two fresh
subprocesses so both sides measure a true first touch)
"""

from __future__ import annotations

import json
import subprocess
import sys

_CHILD = r"""
import ctypes, sys, time
disable = sys.argv[1] == "1"
if disable:
    ctypes.CDLL("libc.so.6").prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE
import numpy as np
mb = int(sys.argv[2])
t0 = time.time()
a = np.ones((mb << 20) // 8, dtype=np.uint64)
first = time.time() - t0
del a
t0 = time.time()
a = np.ones((mb << 20) // 8, dtype=np.uint64)
reuse = time.time() - t0
print(round(first, 3), round(reuse, 3))
"""


def _run(disable: bool, mb: int) -> tuple[float, float]:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, "1" if disable else "0", str(mb)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    a, b = out.stdout.split()
    return float(a), float(b)


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    on_first, on_reuse = _run(False, mb)
    off_first, off_reuse = _run(True, mb)
    try:
        mode = open("/sys/kernel/mm/transparent_hugepage/enabled").read().strip()
    except OSError:
        mode = "unknown"
    print(
        json.dumps(
            {
                "mb": mb,
                "thp_mode": mode,
                "thp_on_first_touch_s": on_first,
                "thp_on_reuse_s": on_reuse,
                "thp_disabled_first_touch_s": off_first,
                "thp_disabled_reuse_s": off_reuse,
            }
        )
    )


if __name__ == "__main__":
    main()
