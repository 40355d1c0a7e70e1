"""Host fingerprint for benchmark provenance.

Round 6 discovered that the sandbox HOST changes between rounds: the
round-5 box had a 260 MiB L3, ~57 GiB/s 8-proc stream bandwidth and a
disk fast enough to build 480k docs in 32 s; the round-6 box has a
105 MiB L3, ~42 GiB/s, and a block device that sustains ~6 MB/s fsync'd
writes (which made every disk-touching phase look 7× slower until
benchmarks moved their scratch/index dirs to tmpfs). Absolute numbers
are therefore not comparable across rounds unless each run records the
box it ran on — this probe captures that fingerprint as one JSON line.

Usage: python tools/host_probe.py  (≈20 s; ~10 s of that is the fsync
write test at the throttled rate)
"""

from __future__ import annotations

import json
import os
import subprocess
import time

import numpy as np


def lscpu_fields() -> dict:
    out = {}
    try:
        txt = subprocess.run(
            ["lscpu"], capture_output=True, text=True, timeout=30
        ).stdout
        for line in txt.splitlines():
            k, _, v = line.partition(":")
            k, v = k.strip(), v.strip()
            if k in ("Model name", "CPU(s)", "L2 cache", "L3 cache",
                     "NUMA node(s)"):
                out[k] = v
    except Exception:
        pass
    return out


def steal_pct(seconds: float = 3.0) -> float:
    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0

    t0, s0 = snap()
    time.sleep(seconds)
    t1, s1 = snap()
    return round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)


def disk_fsync_mbs(path: str = "/tmp/_host_probe_dd", mb: int = 64) -> float:
    buf = b"x" * (1 << 20)
    t0 = time.time()
    with open(path, "wb") as f:
        for _ in range(mb):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    dt = time.time() - t0
    os.remove(path)
    return round(mb / dt, 1)


def triad_1core_gibs(mb: int = 64, seconds: float = 4.0) -> float:
    n = (mb << 20) // 8
    a = np.ones(n)
    b = np.ones(n)
    c = np.empty(n)
    for _ in range(2):
        np.multiply(a, 1.000001, out=c)
        c += b
    t0 = time.time()
    passes = 0
    while time.time() - t0 < seconds:
        np.multiply(a, 1.000001, out=c)
        c += b
        passes += 1
    return round(passes * 3 * mb / 1024.0 / (time.time() - t0), 2)


def main():
    with open("/proc/meminfo") as f:
        mem_kb = int(f.readline().split()[1])
    out = {
        "lscpu": lscpu_fields(),
        "mem_gib": round(mem_kb / (1 << 20), 1),
        "steal_pct_idle": steal_pct(),
        # the block-device throttle is a token bucket: small writes ride
        # the burst allowance, sustained writes collapse to the refill
        # rate (r6 box: ~100 MB/s burst vs ~6 MB/s sustained)
        "disk_fsync_burst_mbs": disk_fsync_mbs(mb=64),
        "disk_fsync_sustained_mbs": disk_fsync_mbs(mb=384),
        "triad_1core_gibs": triad_1core_gibs(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
