"""Allocator tuning for Arrow/numpy-heavy worker processes.

On VMs with lazily-backed guest memory (first-touch page faults exiting to
the host), numpy's large transient arrays are pathological with glibc's
default malloc: every allocation over the 128 KiB mmap threshold is a
fresh mmap whose pages fault on first touch and are munmapped on free —
measured here at ~300 µs/page, turning a 16 ms varint decode into 1.2 s,
and 32 Spark python workers doing mmap/munmap cycles into a cross-process
TLB-shootdown storm (a large part of round 1's "memory bandwidth wall").

Fix: pin M_MMAP_THRESHOLD high so large blocks come from the brk heap,
which stays faulted at its high-water mark, and pre-fault a small arena.
Measured effect: first-call varint decode 4.6 s → 38 ms in a fresh
process; steady-state behavior unchanged.

OPT-IN, not ambient: importing the library must not mutate process-global
allocator state (ADVICE r2). The engine's own entry points
(session.get_spark, IndexReader, bench) call ``tune_allocator(force=True)``;
Spark executor python workers — which import this package when unpickling
UDFs — get it via the TNG_MALLOC_TUNE=1 env var that get_spark exports
before the JVM launches. A plain ``import tesserae_ng_spark`` in a host
application applies nothing. TNG_NO_MALLOC_TUNE=1 overrides everything.
No-op off glibc.
"""

from __future__ import annotations

import os

_done = False

_TRUTHY = ("1", "true", "yes", "on")


def env_opt_in() -> bool:
    """TNG_MALLOC_TUNE parsed explicitly: only 1/true/yes/on enable tuning
    — TNG_MALLOC_TUNE=0 (or any other value) disables it, rather than a
    bare truthiness check where every non-empty string enabled (ADVICE r3).
    TNG_NO_MALLOC_TUNE stays the hard override."""
    return os.environ.get("TNG_MALLOC_TUNE", "").strip().lower() in _TRUTHY


def tune_allocator(warm_mb: int = 8, force: bool = False) -> bool:
    """Pin the malloc mmap threshold and pre-fault ``warm_mb`` of heap.

    Applies only when ``force`` (engine entry points) or TNG_MALLOC_TUNE is
    explicitly truthy (Spark python workers, exported by get_spark).
    Idempotent per process; returns True if tuning was applied.
    """
    global _done
    if _done or os.environ.get("TNG_NO_MALLOC_TUNE"):
        return False
    if not force and not env_opt_in():
        return False
    _done = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        # opt out of transparent huge pages for this process (inherited
        # across fork, so Spark python workers forked from a tuned daemon
        # keep it): on this VM khugepaged runs at 100% of a core and
        # first-touch of a fresh 256 MB arena measured 65 s with THP
        # participation vs 0.13 s with PR_SET_THP_DISABLE — hugepage
        # allocation/compaction stalls dwarf the work being allocated
        # for. Harmless where THP is quiet; errors ignored (non-Linux).
        PR_SET_THP_DISABLE = 41
        try:
            libc.prctl(PR_SET_THP_DISABLE, 1, 0, 0, 0)
        except Exception:
            pass
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        if libc.mallopt(M_MMAP_THRESHOLD, 1 << 30) != 1:
            return False
        # calling mallopt at all disables glibc's dynamic threshold
        # adjustment, freezing M_TRIM_THRESHOLD at its 128 KiB default —
        # every free of a top-of-heap block then shrinks brk and the next
        # large alloc page-faults from scratch (measured ~1 s per repeated
        # 64 MiB arena on this VM). Pin trim high so the heap stays
        # faulted at its high-water mark.
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        return False
    try:
        # pyarrow's default (jemalloc/mimalloc) pool mmaps + madvises its
        # arenas independently of glibc — the same first-touch churn on
        # every cold parquet fetch (measured: cold 3-term fetch 5.6 s →
        # 0.9 s after routing Arrow through the now-heap-backed system
        # allocator). Harmless where guest memory is eagerly backed.
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass
    prefault(warm_mb)
    return True


_prefaulted_mb = 0


def prefault(mb: int) -> None:
    """Grow + touch the heap to ≥ ``mb`` MiB so subsequent transient numpy
    arrays reuse already-faulted pages. Tracks the per-process high-water
    mark: a second IndexReader in the same process (sharded phase 1 opens
    one per shard) skips the ~1 s arena touch instead of repeating it."""
    global _prefaulted_mb
    if os.environ.get("TNG_NO_MALLOC_TUNE") or mb <= _prefaulted_mb:
        return
    try:
        import numpy as np

        warm = np.ones((mb << 20) // 8, dtype=np.uint64)
        del warm
    except Exception:
        return  # nothing faulted — leave the mark so a retry can succeed
    # record the high-water mark only after the touch succeeded (ADVICE r4:
    # recording first made an allocation failure permanently skip prefault)
    _prefaulted_mb = mb
