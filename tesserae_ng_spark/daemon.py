"""Pre-importing PySpark worker daemon (guide §4.5: heavyweight init once,
amortized — applied to the *interpreter state* itself).

PySpark's daemon forks one child per task worker; forked children inherit
every module already imported by the parent via copy-on-write. The stock
``pyspark.daemon`` imports almost nothing, so EVERY fresh worker pays the
full import chain on its first task (measured here: ~0.25 s pyspark.worker
+ ~0.4 s pyarrow/pandas/numpy + ~0.05 s this package — ~0.7 s per worker,
and a 32-worker cold wave repeats it 32×). This drop-in daemon module
(``spark.python.daemon.module``) performs those imports ONCE in the daemon
before the first fork, so workers start with a warm interpreter.

It also applies the allocator tuning (memtune.py) in the daemon: the
mallopt thresholds, the THP opt-out prctl, and pyarrow's system-allocator
pool are all inherited across fork, so workers no longer each re-run the
tuning on first import.

Failure posture: every pre-import is best-effort — a missing optional
library must not kill the daemon (worker-side imports would then fail
with their own, clearer error). The daemon protocol itself is delegated
verbatim to ``pyspark.daemon.manager``.
"""

from __future__ import annotations


def _preimport() -> None:
    try:
        from tesserae_ng_spark.memtune import tune_allocator

        # opt-in via TNG_MALLOC_TUNE (get_spark exports it before the JVM
        # launches, so the daemon sees it); forks inherit the tuned state
        tune_allocator()
    except Exception:
        pass
    for mod in (
        "numpy",
        "pandas",
        "pyarrow",
        "pyarrow.dataset",
        "pyarrow.compute",
        "pyspark.serializers",
        "pyspark.worker",
        "tesserae_ng_spark.functions.analysis",
        "tesserae_ng_spark.index.codec",
        "tesserae_ng_spark.index.encode",
        "tesserae_ng_spark.query.search",
        "tesserae_ng_spark.query.sharded",
    ):
        try:
            __import__(mod)
        except Exception:
            pass


if __name__ == "__main__":
    _preimport()
    from pyspark.daemon import manager

    manager()
