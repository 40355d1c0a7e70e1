"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tesserae_ng_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # allocator tuning is opt-in (memtune.py): tune this driver process and
    # export the env var BEFORE the JVM launches so local-mode python
    # workers (forked under the JVM) inherit it; spark.executorEnv carries
    # it to real-cluster executors.
    from tesserae_ng_spark.memtune import tune_allocator

    os.environ.setdefault("TNG_MALLOC_TUNE", "1")
    tune_allocator(force=True)
    # propagate the RESOLVED value: a user-set TNG_MALLOC_TUNE=0 reaches
    # executors as 0 (disabled) instead of being overwritten with 1
    tune_env = os.environ["TNG_MALLOC_TUNE"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # match local cores, not the 200 default — avoids tiny-partition
        # overhead at sandbox scale; on a real cluster AQE coalescing takes
        # over anyway.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8g default (was 24g): on hosts that overcommit guest RAM, an
        # oversized G1 heap's commit/uncommit cycling puts the BOX into
        # fault-stall windows (measured: post-build shrink of a 24g heap
        # → 20-100× slower page faults box-wide for ~40 s, sporadically
        # collapsing query phases; BENCH/BASELINE.md round-6 A/B). Size
        # the heap to the work — SPARK_DRIVER_MEM overrides.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.executorEnv.TNG_MALLOC_TUNE", tune_env)
    )
    # SPARK_GRAFT_LOCAL_DIR: shuffle/spill scratch location. Round-6 note:
    # this sandbox's block device sustains ~6 MB/s writes (measured,
    # BENCH/BASELINE.md "host disk" section) — two orders of magnitude
    # below round-5's host — so benchmarks route scratch + index dirs to
    # tmpfs to keep measuring the ENGINE rather than a throttled virtio
    # disk. Production writes go to object storage whose bandwidth scales
    # with the cluster.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    # pre-importing worker daemon (daemon.py; guide §4.5): forked python
    # workers inherit numpy/pyarrow/pandas/engine imports + tuned allocator
    # state from the daemon instead of each paying ~0.7 s on first task.
    # Local mode only (the daemon process inherits this driver's
    # PYTHONPATH, exported below, so `python -m tesserae_ng_spark.daemon`
    # resolves); cluster deployments keep the stock daemon unless they ship
    # the package and opt in themselves. TNG_FAST_DAEMON=0 disables.
    if master.startswith("local") and os.environ.get(
        "TNG_FAST_DAEMON", "1"
    ).strip().lower() not in ("0", "false", "no", "off"):
        pkg_parent = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        pp = os.environ.get("PYTHONPATH", "")
        if pkg_parent not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_parent + (os.pathsep + pp if pp else "")
            )
        b = b.config("spark.python.daemon.module", "tesserae_ng_spark.daemon")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_jvm(spark)
    return spark


_JVM_WARMED = False


def _warm_jvm(spark) -> None:
    """One-time JVM warm-up at session open (r7, guide §7.3 diagnosis).

    Driver thread dumps showed the FIRST collation-aware string expression
    in a JVM blocking every scan task on the CollationAwareUTF8String
    class-initialization monitor while ICU loads its case-map tables from
    the jar (seconds on a cold page cache with this sandbox's ~6 MB/s
    disk), and the first few whole-stage-codegen stages compiling janino
    cold (C2 itself still compiling the compiler). Both are per-JVM
    one-time costs that otherwise land inside whichever query happens to
    run first. One tiny query at session open (computes nothing from any
    input, caches nothing) moves them to initialization, where they
    belong. Skipped on subsequent sessions in the same JVM."""
    global _JVM_WARMED
    if _JVM_WARMED:
        return
    _JVM_WARMED = True
    try:
        (
            spark.range(2)
            .selectExpr(
                "id", "lower('Éa') || upper('éA') || initcap('é b') AS s"
            )
            .groupBy("s")
            .count()
            .orderBy("count")
            .limit(1)
            .collect()
        )
    except Exception:
        pass  # warm-up is best-effort, never session-fatal
