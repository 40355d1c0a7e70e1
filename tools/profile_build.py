"""Per-job wall breakdown of the protocol-shape index build.

Runs the exact bench.py build (96-replica sf0.1 corpus, NPARTS=2) at one
parallelism level with INFO logging and prints per-Spark-job walls plus
the phase totals, so the scaling question ("what stops 2→8 from being
4x?") is answered with measured stage anatomy instead of guesses.

Usage: python tools/profile_build.py <cpus> [out_dir]
  stderr carries the Spark INFO log; pipe through
  `grep -E "Job [0-9]+ finished"` for the per-job lines.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/tng_profile_idx_{cpus}"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("TNG_MALLOC_TUNE", "1")

    from tesserae_ng_spark.index.builder import build_index
    from tesserae_ng_spark.session import get_spark
    from tesserae_ng_spark.sources.corpus import synthesize_corpus

    spark = get_spark(
        "profile-build", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("INFO")
    corpus = synthesize_corpus(
        spark, sf_dir, replicas=int(os.environ.get("SPARK_GRAFT_REPLICAS", "96")), enrich_vocab=True
    ).persist()
    n = corpus.count()
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = build_index(
        spark, corpus, out,
        n_parts=int(os.environ.get("SPARK_GRAFT_NPARTS", "2")),
        target_postings_per_salt=1 << 14, n_buckets=16,
    )
    wall = time.time() - t0
    print(
        f"PROFILE cpus={cpus} n_docs={n} wall={wall:.2f}s "
        f"docs_per_sec={res.n_docs / wall:.1f} phases={res.phases}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
