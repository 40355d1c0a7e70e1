"""Round-6 repro: reproduce the IN-SUITE query_batch collapse at local[8].

bench.py's query_batch after an in-session build measured 35-48 s at
local[8] (runA) while the isolated repro (tools/repro_batch.py) over a
prebuilt index runs the same 60 queries in ~8 s. This script replays the
suite shape (synthesize → persist → build → query in ONE session) and
times query_batch against BOTH the freshly-built index and the prebuilt
protocol index, so "fresh index dir" and "post-build session state" are
separated. Usage:

    python tools/repro_suite.py <cpus> [prebuilt_idx]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    prebuilt = sys.argv[2] if len(sys.argv) > 2 else f"/dev/shm/tesserae_scale_idx_{cpus}"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_REPLICAS", "96"))
    idx_dir = f"/dev/shm/tng_repro_suite_idx_{cpus}"

    import shutil

    shutil.rmtree(idx_dir, ignore_errors=True)

    import duckdb

    from tesserae_ng_spark.fixtures import make_queries
    from tesserae_ng_spark.sources.corpus import enrichment_vocab

    vocab_rows = duckdb.sql(
        f"""SELECT term, count(DISTINCT doc_id) AS df FROM (
              SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
              FROM '{sf_dir}/documents.parquet') WHERE term <> ''
            GROUP BY term ORDER BY df DESC, term"""
    ).fetchall()
    ids_n = duckdb.sql(
        f"SELECT min(doc_id), max(doc_id), count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    vocab = [(t, d * replicas) for t, d in vocab_rows] + [
        (t, d * replicas) for t, d in enrichment_vocab([ids_n[0], ids_n[1]], ids_n[2])
    ]
    vocab.sort(key=lambda p: (-p[1], p[0]))
    queries = make_queries(vocab, n=60)

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory", os.environ.get("TNG_DRIVER_MEM", "8g"))
    )
    # TNG_DRIVER_JAVA_OPTS: A/B the driver JVM flags (e.g. -Xms24g to pin
    # the heap committed — G1 heap uncommit on this lazily-backed guest
    # turns later refaults into 100-400 us/page stalls, see BENCH notes)
    jopts = os.environ.get("TNG_DRIVER_JAVA_OPTS")
    if jopts:
        b = b.config("spark.driver.extraJavaOptions", jopts)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    spark = b.getOrCreate()
    from tesserae_ng_spark.index.builder import build_index
    from tesserae_ng_spark.query.search import search_batch
    from tesserae_ng_spark.sources.corpus import synthesize_corpus

    out = {"cpus": cpus}
    corpus = synthesize_corpus(spark, sf_dir, replicas=replicas, enrich_vocab=True).persist()
    corpus.count()
    t0 = time.time()
    res = build_index(
        spark, corpus, idx_dir,
        n_parts=int(os.environ.get("SPARK_GRAFT_NPARTS", "2")),
        target_postings_per_salt=1 << 14, n_buckets=16,
    )
    out["build_s"] = round(time.time() - t0, 3)
    out["docs_per_sec"] = round(res.n_docs / out["build_s"], 2)

    # staged probes: partition the post-build first-query cost into
    # (a) bare RDD job overhead, (b) python-side import of the query
    # stack, (c) per-worker index open + dictionary load, (d) scoring
    sc = spark.sparkContext
    t0 = time.time()
    sc.parallelize(range(cpus), cpus).map(lambda x: x).count()
    out["probe_bare_rdd_s"] = round(time.time() - t0, 3)

    def _imp(x):
        from tesserae_ng_spark.query.search import get_searcher  # noqa: F401
        return x

    t0 = time.time()
    sc.parallelize(range(cpus), cpus).map(_imp).count()
    out["probe_import_s"] = round(time.time() - t0, 3)

    def _open(x, d=idx_dir):
        from tesserae_ng_spark.query.search import get_searcher
        s = get_searcher(d)
        return s.reader.n_docs

    t0 = time.time()
    sc.parallelize(range(cpus), cpus).map(_open).count()
    out["probe_open_s"] = round(time.time() - t0, 3)

    for tag, d in (("fresh", idx_dir), ("prebuilt", prebuilt)):
        t0 = time.time()
        hits = search_batch(spark, d, queries, k=10).count()
        out[f"qb_cold_{tag}_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        search_batch(spark, d, queries, k=10).count()
        out[f"qb_warm_{tag}_s"] = round(time.time() - t0, 3)
        out[f"hits_{tag}"] = hits
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
