"""Round-6 repro: executor-side batch-query throughput at one parallelism
level over a PREBUILT index (isolates the query path from the build and
from protocol context). Usage:

    python tools/repro_batch.py <cpus> [idx_dir] [n_queries]

Prints one JSON line with cold/warm wall times for the 60-query
reference batch shape used by bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    idx_dir = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/tesserae_scale_idx_8"
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_REPLICAS", "96"))

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
    queries = make_queries(vocab, n=n_q)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory", os.environ.get("TNG_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    from tesserae_ng_spark.query.search import search_batch

    t0 = time.time()
    hits = search_batch(spark, idx_dir, queries, k=10).count()
    cold = time.time() - t0
    t0 = time.time()
    search_batch(spark, idx_dir, queries, k=10).count()
    warm = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_queries": n_q,
                "cold_s": round(cold, 3),
                "warm_s": round(warm, 3),
                "cold_qps": round(n_q / cold, 2),
                "warm_qps": round(n_q / warm, 2),
                "hits": hits,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
