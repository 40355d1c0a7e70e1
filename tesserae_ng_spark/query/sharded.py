"""Distributed sharded search: N independent shard indexes, one answer.

The 10^12-doc deployment cannot be one index: docs partition into shard
groups (by url hash / crawl segment), each built independently with the
resumable builder. Query time follows Solr's distributed-IDF two-phase
shape (public Solr semantics — the reference's deployment model):

  phase 1 (cheap, metadata only): per-shard dictionary lookups for the
    batch's query terms + per-shard stats.json → GLOBAL n_docs, avg_dl and
    per-term df (shards partition docs disjointly, so sums are exact).
  phase 2 (distributed): every (shard × query-slice) task scores its shard
    with the GLOBAL stats (Searcher(global_stats=...)) so scores are
    comparable across shards; per-shard top-k candidates flow back.
  merge: per query, rank candidates by (score desc, doc_id asc) and keep
    k — rank-identical to a single index over the union of the shards
    (pinned by tests/test_sharded.py).

Scale shape: phase 1 touches dictionaries only (KB per shard); phase 2 is
embarrassingly parallel (shards × slices tasks over immutable indexes);
the merge moves ≤ shards × queries × k rows — a per-query-partitioned
window, never a global sort.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tesserae_ng_spark.functions.analysis import analyze_query
from tesserae_ng_spark.query.search import MIN_QUERIES_PER_SLICE, get_searcher


def global_shard_stats(index_dirs: list[str], terms: list[str]) -> dict:
    """Phase 1: exact global (n_docs, avg_dl, per-term df) across shards.

    Dictionary lookups only — no postings are read. Runs driver-side (or
    anywhere): per-shard dictionaries are small and pyarrow-filtered.
    """
    n_docs = 0
    total_tokens = 0
    df: dict[str, int] = {}
    for d in index_dirs:
        with open(os.path.join(d, "stats.json")) as f:
            st = json.load(f)
        n_docs += st["n_docs"]
        total_tokens += st["total_tokens"]
        rows = get_searcher(d).reader.lookup(terms)
        for t, row in rows.items():
            df[t] = df.get(t, 0) + int(row["df"])
    return {
        "n_docs": n_docs,
        "avg_dl": (total_tokens / n_docs) if n_docs else 0.0,
        "df": df,
    }


def search_sharded(spark, index_dirs: list[str], queries: list[dict], k: int = 10):
    """Distributed BM25 over sharded indexes → DataFrame(query_id, rank,
    doc_id, score), rank-identical to a single union index."""
    sc = spark.sparkContext
    bad = [q for q in queries if q.get("mode", "bm25") != "bm25"]
    if bad:
        raise ValueError(
            "search_sharded supports bm25 only: phrase df is computed from "
            "matches (shard-local would skew idf) and stored block bounds "
            f"are shard-local — got mode(s) {sorted({q['mode'] for q in bad})}; "
            "run phrase/proximity via search_batch per shard group"
        )
    all_terms: set[str] = set()
    for q in queries:
        all_terms.update(analyze_query(q["query_text"]))
    stats = global_shard_stats(index_dirs, sorted(all_terms))
    stats_bc = sc.broadcast(stats)

    n_slices = max(
        1,
        min(
            max(1, sc.defaultParallelism // max(1, len(index_dirs))),
            (len(queries) + MIN_QUERIES_PER_SLICE - 1) // MIN_QUERIES_PER_SLICE,
        ),
    )
    slices = [queries[i::n_slices] for i in range(n_slices)]
    tasks = [(d, s) for d in index_dirs for s in slices if s]

    def run_task(task):
        index_dir, qs = task
        searcher = get_searcher(index_dir)
        gs = stats_bc.value
        terms: set[str] = set()
        for q in qs:
            terms.update(analyze_query(q["query_text"], searcher.lang))
        if terms:
            searcher.reader.fetch(sorted(terms))  # one scan per task
        for q in qs:
            # uniform k across the batch: the merge window cuts at the same
            # k every shard produced, so per-query result sets stay exact
            for hit in searcher.search(q["query_text"], k=k, global_stats=gs):
                yield (q["query_id"], hit.doc_id, hit.score)

    rdd = sc.parallelize(tasks, len(tasks)).flatMap(run_task)
    cand = spark.createDataFrame(rdd, "query_id long, doc_id long, score double")
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= F.lit(k))
        .select("query_id", "rank", "doc_id", "score")
    )
