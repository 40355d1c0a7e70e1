"""Sharded distributed search ≡ single union index (rank + score identity).

The 10^12-doc deployment shape: docs partition into independently-built
shard indexes; query time computes GLOBAL (n_docs, avg_dl, df) from shard
metadata (Solr distributed-IDF analog), scores every shard under those
stats, and merges per-shard top-k. This suite pins the whole point:
results are rank-identical — same doc ids, same scores — as one index
over the union of the shards.
"""

import pytest
from pyspark.sql import functions as F

from tesserae_ng_spark.index.builder import build_index
from tesserae_ng_spark.query.search import Searcher
from tesserae_ng_spark.query.sharded import global_shard_stats, search_sharded

N_SHARDS = 2


@pytest.fixture(scope="module")
def indexes(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("sharded")
    shard_dirs = []
    for i in range(N_SHARDS):
        part = corpus.filter(
            F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)) == i
        )
        out = str(base / f"shard{i}")
        build_index(spark, part, out, n_parts=1, block_size=16, n_buckets=2,
                    target_postings_per_salt=64)
        shard_dirs.append(out)
    union_dir = str(base / "union")
    build_index(spark, corpus, union_dir, n_parts=2, block_size=16,
                n_buckets=2, target_postings_per_salt=64)
    return shard_dirs, union_dir


def test_global_stats_match_union(indexes):
    shard_dirs, union_dir = indexes
    u = Searcher(union_dir)
    terms = ["join", "hash", "scan", "zzmissing"]
    gs = global_shard_stats(shard_dirs, terms)
    assert gs["n_docs"] == u.reader.n_docs
    assert abs(gs["avg_dl"] - u.reader.avg_dl) < 1e-9
    udf_rows = u.reader.lookup(terms)
    for t in terms:
        assert gs["df"].get(t, 0) == (udf_rows[t]["df"] if t in udf_rows else 0)


def test_sharded_rank_identical_to_union(spark, indexes):
    shard_dirs, union_dir = indexes
    union = Searcher(union_dir)
    queries = [
        dict(query_id=i, query_text=qt, mode="bm25", k=10)
        for i, qt in enumerate(
            ["join", "hash scan", "sort merge join", "table hash", "scan scan join"]
        )
    ]
    got = search_sharded(spark, shard_dirs, queries, k=10).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in queries:
        want = union.search(q["query_text"], k=10)
        rows = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
        assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
            (h.doc_id, round(h.score, 9)) for h in want
        ], q["query_text"]


def test_sharded_phrase_proximity_rank_identical(spark, indexes):
    shard_dirs, union_dir = indexes
    union = Searcher(union_dir)
    queries = [
        dict(query_id=0, query_text="hash join", mode="phrase", k=10),
        dict(query_id=1, query_text="sort merge", mode="phrase", k=10),
        dict(query_id=2, query_text="hash join", mode="proximity", k=10, window=5),
        dict(query_id=3, query_text="sort merge join", mode="proximity", k=10, window=8),
        dict(query_id=4, query_text="join zzmissing", mode="phrase", k=10),
    ]
    got = search_sharded(spark, shard_dirs, queries, k=10).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in queries:
        want = union.search(
            q["query_text"], k=10, mode=q["mode"], window=q.get("window", 5)
        )
        rows = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [h.doc_id for h in want], q
        for r, h in zip(rows, want):
            # sharded phrase computes idf·(tf/den) while the union index
            # computes (idf·tf)/den — same idf (libm log both sides since
            # round 4), same value up to one float-rounding step; ordering
            # is identical because idf is a positive per-query scalar
            assert abs(r["score"] - h.score) < 1e-9, q


def test_sharded_wand_stats_free_matches_exhaustive(indexes):
    # the WAND engine itself under GLOBAL stats on real on-disk shard
    # postings: bounds recomputed from stored (max_tf, min_dl) must yield
    # the same top-k as the exhaustive scorer under the same stats (tiny
    # test indexes never cross DENSE_POSTINGS_CUTOFF, so pin it directly)
    from tesserae_ng_spark.query.search import get_searcher
    from tesserae_ng_spark.query.wand import bm25_dense_topk, wand_topk

    shard_dirs, _ = indexes
    terms = ["join", "hash", "scan"]
    gs = global_shard_stats(shard_dirs, terms)
    for d in shard_dirs:
        fetched = get_searcher(d).reader.fetch(terms)
        got = wand_topk(
            fetched, gs["n_docs"], gs["avg_dl"], 10, df_override=gs["df"]
        )
        want = bm25_dense_topk(
            fetched, gs["n_docs"], gs["avg_dl"], 10, df_override=gs["df"]
        )
        assert got == want and len(got) == 10


def test_sharded_absent_term_empty(spark, indexes):
    shard_dirs, _ = indexes
    out = search_sharded(
        spark, shard_dirs,
        [dict(query_id=0, query_text="zzqx notinthecorpus", mode="bm25", k=5)],
        k=5,
    )
    assert out.count() == 0
