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


def test_phase1_distributed_bit_identical(spark, indexes, monkeypatch):
    """VERDICT r5 #1: the Spark-job phase 1 must be bit-identical to the
    serial driver loop (integer sums over disjoint shards commute), and the
    counters must show a JOB ran — not a per-shard driver loop."""
    from tesserae_ng_spark.query import sharded as sh

    shard_dirs, _ = indexes
    terms = ["join", "hash", "scan", "zzmissing"]

    sh._STATS_MEMO.clear()
    serial = global_shard_stats(shard_dirs, terms)  # below threshold → loop

    sh._STATS_MEMO.clear()
    monkeypatch.setattr(sh, "PHASE1_DISTRIBUTE_MIN", 0)
    before = dict(sh.PHASE1_COUNTERS)
    dist = global_shard_stats(
        shard_dirs, terms, sc=spark.sparkContext
    )
    assert sh.PHASE1_COUNTERS["jobs"] == before["jobs"] + 1
    assert sh.PHASE1_COUNTERS["serial_shards"] == before["serial_shards"]
    assert dist == serial  # exact, including every df int


def test_phase1_memo_skips_io(spark, indexes, monkeypatch):
    """Repeat batches over an immutable shard set pay zero phase-1 work;
    novel terms trigger ONE incremental lookup for just the missing terms."""
    from tesserae_ng_spark.query import sharded as sh

    shard_dirs, _ = indexes
    sh._STATS_MEMO.clear()
    a = global_shard_stats(shard_dirs, ["join", "hash"])
    hits0 = sh.PHASE1_COUNTERS["memo_hits"]
    b = global_shard_stats(shard_dirs, ["join", "hash"])
    assert sh.PHASE1_COUNTERS["memo_hits"] == hits0 + 1
    assert a == b
    # novel term: incremental (not a memo hit, but covered terms reused)
    c = global_shard_stats(shard_dirs, ["join", "scan"])
    assert sh.PHASE1_COUNTERS["memo_hits"] == hits0 + 1
    assert c["df"]["join"] == a["df"]["join"]
    assert c["n_docs"] == a["n_docs"]


def test_sharded_lang_threads_through(spark, corpus, tmp_path_factory):
    """VERDICT r5 #2: `lang` reaches phase-1 analysis, the global-df memo
    and every phase-2 searcher. Under lang='xx' (identity stemming) the
    sharded result must be rank+score-identical to a union index built and
    queried with the same lang — and differ from the en-stemmed world on a
    query whose tokens only match when stemmed."""
    base = tmp_path_factory.mktemp("sharded_xx")
    # relabel the corpus lang: build_index's `lang` is a corpus FILTER; the
    # analysis chain follows the per-doc lang column, so lang='xx' docs get
    # identity (non-Porter) stemming at build time
    corpus_xx = corpus.withColumn("lang", F.lit("xx"))
    shard_dirs = []
    for i in range(N_SHARDS):
        part = corpus_xx.filter(
            F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)) == i
        )
        out = str(base / f"shard{i}")
        build_index(spark, part, out, n_parts=1, block_size=16, n_buckets=2,
                    target_postings_per_salt=64)
        shard_dirs.append(out)
    union_dir = str(base / "union")
    build_index(spark, corpus_xx, union_dir, n_parts=2, block_size=16,
                n_buckets=2, target_postings_per_salt=64)
    union = Searcher(union_dir, lang="xx")
    queries = [
        dict(query_id=i, query_text=qt, mode="bm25", k=10)
        for i, qt in enumerate(["joins", "hash scan", "sorted merges"])
    ] + [dict(query_id=9, query_text="hash join", mode="phrase", k=10)]
    got = search_sharded(spark, shard_dirs, queries, k=10, lang="xx").collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in queries:
        want = union.search(q["query_text"], k=10, mode=q.get("mode", "bm25"))
        rows = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [h.doc_id for h in want], q
        for r, h in zip(rows, want):
            assert abs(r["score"] - h.score) < 1e-9, q
    # sanity that lang mattered at all: 'joins' unstemmed misses docs that
    # an en-stemmed index would hit (identity vs Porter stemming differ)
    en_union = Searcher(union_dir)  # en analysis over the xx-built index
    assert union.search("joins", k=10) != en_union.search("joins", k=10) or \
        not union.search("joins", k=10)


def test_batch_scorer_integration_identical(spark, indexes):
    """ADVICE r4 #2: search_batch + search_sharded with the term-at-a-time
    batch scorer forced ON must return results identical to the default
    adaptive per-query path (done-set bookkeeping, global-stats override,
    uncapped ensure_payloads, rank construction all exercised)."""
    from tesserae_ng_spark.query.search import search_batch

    shard_dirs, union_dir = indexes
    queries = [
        dict(query_id=i, query_text=qt, mode="bm25", k=10)
        for i, qt in enumerate(
            ["join", "hash scan", "sort merge join", "table hash",
             "scan scan join", "zzmissing join"]
        )
    ] + [
        dict(query_id=10, query_text="hash join", mode="phrase", k=10),
        dict(query_id=11, query_text="sort merge", mode="proximity", k=10,
             window=6),
    ]

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 12))
            for r in df.collect()
        )

    base_b = rows(search_batch(spark, union_dir, queries, k=10,
                               use_batch_scorer=False))
    got_b = rows(search_batch(spark, union_dir, queries, k=10,
                              use_batch_scorer=True))
    assert got_b == base_b
    base_s = rows(search_sharded(spark, shard_dirs, queries, k=10,
                                 use_batch_scorer=False))
    got_s = rows(search_sharded(spark, shard_dirs, queries, k=10,
                                use_batch_scorer=True))
    assert got_s == base_s


def test_batch_scorer_env_flag_parsing(monkeypatch):
    """TNG_BATCH_SCORER env parsing (the `use_batch_scorer=None` default
    resolves through this on each executor; the integration test above
    forces the same branch via the explicit param because env mutations
    in a live test session don't reach already-forked python workers)."""
    from tesserae_ng_spark.query.search import _use_batch_scorer

    for val, want in [
        ("1", True), ("true", True), ("YES", True), (" on ", True),
        ("0", False), ("off", False), ("", False), ("no", False),
    ]:
        monkeypatch.setenv("TNG_BATCH_SCORER", val)
        assert _use_batch_scorer() is want, val
    monkeypatch.delenv("TNG_BATCH_SCORER")
    assert _use_batch_scorer() is False


def test_prime_shard_workers_preserves_results(spark, indexes):
    """Priming (Solr warming-queries analog) is a pure cache operation:
    results before and after are identical, every prime task reports, and
    the warm pass serves from primed caches. Mixed modes so the positional
    warming-query path (the part that actually matters — see
    prime_shard_workers docstring) executes."""
    from tesserae_ng_spark.query.sharded import prime_shard_workers

    shard_dirs, _ = indexes
    queries = [
        dict(query_id=0, query_text="sort merge join", mode="bm25", k=10),
        dict(query_id=1, query_text="hash join", mode="phrase", k=10),
        dict(query_id=2, query_text="sort merge", mode="proximity", k=10),
        dict(query_id=3, query_text="zzmissing", mode="bm25", k=10),
    ]

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in df.collect()
        )

    before = rows(search_sharded(spark, shard_dirs, queries, k=10))
    info = prime_shard_workers(spark, shard_dirs, queries=queries)
    assert info["tasks"] >= 1 and 1 <= info["workers"] <= info["tasks"]
    after = rows(search_sharded(spark, shard_dirs, queries, k=10))
    assert before == after
