"""Fused one-pass sharded build ≡ N independent build_index runs.

build_sharded_indexes runs the analyzer chain once over the full corpus
and fans stage-A artifacts out to N standalone shard dirs through one
(shard, term)-keyed exchange; stage B is the unchanged per-index merge.
The pin here is strong: per-shard FINAL POSTINGS AND DICTIONARY ROWS are
equal to an independent build_index over the filtered corpus, and
search_sharded over the fused dirs is rank+score-identical to a single
union index.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from tesserae_ng_spark.index.builder import build_index
from tesserae_ng_spark.index.sharded_build import build_sharded_indexes
from tesserae_ng_spark.query.search import Searcher
from tesserae_ng_spark.query.sharded import search_sharded

N_SHARDS = 3
KW = dict(block_size=16, n_buckets=2, target_postings_per_salt=64)


@pytest.fixture(scope="module")
def fused(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("fused")
    dirs = [str(base / f"shard{i}") for i in range(N_SHARDS)]
    results = build_sharded_indexes(spark, corpus, dirs, **KW)
    return dirs, results


@pytest.fixture(scope="module")
def independent(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("indep")
    dirs = []
    for i in range(N_SHARDS):
        part = corpus.filter(
            F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)) == i
        )
        out = str(base / f"shard{i}")
        build_index(spark, part, out, n_parts=1, **KW)
        dirs.append(out)
    return dirs


def _rows(spark, path, cols, order):
    df = spark.read.parquet(path).select(*cols).orderBy(*order)
    return [tuple(r) for r in df.collect()]


def test_fused_postings_identical_to_independent(spark, fused, independent):
    fdirs, _ = fused
    for fd, idp in zip(fdirs, independent):
        cols = [
            "term", "salt", "block_id", "n_docs", "block_first_doc",
            "block_last_doc", "doc_ids", "tfs", "dls", "positions",
            "block_max_score", "block_max_tf", "block_min_dl",
        ]
        order = ["term", "salt", "block_id"]
        assert _rows(spark, f"{fd}/postings", cols, order) == _rows(
            spark, f"{idp}/postings", cols, order
        )
        dcols = ["term", "df", "cf", "max_score", "n_blocks", "bucket"]
        assert _rows(spark, f"{fd}/dictionary", dcols, ["term"]) == _rows(
            spark, f"{idp}/dictionary", dcols, ["term"]
        )
        with open(f"{fd}/stats.json") as f1, open(f"{idp}/stats.json") as f2:
            assert json.load(f1) == json.load(f2)


def test_fused_search_identical_per_shard(fused, independent):
    fdirs, _ = fused
    for fd, idp in zip(fdirs, independent):
        a, b = Searcher(fd), Searcher(idp)
        for q, mode in [
            ("join", "bm25"), ("hash scan", "bm25"),
            ("hash join", "phrase"), ("sort merge", "proximity"),
        ]:
            assert a.search(q, k=10, mode=mode) == b.search(q, k=10, mode=mode)


def test_fused_sharded_search_matches_union(spark, corpus, fused, tmp_path_factory):
    fdirs, _ = fused
    union_dir = str(tmp_path_factory.mktemp("fusedu") / "union")
    build_index(spark, corpus, union_dir, n_parts=2, **KW)
    union = Searcher(union_dir)
    queries = [
        dict(query_id=i, query_text=qt, mode="bm25", k=10)
        for i, qt in enumerate(
            ["join", "hash scan", "sort merge join", "table hash"]
        )
    ]
    got = {}
    for r in search_sharded(spark, fdirs, queries, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for q in queries:
        want = [
            (h.rank, h.doc_id, pytest.approx(h.score, abs=1e-9))
            for h in union.search(q["query_text"], k=10)
        ]
        assert sorted(got.get(q["query_id"], [])) == want


def test_fused_resume_skips_stage_a(spark, corpus, fused):
    fdirs, first = fused
    stats_before = [json.load(open(f"{d}/stats.json")) for d in fdirs]
    results = build_sharded_indexes(spark, corpus, fdirs, **KW)
    assert all(r.skipped_parts == [0] for r in results)
    assert [json.load(open(f"{d}/stats.json")) for d in fdirs] == stats_before
    assert all(r.n_docs == f.n_docs for r, f in zip(results, first))


def test_fused_all_empty_corpus(spark, corpus, tmp_path_factory):
    # ADVICE r5: a corpus where EVERY doc is filtered out writes zero
    # data files in the partitionBy staging step — the build must not
    # crash on schema inference and must emit N valid 0-doc indexes
    empty = corpus.filter(F.lit(False))
    n = 3
    base = tmp_path_factory.mktemp("fusedallempty")
    dirs = [str(base / f"s{i}") for i in range(n)]
    results = build_sharded_indexes(spark, empty, dirs, **KW)
    assert len(results) == n
    assert all(r.n_docs == 0 for r in results)
    for d in dirs:
        s = Searcher(d)
        assert s.search("join hash", k=5, mode="bm25") == []
    queries = [dict(query_id=0, query_text="join hash", mode="bm25", k=5)]
    assert search_sharded(spark, dirs, queries, k=5).collect() == []


def test_fused_empty_shard(spark, corpus, tmp_path_factory):
    # more shards than docs → some shards are empty; they must still come
    # out as valid (0-doc) indexes and not break the sharded query path
    small = corpus.orderBy("url").limit(3)
    # the corpus carries multiple crawl versions per url; the build's
    # as-of dedupe keeps one doc per distinct url
    expect = small.select("url").distinct().count()
    n = 7
    base = tmp_path_factory.mktemp("fusedempty")
    dirs = [str(base / f"s{i}") for i in range(n)]
    results = build_sharded_indexes(spark, small, dirs, **KW)
    assert sum(r.n_docs for r in results) == expect
    assert any(r.n_docs == 0 for r in results)
    queries = [dict(query_id=0, query_text="join hash", mode="bm25", k=5)]
    rows = search_sharded(spark, dirs, queries, k=5).collect()
    # global stats over the 3-doc corpus drive whatever matches exist
    assert all(r["rank"] >= 1 for r in rows)
