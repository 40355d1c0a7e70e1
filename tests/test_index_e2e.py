"""End-to-end index build + WAND rank-identity + resume (SURVEY.md §5.4-5)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from tesserae_ng_spark.functions.analysis import analyze_query
from tesserae_ng_spark.index.build import (
    corpus_stats,
    docs_table,
    prepare_docs,
    term_doc_decoded,
)
from tesserae_ng_spark.index.builder import build_index
from tesserae_ng_spark.query.bm25_oracle import bm25_topk_oracle
from tesserae_ng_spark.query.search import Searcher, search_batch


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    # small salt target + small blocks force the salted/merge/multi-block
    # machinery even at 500 docs
    res = build_index(
        spark,
        corpus,
        out,
        n_parts=3,
        target_postings_per_salt=64,
        block_size=16,
        n_buckets=4,
    )
    assert res.n_docs == 500
    assert res.n_terms > 0 and res.n_blocks > 0
    return out


@pytest.fixture(scope="module")
def oracle_parts(spark, corpus):
    prepared = prepare_docs(corpus).cache()
    docs = docs_table(prepared).cache()
    td = term_doc_decoded(prepared).cache()
    st = corpus_stats(docs).collect()[0]
    return td, docs, st["n_docs"], st["avg_dl"]


QUERIES = [
    "sort merge join",
    "the",                      # head term (skew path)
    "running quickly tables",   # stemmed forms
    "window",                   # single term
    "zzz absent term nothing",  # partially absent
    "totallyabsentterm",        # fully absent → empty
    "the fast small slow key",  # stopword-heavy multi-term
]


@pytest.mark.parametrize("k", [1, 10, 100])
def test_wand_rank_identity_vs_oracle(spark, index_dir, oracle_parts, k):
    td, docs, n_docs, avg_dl = oracle_parts
    searcher = Searcher(index_dir)
    for q in QUERIES:
        terms = analyze_query(q)
        want = bm25_topk_oracle(td, terms, k, n_docs, avg_dl).collect()
        got = searcher.search(q, k=k)
        assert [h.doc_id for h in got] == [r["doc_id"] for r in want], q
        for h, r in zip(got, want):
            assert abs(h.score - r["score"]) < 1e-9, (q, h, r)


def test_index_stats_match_oracle(index_dir, oracle_parts):
    _, _, n_docs, avg_dl = oracle_parts
    s = Searcher(index_dir)
    assert s.reader.n_docs == n_docs
    assert abs(s.reader.avg_dl - avg_dl) < 1e-9


def test_dictionary_df_exact(spark, index_dir, oracle_parts):
    td, _, _, _ = oracle_parts
    want = {r["term"]: r["df"] for r in td.groupBy("term").count().withColumnRenamed("count", "df").collect()}
    dic = spark.read.parquet(f"{index_dir}/dictionary").collect()
    got = {r["term"]: r["df"] for r in dic}
    assert got == want


def test_batch_search_matches_single(spark, index_dir):
    searcher = Searcher(index_dir)
    queries = [
        {"query_id": i, "query_text": q, "k": 5} for i, q in enumerate(QUERIES)
    ]
    batch = search_batch(spark, index_dir, queries, k=5).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for i, q in enumerate(QUERIES):
        single = [(h.rank, h.doc_id, h.score) for h in searcher.search(q, k=5)]
        assert sorted(by_q.get(i, [])) == single, q


def test_phrase_and_proximity(spark, index_dir, corpus):
    """Cross-check positional modes against brute-force over raw tokens."""
    from tesserae_ng_spark.functions.analysis import analyze

    from tesserae_ng_spark.functions.html import extract_text
    from tesserae_ng_spark.index.build import asof_latest

    rows = (
        asof_latest(corpus)
        .select(F.xxhash64("url").alias("doc_id"), "html", "lang")
        .collect()
    )
    toks = {
        r["doc_id"]: [t for t, _ in analyze(extract_text(bytes(r["html"])), r["lang"])]
        for r in rows
    }

    searcher = Searcher(index_dir)
    # pick a phrase that exists: scan brute force for any adjacent pair
    phrase = None
    for d, ts in toks.items():
        if len(ts) >= 2:
            phrase = (ts[0], ts[1])
            break
    q = f"{phrase[0]} {phrase[1]}"
    got = {h.doc_id for h in searcher.search(q, k=500, mode="phrase")}
    want = {
        d
        for d, ts in toks.items()
        if any(a == phrase[0] and b == phrase[1] for a, b in zip(ts, ts[1:]))
    }
    assert got == want

    got_prox = {h.doc_id for h in searcher.search(q, k=500, mode="proximity", window=5)}
    def min_span(ts, a, b):
        pa = [i for i, t in enumerate(ts) if t == a]
        pb = [i for i, t in enumerate(ts) if t == b]
        if not pa or not pb:
            return None
        return min(abs(x - y) for x in pa for y in pb)
    want_prox = {
        d for d, ts in toks.items()
        if (s := min_span(ts, phrase[0], phrase[1])) is not None and s <= 5
    }
    assert got_prox == want_prox


def test_lazy_payload_skipped_blocks_never_read(index_dir, monkeypatch):
    """Cold fetch is metadata-only; a block that is never landed on must
    never have its payload bytes read (VERDICT r2: eager whole-term fetch
    made WAND skipping pointless at GB-scale postings). Segment readahead
    is shrunk so the 28-block test term doesn't fit one window."""
    from tesserae_ng_spark.query import reader as reader_mod
    from tesserae_ng_spark.query.reader import IndexReader
    from tesserae_ng_spark.query.wand import bm25_dense_topk, wand_topk

    monkeypatch.setattr(reader_mod, "PAYLOAD_SEGMENT_BLOCKS", 4)
    r = IndexReader(index_dir)
    fetched = r.fetch(["the"])  # head term: every doc → many 16-doc blocks
    tp = fetched["the"]
    total = tp.n_blocks
    assert total > 8
    assert r.payload_blocks_loaded == 0, "fetch() must not read payloads"

    tp.decode_block(0)  # land on the first block only
    assert 0 < r.payload_blocks_loaded <= 4, "readahead window exceeded"
    assert tp._ids_miss[
        4:
    ].all(), "blocks beyond the landed segment were materialized"

    # WAND through the lazy reader == dense through an eager reader
    fetched = r.fetch(["the", "window"])
    got = wand_topk(fetched, r.n_docs, r.avg_dl, 3)
    r2 = IndexReader(index_dir)
    f2 = r2.fetch(["the", "window"])
    r2.ensure_payloads(f2.values())
    assert not f2["the"]._ids_miss[0]
    assert got == bm25_dense_topk(f2, r2.n_docs, r2.avg_dl, 3)


def test_payload_scan_selection_is_tight(index_dir, monkeypatch):
    """_load_payloads must scan EXACTLY the requested blocks: per-salt
    block-range predicates, not the old salt.isin × block_id.isin cross
    product that pulled same-numbered blocks from every listed salt
    (ADVICE r3). Pinned via the payload_rows_scanned counter on a head
    term spanning multiple salts."""
    from tesserae_ng_spark.query import reader as reader_mod
    from tesserae_ng_spark.query.reader import IndexReader

    import numpy as np

    monkeypatch.setattr(reader_mod, "PAYLOAD_SEGMENT_BLOCKS", 4)
    r = IndexReader(index_dir)
    tp = r.fetch(["the"])["the"]
    salts, first_idx = np.unique(tp.blk_salt, return_index=True)
    assert salts.size > 1, "fixture must span multiple salts"
    # demand one block from EACH salt in a single non-segment load: the
    # old cross product would scan |salts| × |distinct block ids| rows
    before = r.payload_rows_scanned
    tp.ensure_payloads(first_idx)
    assert r.payload_rows_scanned - before == first_idx.size
    # segment readahead: the scan returns exactly the windowed blocks
    tail = np.flatnonzero(tp._ids_miss)
    assert tail.size, "some blocks must remain unloaded"
    before = r.payload_rows_scanned
    was_missing = tp._ids_miss.copy()
    tp.ensure_payloads(tail[:1], segment=True)
    loaded_now = int((was_missing & ~tp._ids_miss).sum())
    assert r.payload_rows_scanned - before == loaded_now
    assert 0 < loaded_now <= 4


def test_dictionary_pushdown_fallback_matches_pinned(index_dir):
    """The >1M-term dictionary path (no in-memory pin; per-query pushdown
    filter-scan) must return identical lookups and search results."""
    from tesserae_ng_spark.query.reader import IndexReader

    pinned = IndexReader(index_dir)
    fallback = IndexReader(index_dir, dict_pin_max_terms=0)
    assert fallback._dict_cache is None and pinned._dict_cache is not None
    terms = ["the", "window", "join", "totallyabsentterm"]
    assert fallback.lookup(terms) == pinned.lookup(terms)

    s = Searcher.__new__(Searcher)
    s.reader = fallback
    s.lang = "en"
    sp = Searcher(index_dir)
    got = s.search("sort merge join", k=5)
    want = sp.search("sort merge join", k=5)
    assert [(h.doc_id, h.score) for h in got] == [
        (h.doc_id, h.score) for h in want
    ]


def test_resume_skips_done_partitions(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    # first attempt dies after partition 0
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus, out, n_parts=3, fail_after_part=0,
                    block_size=16, n_buckets=2)
    # resume: partition 0 skipped, 1..2 built
    res = build_index(spark, corpus, out, n_parts=3, block_size=16, n_buckets=2)
    assert res.skipped_parts == [0]
    assert res.built_parts == [1, 2]
    assert res.n_docs == 500

    # full rebuild from scratch → logically identical postings
    out2 = str(tmp_path / "idx2")
    build_index(spark, corpus, out2, n_parts=3, block_size=16, n_buckets=2)
    a = spark.read.parquet(f"{out}/postings").drop("bucket")
    b = spark.read.parquet(f"{out2}/postings").drop("bucket")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_determinism_across_parallelism(spark, corpus, tmp_path):
    """Same corpus, different partition counts → identical logical index
    (the rank-identity-across-cluster-sizes prerequisite)."""
    outs = []
    for n_parts in (1, 4):
        out = str(tmp_path / f"p{n_parts}")
        build_index(spark, corpus, out, n_parts=n_parts, block_size=16,
                    n_buckets=2, target_postings_per_salt=64)
        outs.append(out)
    a = spark.read.parquet(f"{outs[0]}/postings").drop("bucket")
    b = spark.read.parquet(f"{outs[1]}/postings").drop("bucket")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    da = spark.read.parquet(f"{outs[0]}/dictionary")
    db = spark.read.parquet(f"{outs[1]}/dictionary")
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0


def test_merge_rejects_stale_shards(spark, corpus, tmp_path):
    """ADVICE r1: reusing an out_dir with changed n_parts must not silently
    merge stale shards — shrinking the partition count leaves a stray part
    dir, and the merge lineage gate fails loudly."""
    out = str(tmp_path / "idx_stale")
    build_index(spark, corpus, out, n_parts=3, block_size=16, n_buckets=2)
    with pytest.raises(ValueError, match="stray shard dirs"):
        build_index(spark, corpus, out, n_parts=2, block_size=16, n_buckets=2)


def test_param_change_rebuilds_not_resumes(spark, corpus, tmp_path):
    """Changing a build-affecting param invalidates the fingerprint: the
    second build REBUILDS every partition instead of skipping as done."""
    out = str(tmp_path / "idx_params")
    build_index(spark, corpus, out, n_parts=2, block_size=16, n_buckets=2)
    res = build_index(spark, corpus, out, n_parts=2, block_size=32, n_buckets=2)
    assert res.skipped_parts == []
    assert res.built_parts == [0, 1]


def test_warm_top_terms(spark, corpus, index_dir):
    """Opt-in head-term warmer (VERDICT r5 #4): warming loads + decodes
    the top-df terms' payloads at open so a head-term query issues ZERO
    payload scans afterwards; results stay identical to a lazy searcher,
    and the default searcher stays lazy (no warm_info)."""
    from tesserae_ng_spark.query.search import Searcher

    lazy = Searcher(index_dir)
    assert lazy.warm_info is None

    warm = Searcher(index_dir, warm_mb=64)
    assert warm.warm_info["terms"] > 0
    # the corpus head term is inside any 64 MB budget at this scale
    head = max(
        warm.reader._dict_cache.values(), key=lambda r: r["df"]
    )["term"]
    scans_before = warm.reader.payload_scans
    got = warm.search(head, k=10)
    assert warm.reader.payload_scans == scans_before  # served from warm set
    want = lazy.search(head, k=10)
    assert [(h.doc_id, h.score) for h in got] == [
        (h.doc_id, h.score) for h in want
    ]
    # multi-term queries over warmed terms also stay scan-free
    terms2 = sorted(
        warm.reader._dict_cache.values(), key=lambda r: -r["df"]
    )[:3]
    q = " ".join(r["term"] for r in terms2)
    scans_before = warm.reader.payload_scans
    got2 = warm.search(q, k=10)
    assert warm.reader.payload_scans == scans_before
    assert [(h.doc_id, round(h.score, 12)) for h in got2] == [
        (h.doc_id, round(h.score, 12)) for h in lazy.search(q, k=10)
    ]


def test_warm_top_terms_arrow_fallback_same_selection(index_dir):
    """VERDICT r5 #4: the web-scale (unpinned-dictionary) warmer path must
    choose the SAME head terms as the pinned path without materializing
    the vocabulary as Python objects (Arrow sort_indices + prefix cut).
    Pinned vs fallback selection identity is checked at several budgets,
    including one too small for even the top term (still takes 1)."""
    from tesserae_ng_spark.query.reader import IndexReader

    pinned = IndexReader(index_dir)
    assert pinned._dict_cache is not None
    fallback = IndexReader(index_dir, dict_pin_max_terms=0)
    assert fallback._dict_cache is None
    for budget_mb in (1e-9, 0.001, 0.01, 64.0):
        a = pinned.warm_top_terms(budget_mb)
        b = fallback.warm_top_terms(budget_mb)
        assert a == b, budget_mb
        assert b["terms"] >= 1
    # tiny budget selects exactly the single highest-df term
    top = max(pinned._dict_cache.values(), key=lambda r: (r["df"], r["term"]))
    assert fallback.warm_top_terms(1e-9)["terms"] == 1
    assert fallback.lookup([top["term"]])  # and it is fetchable
