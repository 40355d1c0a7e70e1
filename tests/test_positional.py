"""Vectorized phrase/proximity vs brute force — property tests, no Spark."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tesserae_ng_spark.index.inmem import build_term_postings
from tesserae_ng_spark.query.search import phrase_topk, proximity_topk

VOCAB = ["a", "b", "c", "d"]

docs_strategy = st.dictionaries(
    keys=st.integers(min_value=-(2**62), max_value=2**62),
    values=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=25),
    min_size=1,
    max_size=40,
)


def index_from_token_docs(docs):
    postings = {}
    dls = {}
    for doc_id, toks in docs.items():
        dls[doc_id] = len(toks)
        per = {}
        for i, t in enumerate(toks):
            per.setdefault(t, []).append(i)
        for t, ps in per.items():
            postings.setdefault(t, []).append((doc_id, len(ps), len(toks), ps))
    n = len(docs)
    avg = sum(dls.values()) / n
    tps = {
        t: build_term_postings(t, ps, n, avg, block_size=4)
        for t, ps in postings.items()
    }
    return tps, n, avg


def brute_phrase(docs, phrase):
    out = {}
    for d, toks in docs.items():
        tf = sum(
            1
            for i in range(len(toks) - len(phrase) + 1)
            if toks[i : i + len(phrase)] == list(phrase)
        )
        if tf:
            out[d] = tf
    return out


def brute_min_span(toks, a, b):
    pa = [i for i, t in enumerate(toks) if t == a]
    pb = [i for i, t in enumerate(toks) if t == b]
    if not pa or not pb:
        return None
    return min(abs(x - y) for x in pa for y in pb)


@given(docs=docs_strategy, p1=st.sampled_from(VOCAB), p2=st.sampled_from(VOCAB))
@settings(max_examples=300, deadline=None)
def test_phrase_matches_brute(docs, p1, p2):
    tps, n, avg = index_from_token_docs(docs)
    if p1 not in tps or p2 not in tps:
        return
    got = phrase_topk([tps[p1], tps[p2]], n, avg, k=10_000)
    want = brute_phrase(docs, (p1, p2))
    assert {d for d, _ in got} == set(want)
    # tf drives the score: re-derive tf from score ordering indirectly by
    # checking doc sets per tf via a second brute pass
    for d, s in got:
        assert want[d] >= 1


@given(
    docs=docs_strategy,
    p1=st.sampled_from(VOCAB),
    p2=st.sampled_from(VOCAB),
    window=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=300, deadline=None)
def test_proximity_matches_brute(docs, p1, p2, window):
    if p1 == p2:
        return
    tps, n, avg = index_from_token_docs(docs)
    if p1 not in tps or p2 not in tps:
        return
    got = {d: s for d, s in proximity_topk([tps[p1], tps[p2]], window, k=10_000)}
    for d, toks in docs.items():
        span = brute_min_span(toks, p1, p2)
        if span is not None and span <= window:
            assert d in got, (d, toks, span)
            tf1 = toks.count(p1)
            tf2 = toks.count(p2)
            want = math.log((1.0 / tf1 + 1.0 / tf2) / max(span, 1))
            assert math.isclose(got[d], want, rel_tol=0, abs_tol=1e-9)
        else:
            assert d not in got


def test_three_term_phrase():
    docs = {1: ["a", "b", "c", "a", "b", "c"], 2: ["a", "b", "a", "c"], 3: ["c", "b", "a"]}
    tps, n, avg = index_from_token_docs(docs)
    got = phrase_topk([tps["a"], tps["b"], tps["c"]], n, avg, k=10)
    assert [d for d, _ in got] == [1]


@given(
    docs=docs_strategy,
    terms=st.lists(st.sampled_from(VOCAB), min_size=3, max_size=4, unique=True),
    window=st.integers(min_value=0, max_value=10),
)
@settings(max_examples=300, deadline=None)
def test_multiterm_proximity_matches_brute(docs, terms, window):
    """3+-term proximity (vectorized cover-span sweep) vs per-doc brute."""
    from tesserae_ng_spark.query.search import _min_cover_span

    tps, n, avg = index_from_token_docs(docs)
    if any(t not in tps for t in terms):
        return
    got = {d: s for d, s in proximity_topk([tps[t] for t in sorted(set(terms))], window, k=10_000)}
    for d, toks in docs.items():
        pos_lists = [
            np.array([i for i, x in enumerate(toks) if x == t])
            for t in sorted(set(terms))
        ]
        if any(p.size == 0 for p in pos_lists):
            assert d not in got
            continue
        span = _min_cover_span(pos_lists)
        if 0 <= span <= window:
            assert d in got, (d, toks, span)
            inv_f = sum(1.0 / toks.count(t) for t in sorted(set(terms)))
            want = math.log(inv_f / max(span, 1))
            assert math.isclose(got[d], want, rel_tol=0, abs_tol=1e-9)
        else:
            assert d not in got


def test_cover_span_vectorized_matches_reference():
    from tesserae_ng_spark.query.search import (
        _ROW_SHIFT,
        _min_cover_span,
        _min_cover_span_vectorized,
        _min_span_2term_vectorized,
    )

    rng = np.random.RandomState(0)
    for trial in range(200):
        T = rng.randint(2, 5)
        n_rows = rng.randint(1, 8)
        keys = []
        per_row = {r: [None] * T for r in range(n_rows)}
        for t in range(T):
            ks = []
            for r in range(n_rows):
                ps = sorted(rng.choice(200, size=rng.randint(1, 6), replace=False))
                per_row[r][t] = np.array(ps)
                ks.extend(int(r) * int(_ROW_SHIFT) + int(p) for p in ps)
            keys.append(np.array(sorted(ks), dtype=np.int64))
        rows, spans = _min_cover_span_vectorized(keys)
        got = dict(zip(rows.tolist(), spans.tolist()))
        for r in range(n_rows):
            assert got.get(r, -1) == _min_cover_span(per_row[r])
        if T == 2:
            r2, s2 = _min_span_2term_vectorized(keys[0], keys[1])
            assert r2.tolist() == rows.tolist()
            assert s2.tolist() == spans.tolist()


def test_position_overflow_falls_back_to_per_doc():
    """Docs with positions beyond the packed-key budget (>= 2^21) must take
    the per-doc path and return the same matches, not corrupt keys."""
    from tesserae_ng_spark.query.search import _ROW_SHIFT

    big = int(_ROW_SHIFT) + 10  # a "2M-token" document's tail positions
    docs_pos = {
        1: {"a": [big], "b": [big + 1]},          # adjacent at huge offsets
        2: {"a": [5], "b": [6]},                   # normal doc
        3: {"a": [big], "b": [big + 500]},         # far apart at huge offsets
    }
    postings = {
        t: [
            (d, len(per[t]), sum(len(v) for v in per.values()), per[t])
            for d, per in docs_pos.items()
            if t in per
        ]
        for t in ("a", "b")
    }
    n, avg = 3, 4.0
    tps = {
        t: build_term_postings(t, ps, n, avg, block_size=4)
        for t, ps in postings.items()
    }
    got_phrase = {d for d, _ in phrase_topk([tps["a"], tps["b"]], n, avg, k=10)}
    assert got_phrase == {1, 2}
    got_prox = {d for d, _ in proximity_topk([tps["a"], tps["b"]], 5, k=10)}
    assert got_prox == {1, 2}


def test_phrase_underflow_at_position_cap_boundary():
    """ADVICE r5: a legal term-0 occurrence at position 2^21 - 1 must not
    validate an underflowed phrase-start key (keys[j0] - j0 borrowing row
    bits when the smallest term sits at position < j0 in the NEXT common
    row). The tightened margin guard (reject positions >= 2^21 - arity)
    routes such near-cap docs to the per-doc fallback instead."""
    from tesserae_ng_spark.query.search import _ROW_SHIFT

    cap = int(_ROW_SHIFT)
    docs_pos = {
        1: {"a": [100, cap - 1], "b": [10]},  # no "a b" phrase
        2: {"a": [50], "b": [0]},             # b at pos 0 → underflow bait
        3: {"a": [3], "b": [4]},              # real "a b" at 3
    }
    postings = {
        t: [
            (d, len(per[t]), sum(len(v) for v in per.values()), per[t])
            for d, per in docs_pos.items()
            if t in per
        ]
        for t in ("a", "b")
    }
    n, avg = 3, 4.0
    tps = {
        t: build_term_postings(t, ps, n, avg, block_size=4)
        for t, ps in postings.items()
    }
    got = {d for d, _ in phrase_topk([tps["a"], tps["b"]], n, avg, k=10)}
    assert got == {3}


def test_candidate_positions_sparse_and_bulk_match_full_decode():
    """candidate_positions must return exactly the same (tfs, dls,
    positions) as slicing the full decode, on BOTH its paths: the sparse
    per-block gather (few candidates, few blocks touched) and the hybrid
    bulk path (candidates spanning most blocks)."""
    rng = np.random.RandomState(7)
    n_docs = 400
    postings = []
    for d in range(n_docs):
        tf = int(rng.randint(1, 5))
        pos = np.sort(rng.choice(500, size=tf, replace=False))
        postings.append((d * 13 - 1000, tf, int(rng.randint(tf, 600)), pos))
    tp = build_term_postings("t", postings, n_docs, 80.0, block_size=8)
    ids_all, tfs_all, dls_all, pos_flat_all, pos_offs_all = tp.decode_full(
        with_positions=True
    )

    def check(cand_idx):
        cand = ids_all[cand_idx]
        # fresh TermPostings so path choice isn't masked by decode caches
        tp2 = build_term_postings("t", postings, n_docs, 80.0, block_size=8)
        tfs, dls, pos_flat, pos_offs = tp2.candidate_positions(cand)
        assert np.array_equal(tfs, tfs_all[cand_idx])
        assert np.array_equal(dls, dls_all[cand_idx])
        for k, i in enumerate(cand_idx):
            want = pos_flat_all[
                pos_offs_all[i] : pos_offs_all[i] + tfs_all[i]
            ]
            got = pos_flat[pos_offs[k] : pos_offs[k] + tfs[k]]
            assert np.array_equal(got, want), (k, i)

    # sparse: 3 scattered candidates over 50 blocks → per-block path
    check(np.array([1, 200, 399]))
    # bulk: most docs are candidates → hybrid decode_full path
    check(np.arange(0, n_docs, 2))


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=1, max_value=120),
    block_size=st.sampled_from([1, 2, 8, 64]),
    density=st.floats(min_value=0.0, max_value=1.0),
    clustered=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_candidate_positions_density_sweep(
    seed, n_docs, block_size, density, clustered
):
    """Hypothesis sweep over candidate densities and layouts (VERDICT r3
    #8): the >25%-of-blocks bulk-path threshold must be invisible —
    identical output either side of it, including empty candidate sets,
    single-block terms, all-candidates, and clustered candidates that
    concentrate in few blocks while spanning many docs."""
    rng = np.random.RandomState(seed)
    postings = []
    for d in range(n_docs):
        tf = int(rng.randint(1, 4))
        pos = np.sort(rng.choice(50, size=tf, replace=False))
        postings.append((d * 7 - 50, tf, int(rng.randint(tf, 80)), pos))
    tp = build_term_postings("t", postings, n_docs, 40.0, block_size=block_size)
    ids_all, tfs_all, dls_all, pos_flat_all, pos_offs_all = tp.decode_full(
        with_positions=True
    )
    n_cand = int(round(density * n_docs))
    if clustered and n_cand:
        lo = int(rng.randint(0, n_docs - n_cand + 1))
        cand_idx = np.arange(lo, lo + n_cand)
    else:
        cand_idx = np.sort(rng.choice(n_docs, size=n_cand, replace=False))
    tp2 = build_term_postings("t", postings, n_docs, 40.0, block_size=block_size)
    tfs, dls, pos_flat, pos_offs = tp2.candidate_positions(ids_all[cand_idx])
    assert np.array_equal(tfs, tfs_all[cand_idx])
    assert np.array_equal(dls, dls_all[cand_idx])
    assert tfs.size == 0 or pos_offs[0] == 0
    for k, i in enumerate(cand_idx):
        want = pos_flat_all[pos_offs_all[i] : pos_offs_all[i] + tfs_all[i]]
        got = pos_flat[pos_offs[k] : pos_offs[k] + tfs[k]]
        assert np.array_equal(got, want), (k, i)
