"""Block-max WAND top-k over compressed postings (SURVEY.md §2.11).

Algorithm: Broder et al. CIKM'03 (WAND) + Ding & Suel SIGIR'11 (block-max
refinement). Lucene 4 — the reference's engine — had neither; BMW is a
contract requirement (BASELINE.json north_star); Lucene 8+ adopted the
same algorithm, so its public semantics are the behavioral target.

Guarantee: EXHAUSTIVE-EQUIVALENT top-k — identical (doc_id, score) lists,
including the deterministic tie-break (score desc, doc_id asc) — property-
tested against the pure-DataFrame oracle (tests/test_wand.py).

Pruning discipline for exactness:
- prune only when upper_bound < threshold - EPS (never on ==): a candidate
  tying the heap minimum may still win the doc_id tie-break;
- EPS absorbs float-addition rounding between the bound sum and the real
  score sum;
- per-posting scores are recomputed from (tf, dl) with the exact oracle
  formula in float64, and block_max_score was stored as the max of those
  same float64 values at merge time, so bounds are true upper bounds.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from tesserae_ng_spark.schemas import BM25_B, BM25_K1

EPS = 1e-12


class StatsFreeBoundsUnavailable(Exception):
    """The index predates per-block (max_tf, min_dl) metadata — WAND under
    overridden stats has no valid upper bounds; use an exhaustive scorer."""


class TermIterator:
    """Cursor over one term's blocks (blocks arrive in global docID order:
    salts are contiguous doc ranges, so (salt, block_id) order == doc order).

    ``df`` overrides the stored document frequency (sharded/distributed
    search under GLOBAL stats — the Solr distributed-IDF analog). Stored
    ``block_max_score`` was computed under the index's own merge-time
    (n_docs, avg_dl, df) and is NOT a valid bound under any other stats, so
    when ``stats_free`` is set, per-block bounds are recomputed from the
    stored (max_tf, min_dl): BM25's tf-part f(tf, dl) = tf/(tf + k1·(1−b +
    b·dl/avg_dl)) is monotone ↑ in tf and ↓ in dl, hence idf·f(max_tf,
    min_dl) ≥ idf·f(tf_i, dl_i) for every posting i of the block — a true
    (slightly looser) upper bound under the query's stats."""

    def __init__(self, postings, n_docs: int, avg_dl: float,
                 k1: float = BM25_K1, b: float = BM25_B,
                 df: int | None = None, stats_free: bool = False):
        self.term = postings.term
        df_t = postings.df if df is None else df
        self.idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        self.tp = postings
        # struct-of-arrays metadata (VERDICT r5 #5): block skips index
        # numpy arrays / searchsorted instead of per-block Python objects
        self._last = postings.blk_last
        self._first = postings.blk_first
        self.n_blocks = postings.n_blocks
        self.avg_dl = avg_dl
        self.k1 = k1
        self.b = b
        self._bounds = None
        if stats_free and self.n_blocks:
            if postings.blk_max_tf is None:
                raise StatsFreeBoundsUnavailable(postings.term)
            mt = postings.blk_max_tf.astype(np.float64)
            md = postings.blk_min_dl.astype(np.float64)
            self._bounds = self.idf * mt / (
                mt + k1 * (1.0 - b + b * md / avg_dl)
            )
            self.max_score = float(self._bounds.max())
        else:
            self._bounds_stored = postings.blk_max_score
            self.max_score = postings.max_score
        self.exhausted = not self.n_blocks
        self.bi = 0
        self.pi = 0
        self._ids = None
        self._scores = None
        if not self.exhausted:
            self._load(0)

    def _load(self, bi: int) -> None:
        """Move the block cursor — METADATA ONLY. Decompression happens
        lazily on first posting access (_ensure_decoded), so skip-heavy
        queries advance over blocks without ever decoding them (the actual
        block-max WAND payoff; Ding & Suel §4)."""
        self.bi = bi
        self.pi = 0
        self._ids = None
        self._scores = None

    def _ensure_decoded(self) -> None:
        if self._ids is None:
            ids, tfs, dls = self.tp.decode_block(self.bi)
            self._ids = ids
            self._scores = self.idf * tfs / (
                tfs + self.k1 * (1.0 - self.b + self.b * dls / self.avg_dl)
            )

    def cur_doc(self) -> int:
        if self._ids is None:
            if self.pi == 0:
                # block metadata knows its first doc — no decode needed
                return int(self._first[self.bi])
            self._ensure_decoded()
        return int(self._ids[self.pi])

    def cur_score(self) -> float:
        self._ensure_decoded()
        return float(self._scores[self.pi])

    def cur_block_max(self) -> float:
        if self._bounds is not None:
            return float(self._bounds[self.bi])
        return float(self._bounds_stored[self.bi])

    def cur_block_last(self) -> int:
        return int(self._last[self.bi])

    def _seek_block(self, target: int) -> bool:
        """Block cursor → first block whose last_doc >= target, via ONE
        searchsorted over the blk_last skip array (the old per-block
        Python while-loop was O(blocks skipped) per seek — a head term at
        web scale has ~10^5 blocks). Never seeks backwards."""
        if int(self._last[self.bi]) >= target:
            return True
        bi = int(np.searchsorted(self._last, target))
        if bi >= self.n_blocks:
            self.exhausted = True
            return False
        self._load(bi)
        return True

    def advance_to(self, target: int) -> bool:
        """Seek to the first posting with doc >= target. Intermediate blocks
        are skipped on metadata alone; only the landing block decodes."""
        if not self._seek_block(target):
            return False
        self._ensure_decoded()
        self.pi = int(np.searchsorted(self._ids[self.pi:], target)) + self.pi
        return True

    def next(self) -> bool:
        self._ensure_decoded()
        self.pi += 1
        if self.pi < self._ids.size:
            return True
        if self.bi + 1 >= self.n_blocks:
            self.exhausted = True
            return False
        self._load(self.bi + 1)
        return True

    def shallow_advance(self, target: int) -> bool:
        """Advance the block cursor until the current block may contain
        target — metadata only, nothing decodes."""
        return self._seek_block(target)


def wand_topk(
    term_postings: dict,
    n_docs: int,
    avg_dl: float,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    df_override: dict | None = None,
) -> list[tuple[int, float]]:
    """→ [(doc_id, score)] sorted by (score desc, doc_id asc), len ≤ k.

    Full scoring sums per-term partials in sorted-term order — a fixed
    order makes float sums deterministic across runs and parallelism.

    ``df_override`` maps term → GLOBAL df (sharded search): iterators run
    in stats-free mode, recomputing block bounds from (max_tf, min_dl)
    under the given (n_docs, avg_dl, df) — raises StatsFreeBoundsUnavailable
    on a pre-v2 index lacking that metadata.
    """
    stats_free = df_override is not None
    its = [
        TermIterator(
            tp, n_docs, avg_dl, k1, b,
            df=(df_override or {}).get(tp.term),
            stats_free=stats_free,
        )
        for tp in term_postings.values()
        if tp.n_blocks
    ]
    its = [it for it in its if not it.exhausted]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else -math.inf

    while its:
        its.sort(key=lambda x: x.cur_doc())
        th = theta()
        acc = 0.0
        pivot_idx = -1
        for i, it in enumerate(its):
            acc += it.max_score
            if acc >= th - EPS:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # even all terms together cannot reach the threshold
        pivot_doc = its[pivot_idx].cur_doc()
        # include every iterator already sitting on pivot_doc: they
        # contribute to its real score, so they belong in the bound
        while (
            pivot_idx + 1 < len(its)
            and its[pivot_idx + 1].cur_doc() == pivot_doc
        ):
            pivot_idx += 1

        # block-max refinement: tighter bound from the leaders' current blocks
        leaders = its[: pivot_idx + 1]
        ok = True
        bound = 0.0
        for it in leaders:
            if not it.shallow_advance(pivot_doc):
                ok = False
                break
            bound += it.cur_block_max()
        if not ok:
            its = [x for x in its if not x.exhausted]
            continue
        if bound < th - EPS:
            # skip past the earliest block boundary among leaders, bounded
            # by the next non-leader's current doc (Ding & Suel GetNewCandidate)
            nxt = min(it.cur_block_last() for it in leaders) + 1
            if pivot_idx + 1 < len(its):
                nxt = min(nxt, its[pivot_idx + 1].cur_doc())
            nxt = max(nxt, pivot_doc + 1)
            for it in leaders:
                it.advance_to(nxt)
            its = [x for x in its if not x.exhausted]
            continue

        # shallow_advance may have moved a leader's cursor PAST pivot_doc
        # (block switch resets to the next block's first doc): re-sort and
        # re-pivot on the fresh state — progress was made, no livelock.
        if any(it.cur_doc() > pivot_doc for it in leaders):
            continue

        # aligned ⟺ every leader sits on pivot_doc (leaders are ≤ pivot_doc
        # after the guard above; non-leaders are ≥ pivot_doc by sort order)
        if min(it.cur_doc() for it in leaders) == pivot_doc:
            aligned = [it for it in its if it.cur_doc() == pivot_doc]
            score = 0.0
            for it in sorted(aligned, key=lambda x: x.term):
                score += it.cur_score()
            item = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            for it in aligned:
                it.next()
            its = [x for x in its if not x.exhausted]
        else:
            # advance a strictly-lagging iterator (largest term bound first)
            lagging = [it for it in leaders if it.cur_doc() < pivot_doc]
            lag = max(lagging, key=lambda x: x.max_score)
            lag.advance_to(pivot_doc)
            its = [x for x in its if not x.exhausted]

    out = sorted(heap, key=lambda item: (-item[0], -item[1]))
    return [(-negid, s) for (s, negid) in out]


def term_rows_scores(
    tp,
    global_docs: np.ndarray,
    n_docs: int,
    avg_dl: float,
    df_t: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> tuple[np.ndarray, np.ndarray]:
    """One term's (global_row, bm25 score) arrays under the given stats,
    cached on the TermPostings (the index is immutable — Lucene-query-cache
    style). The small per-stats-key LRU lets a node serving BOTH
    shard-local and global-stats (sharded) traffic keep one entry per key
    instead of thrashing a single slot every alternation."""
    stats_key = (n_docs, avg_dl, df_t, k1, b)
    cache = getattr(tp, "_rows_scores", None)
    if cache is None:
        cache = tp._rows_scores = {}
    cached = cache.get(stats_key)
    if cached is not None:
        # LRU refresh: re-insert so eviction removes the stalest key
        cache[stats_key] = cache.pop(stats_key)
        return cached
    ids, tfs, dls, _, _ = tp.decode_full()
    idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
    scores = idf * tfs / (tfs + k1 * (1.0 - b + b * dls / avg_dl))
    rows = np.searchsorted(global_docs, ids)
    if global_docs.size <= np.iinfo(np.int32).max:
        # int32 row indices (r7): exact for any per-node index (row <
        # n_docs < 2^31), and the cached (rows, scores) pair is the
        # scorer's per-worker hot set — 16 → 12 B/posting shrinks the
        # freshly-touched pages the batch path re-faults in degraded
        # windows. numpy fancy-indexing accepts int32 unchanged.
        rows = rows.astype(np.int32)
    # validate the mapping once per term: if the docs table and the
    # postings drifted (stale-shard merge, docs read from a different
    # build), searchsorted would scatter scores into the WRONG doc rows
    # silently — fail loudly instead.
    if rows.size and (
        int(rows.max()) >= global_docs.size
        or not np.array_equal(global_docs[rows], ids)
    ):
        raise RuntimeError(
            f"postings/docs drift: term {tp.term!r} has doc ids "
            "absent from the docs table — index dirs out of sync"
        )
    if len(cache) >= 4:  # bounded: stats keys are few and stable
        cache.pop(next(iter(cache)))  # evict LRU entry only
    cache[stats_key] = (rows, scores)
    return rows, scores


def dense_row_topk(
    acc: np.ndarray, global_docs: np.ndarray, k: int
) -> list[tuple[int, float]]:
    """Tie-safe top-k extraction from one dense accumulator row →
    [(doc_id, score)] by (score desc, doc_id asc). Matched docs are exactly
    the nonzero entries (bm25 partials are strictly positive).

    Tie handling never sorts the full hit set: argpartition over the hits
    yields the true k-th score (the k largest VALUES are exact; only their
    doc-id tie-break may be wrong), so the exact top-k is recoverable by
    ordering just the docs with score ≥ kth — typically k plus one tie
    group. The old full-hit lexsort fallback fired on ~90% of queries on
    corpora with duplicated docs (score runs ⇒ kth almost always tied) and
    was the dominant per-query cost at head-term hit counts."""
    hit = np.nonzero(acc)[0]
    if hit.size == 0:
        return []
    if hit.size <= k:
        top = hit[np.lexsort((hit, -acc[hit]))]
        return [(int(global_docs[i]), float(acc[i])) for i in top]
    sub = acc[hit]
    if hit.size > 2 * k:
        # ascending partition at size-k: tail 2k ⊇ the k largest values
        # (no -sub negation pass over the full hit set)
        part = hit[np.argpartition(sub, hit.size - k)[hit.size - 2 * k :]]
    else:
        part = hit
    order = np.lexsort((part, -acc[part]))
    cand = part[order][:k]
    kth = acc[cand[-1]]
    ge = acc >= kth
    if np.count_nonzero(ge) > cand.size:
        # k-th score is tied beyond the partition head: the exact top-k is
        # (all docs > kth) + (smallest doc_ids among the kth ties) — all
        # inside {score ≥ kth}, a small set ordered exactly
        idx = np.nonzero(ge)[0]
        order = np.lexsort((idx, -acc[idx]))[:k]
        cand = idx[order]
    return [(int(global_docs[i]), float(acc[i])) for i in cand]


def bm25_global_topk(
    term_postings: dict,
    global_docs: np.ndarray,
    n_docs: int,
    avg_dl: float,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    df_override: dict | None = None,
) -> list[tuple[int, float]]:
    """Global-accumulator exhaustive BM25: per-term (global_row, score)
    arrays are computed ONCE per term (term_rows_scores cache), then a
    query is one scatter-add per term into a dense float array + arg-top-k.

    Summation order per doc = sorted-term order (one add per term, in
    term order) — identical float results to wand_topk / the oracle.

    ``df_override`` maps term → GLOBAL df for sharded search (Solr
    distributed-IDF analog): scores become comparable across shards.
    """
    acc = np.zeros(global_docs.size, dtype=np.float64)
    for term in sorted(term_postings):
        tp = term_postings[term]
        if not tp.n_blocks:
            continue
        df_t = df_override.get(term, tp.df) if df_override else tp.df
        rows, scores = term_rows_scores(
            tp, global_docs, n_docs, avg_dl, df_t, k1, b
        )
        acc[rows] += scores  # rows are unique per term → plain fancy add
    return dense_row_topk(acc, global_docs, k)


# per-chunk accumulator budget for the batched scorer: chunk_rows × n_docs
# float64 cells. 2^22 cells = 32 MiB — measured optimum: the chunk (plus
# argpartition's index output of the same size) stays cache/TLB-friendly.
# A 128 MiB chunk measured 8-10× SLOWER end-to-end on the same workload
# (fill + scatter + 2D argpartition all go DRAM-bound), and several
# executor python workers share one node's memory bandwidth.
BATCH_ACC_MAX_CELLS = 1 << 22


def bm25_batch_global_topk(
    fetched: dict,
    qterms: list[list[str]],
    ks: list[int],
    global_docs: np.ndarray,
    n_docs: int,
    avg_dl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    df_override: dict | None = None,
) -> list[list[tuple[int, float]]]:
    """Term-at-a-time batch BM25 (VERDICT r3 #1): score MANY queries
    against one index in per-term passes instead of per-query loops.

    For each term (sorted order), the per-term (rows, scores) arrays are
    computed once, then added to every query containing the term with ONE
    2D outer-indexed scatter ``acc[np.ix_(query_rows, rows)] += scores`` —
    the sparse (queries × terms) · (terms × docs) product the batch is.
    Queries chunk so the accumulator stays ≤ BATCH_ACC_MAX_CELLS.

    EXHAUSTIVE-EQUIVALENT per query to bm25_global_topk bit-for-bit: each
    query's doc sums accumulate in global sorted-term order (a subset of
    the term passes), the same float-addition order as every other scorer,
    and top-k extraction shares dense_row_topk.

    ``qterms``: per-query term lists — only terms present in ``fetched``
    with blocks contribute (absent terms live on other shards / nowhere).
    """
    nq = len(qterms)
    out: list = [[] for _ in range(nq)]
    if nq == 0 or global_docs.size == 0:
        return out
    term_q: dict[str, list[int]] = {}
    for qi, ts in enumerate(qterms):
        for t in set(ts):
            tp = fetched.get(t)
            if tp is not None and tp.n_blocks:
                term_q.setdefault(t, []).append(qi)
    if not term_q:
        return out
    terms_sorted = sorted(term_q)
    chunk = max(1, min(nq, BATCH_ACC_MAX_CELLS // max(global_docs.size, 1)))
    acc = np.zeros((min(chunk, nq), global_docs.size), dtype=np.float64)
    for lo in range(0, nq, chunk):
        hi = min(lo + chunk, nq)
        acc[: hi - lo].fill(0.0)
        for term in terms_sorted:
            qis = [qi - lo for qi in term_q[term] if lo <= qi < hi]
            if not qis:
                continue
            tp = fetched[term]
            df_t = df_override.get(term, tp.df) if df_override else tp.df
            rows, scores = term_rows_scores(
                tp, global_docs, n_docs, avg_dl, df_t, k1, b
            )
            if len(qis) == 1:
                acc[qis[0], rows] += scores
            else:
                acc[np.ix_(np.asarray(qis, dtype=np.int64), rows)] += scores
        _chunk_topk(acc[: hi - lo], ks[lo:hi], global_docs, out, lo)
    return out


def _chunk_topk(
    A: np.ndarray,
    ks_sub: list[int],
    global_docs: np.ndarray,
    out: list,
    base: int,
) -> None:
    """Top-k extraction for a whole accumulator chunk at once.

    Per-row nonzero/argpartition/tie-check were ~85% of batch wall (each an
    O(n_docs) numpy call per query). Instead: ONE 2D ascending argpartition
    selects each row's top-C score columns (C = 2·max k — partitioning
    ascending at nd−C avoids negating the chunk), then exact (score desc,
    doc_id asc) ordering runs on ≤C candidates per row.

    Exactness: if fewer than C candidates are positive, every matching doc
    is inside the candidate set (top-C ⊇ all positives). If all C are
    positive, docs outside can only TIE the partition boundary min(cs), so
    kth > min(cs) proves the global top-k is inside; otherwise (ties reach
    the boundary — rare) the row falls back to the exact full-row path.
    Candidate column order == doc_id order (global_docs is sorted), so the
    lexsort tie-break matches dense_row_topk bit-for-bit.
    """
    nrows, nd = A.shape
    K = min(max(ks_sub), nd)
    C = min(max(2 * K, K + 8), nd)
    if C >= nd:
        for j in range(nrows):
            out[base + j] = dense_row_topk(A[j], global_docs, ks_sub[j])
        return
    cand = np.argpartition(A, nd - C, axis=1)[:, nd - C :]
    cs = np.take_along_axis(A, cand, axis=1)
    for j in range(nrows):
        cj, sj = cand[j], cs[j]
        pos = sj > 0.0
        n_pos = int(np.count_nonzero(pos))
        if n_pos == 0:
            out[base + j] = []
            continue
        if n_pos < C:
            cj, sj = cj[pos], sj[pos]
        k = min(ks_sub[j], nd)
        order = np.lexsort((cj, -sj))
        top = order[:k]
        kth = sj[top[-1]]
        if n_pos >= C and not kth > sj[order[-1]] and k < C:
            # k-th score ties the partition boundary, so docs outside the
            # candidate set may tie it too. kth is still the TRUE k-th
            # largest score (all C candidates ≥ every outside value), so
            # the exact top-k is inside {score ≥ kth} — order just those.
            row = A[j]
            idx = np.nonzero(row >= kth)[0]
            o2 = np.lexsort((idx, -row[idx]))[:k]
            out[base + j] = [
                (int(global_docs[i]), float(row[i])) for i in idx[o2]
            ]
            continue
        out[base + j] = [
            (int(global_docs[cj[i]]), float(sj[i])) for i in top
        ]


def bm25_dense_topk(
    term_postings: dict,
    n_docs: int,
    avg_dl: float,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    df_override: dict | None = None,
) -> list[tuple[int, float]]:
    """Vectorized exhaustive BM25 top-k — the dense-postings fast path.

    WAND's doc-at-a-time Python loop wins when it can SKIP (selective
    terms, huge N); with dense postings (head-term queries, small
    vocabularies) it degenerates to visiting everything at ~1 µs/doc.
    This path decodes whole blocks into numpy and scores every posting
    vectorized (~50× faster when no skipping is possible).

    EXHAUSTIVE-EQUIVALENT to wand_topk bit-for-bit: terms are accumulated
    in sorted-term order (np.add.at is sequential and unbuffered), so each
    doc's float-addition order matches WAND's full-score order.
    """
    ids_parts: list[np.ndarray] = []
    score_parts: list[np.ndarray] = []
    for term in sorted(term_postings):
        tp = term_postings[term]
        if not tp.n_blocks:
            continue
        df_t = df_override.get(term, tp.df) if df_override else tp.df
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        ids, tfs, dls, _, _ = tp.decode_full()
        ids_parts.append(ids)
        score_parts.append(idf * tfs / (tfs + k1 * (1.0 - b + b * dls / avg_dl)))
    if not ids_parts:
        return []
    ids = np.concatenate(ids_parts)
    sc = np.concatenate(score_parts)
    uniq, inv = np.unique(ids, return_inverse=True)
    acc = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(acc, inv, sc)
    if uniq.size > k:
        part = np.argpartition(-acc, k - 1)[: max(k * 4, k)]  # over-fetch for ties
        # exact order among the partitioned head (+ a safe margin for ties
        # at the boundary: re-partition wider until the cut is strict)
        cand = part
        order = np.lexsort((uniq[cand], -acc[cand]))
        cand = cand[order][:k]
        kth = acc[cand[-1]]
        # docs outside the candidate head could tie kth and win on doc_id:
        if np.count_nonzero(acc >= kth) > cand.size:
            order = np.lexsort((uniq, -acc))[:k]
            cand = order
        top = cand
    else:
        top = np.lexsort((uniq, -acc))
    return [(int(uniq[i]), float(acc[i])) for i in top[:k]]
