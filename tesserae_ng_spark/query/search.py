"""Query executor: BM25 / phrase / proximity search over a built index.

Single-query path (SURVEY.md §3.2): runs fully in-process — analyze the
query with the SAME chain used at index time (plain-Python functions),
pyarrow-fetch the terms' dictionary rows + posting blocks, run block-max
WAND. No Spark session needed (the reference's always-warm Solr core
analog). Batch path: distribute queries over executors; each executor
opens the same index (local FS here, object store at scale) — queries are
embarrassingly parallel once the index is immutable.

Positional modes (SURVEY.md §2.9 / §3.3 — the Tesserae comparison
re-expressed over positional postings):

- phrase:     docs where the query terms occur consecutively (pos_i+1 ==
              pos_{i+1} ... exact phrase). tf = number of phrase starts;
              score = BM25 with df = number of phrase-matching docs.
- proximity:  docs where all terms co-occur within a token window w.
              score = ln((Σ_t 1/tf_t) / max(d, 1)) with d = minimal span
              covering one occurrence of every term — the Tesserae
              distance-weighted formula (Forstall et al. 2014 shape).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from tesserae_ng_spark.functions.analysis import analyze_query
from tesserae_ng_spark.query.reader import IndexReader, TermPostings
from tesserae_ng_spark.query.wand import wand_topk
from tesserae_ng_spark.schemas import BM25_B, BM25_K1


@dataclass
class Hit:
    rank: int
    doc_id: int
    score: float


class Searcher:
    def __init__(self, index_dir: str, lang: str = "en"):
        self.reader = IndexReader(index_dir)
        self.lang = lang

    def search(self, query_text: str, k: int = 10, mode: str = "bm25",
               window: int = 5) -> list[Hit]:
        terms = analyze_query(query_text, self.lang)
        if not terms:
            return []
        fetched = self.reader.fetch(terms)
        if not fetched:
            return []
        if mode == "bm25":
            top = wand_topk(fetched, self.reader.n_docs, self.reader.avg_dl, k)
        elif mode == "phrase":
            ordered = [fetched[t] for t in terms if t in fetched]
            if len(ordered) < len(terms):
                return []  # a phrase term missing from the corpus → no match
            top = phrase_topk(ordered, self.reader.n_docs, self.reader.avg_dl, k)
        elif mode == "proximity":
            uniq = sorted(set(terms))
            if any(t not in fetched for t in uniq):
                return []
            top = proximity_topk([fetched[t] for t in uniq], window, k)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return [Hit(rank=i + 1, doc_id=d, score=s) for i, (d, s) in enumerate(top)]


# ---------------------------------------------------------------------------
# conjunctive positional iteration
# ---------------------------------------------------------------------------


class _PosCursor:
    """Doc-at-a-time cursor with positions, over one term's blocks."""

    def __init__(self, tp: TermPostings):
        self.blocks = tp.blocks
        self.bi = -1
        self.pi = 0
        self._ids = None
        self._tfs = None
        self._pos = None
        self.exhausted = False
        self._next_block()

    def _next_block(self) -> bool:
        self.bi += 1
        if self.bi >= len(self.blocks):
            self.exhausted = True
            return False
        blk = self.blocks[self.bi]
        self._ids, self._tfs, _ = blk.decode()
        self._pos = None  # decode lazily
        self.pi = 0
        return True

    def cur_doc(self) -> int:
        return int(self._ids[self.pi])

    def cur_tf(self) -> int:
        return int(self._tfs[self.pi])

    def cur_positions(self) -> np.ndarray:
        if self._pos is None:
            self._pos = self.blocks[self.bi].decode_positions()
            if self._pos is None:
                raise RuntimeError("index built without positions")
        return self._pos[self.pi]

    def advance_to(self, target: int) -> bool:
        while True:
            if self.blocks[self.bi].last_doc >= target:
                self.pi = int(np.searchsorted(self._ids[self.pi:], target)) + self.pi
                return True
            if not self._next_block():
                return False

    def next(self) -> bool:
        self.pi += 1
        if self.pi < self._ids.size:
            return True
        return self._next_block()


def _conjunctive_docs(tps: list[TermPostings]):
    """Yield (doc_id, [cursor per term]) for docs containing ALL terms."""
    cursors = [_PosCursor(tp) for tp in tps]
    if any(c.exhausted for c in cursors):
        return
    target = max(c.cur_doc() for c in cursors)
    while True:
        aligned = True
        for c in cursors:
            if not c.advance_to(target):
                return
            if c.cur_doc() != target:
                target = c.cur_doc()
                aligned = False
                break
        if aligned:
            yield target, cursors
            if not cursors[0].next():
                return
            target = max(c.cur_doc() for c in cursors)


def _phrase_count(pos_lists: list[np.ndarray]) -> int:
    """Number of start positions where terms occur consecutively."""
    starts = pos_lists[0]
    for i, pl in enumerate(pos_lists[1:], start=1):
        need = starts + i
        mask = np.isin(need, pl)
        starts = starts[mask]
        if starts.size == 0:
            return 0
    return int(starts.size)


def _min_cover_span(pos_lists: list[np.ndarray]) -> int:
    """Minimal token span containing ≥1 occurrence of every term."""
    merged = []
    for ti, pl in enumerate(pos_lists):
        merged.extend((int(p), ti) for p in pl)
    merged.sort()
    need = len(pos_lists)
    counts = [0] * need
    have = 0
    best = None
    left = 0
    for right in range(len(merged)):
        counts[merged[right][1]] += 1
        if counts[merged[right][1]] == 1:
            have += 1
        while have == need:
            span = merged[right][0] - merged[left][0]
            best = span if best is None else min(best, span)
            counts[merged[left][1]] -= 1
            if counts[merged[left][1]] == 0:
                have -= 1
            left += 1
    return best if best is not None else -1


def phrase_topk(ordered_tps: list[TermPostings], n_docs: int, avg_dl: float,
                k: int, k1: float = BM25_K1, b: float = BM25_B):
    """Exact-phrase top-k. Two passes over the (small) conjunctive candidate
    set: first collect phrase tf per doc (df_phrase needs all matches),
    then score with BM25(tf=phrase count, df=df_phrase)."""
    matches = []  # (doc_id, tf_phrase, dl)
    for doc, cursors in _conjunctive_docs(ordered_tps):
        pos_lists = [c.cur_positions() for c in cursors]
        tf = _phrase_count(pos_lists)
        if tf > 0:
            _, tfs, dls = cursors[0].blocks[cursors[0].bi].decode()
            matches.append((doc, tf, int(dls[cursors[0].pi])))
    if not matches:
        return []
    df = len(matches)
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    scored = [
        (idf * tf / (tf + k1 * (1.0 - b + b * dl / avg_dl)), doc)
        for doc, tf, dl in matches
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(doc, s) for s, doc in scored[:k]]


def proximity_topk(tps: list[TermPostings], window: int, k: int):
    """Proximity top-k with the Tesserae distance-weighted score."""
    scored = []
    for doc, cursors in _conjunctive_docs(tps):
        pos_lists = [c.cur_positions() for c in cursors]
        d = _min_cover_span(pos_lists)
        if d < 0 or d > window:
            continue
        inv_f = sum(1.0 / c.cur_tf() for c in cursors)
        scored.append((math.log(inv_f / max(d, 1)), doc))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(doc, s) for s, doc in scored[:k]]


# ---------------------------------------------------------------------------
# distributed batch mode
# ---------------------------------------------------------------------------


def search_batch(spark, index_dir: str, queries: list[dict], k: int = 10):
    """Run many queries distributed: each executor opens the immutable index
    and serves its partition of queries (broadcast-free — queries are data,
    the index is shared storage). Returns DataFrame(query_id, rank, doc_id,
    score)."""
    sc = spark.sparkContext
    n_slices = min(len(queries), sc.defaultParallelism) or 1

    def run_part(qs):
        searcher = Searcher(index_dir)
        for q in qs:
            for hit in searcher.search(
                q["query_text"], k=q.get("k", k), mode=q.get("mode", "bm25"),
                window=q.get("window", 5),
            ):
                yield (q["query_id"], hit.rank, hit.doc_id, hit.score)

    rdd = sc.parallelize(queries, n_slices).mapPartitions(run_part)
    return spark.createDataFrame(
        rdd, "query_id long, rank int, doc_id long, score double"
    )
