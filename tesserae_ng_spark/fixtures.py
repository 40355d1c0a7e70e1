"""Deterministic fixtures: the reference query set (FIXTURES.md §2).

Seeded RNG(42), no wall clock — identical queries every run, so bench
numbers and golden top-k are reproducible across rounds and parallelism
levels. Mix per FIXTURES.md: 40% single term, 30% 2-term, 15% 3-term,
10% exact phrase, 5% proximity; k ∈ {10, 1, 100}; plus the four mandated
edge queries (stopword-heavy, absent term, singleton term, head term).
"""

from __future__ import annotations

import numpy as np


def make_queries(vocab: list[tuple[str, int]], n: int = 60, seed: int = 42) -> list[dict]:
    """vocab = [(term, df)] sorted by df desc. → list of query dicts
    {query_id, query_text, mode, k}."""
    rng = np.random.RandomState(seed)
    terms = [t for t, _ in vocab]
    head = terms[0]
    singleton = min(vocab, key=lambda p: p[1])[0]
    out = []

    def pick(m):
        idx = rng.choice(len(terms), size=m, replace=False)
        return [terms[i] for i in idx]

    for qid in range(n - 4):
        r = rng.rand()
        k = [10, 1, 100][qid % 3] if qid % 7 == 0 else 10
        if r < 0.40:
            out.append(dict(query_text=" ".join(pick(1)), mode="bm25", k=k))
        elif r < 0.70:
            out.append(dict(query_text=" ".join(pick(2)), mode="bm25", k=k))
        elif r < 0.85:
            out.append(dict(query_text=" ".join(pick(3)), mode="bm25", k=k))
        elif r < 0.95:
            out.append(dict(query_text=" ".join(pick(2)), mode="phrase", k=k))
        else:
            out.append(dict(query_text=" ".join(pick(2)), mode="proximity", k=k))
    out.append(dict(query_text=f"{head} {terms[1]} {terms[2]}", mode="bm25", k=10))
    out.append(dict(query_text="zzqx notinthecorpus vvwy", mode="bm25", k=10))
    out.append(dict(query_text=singleton, mode="bm25", k=10))
    out.append(dict(query_text=head, mode="bm25", k=10))
    for i, q in enumerate(out):
        q["query_id"] = i
    return out
