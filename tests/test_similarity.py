"""ANN operator tests: banded-LSH recall vs the brute-force baseline.

The LSH variant is the 10^9-vector scale path; it is only useful if its
measured recall against exact cosine top-k is material. VERDICT r1 flagged
the old single-table 16-bit variant at recall 0 — this pins recall ≥ 0.5
on the driver testdata so the regression cannot recur silently.
"""

import numpy as np
import pandas as pd

from tesserae_ng_spark.operators.similarity import (
    LSH_BANDS,
    LSH_BITS,
    TOP_K,
    ann_bruteforce_topk,
    ann_lsh_bucketed,
    lsh_band_buckets,
)


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r["qid"], r["cid"])
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    approx = {
        (r["qid"], r["cid"]) for r in ann_lsh_bucketed(spark, sf_dir).collect()
    }
    assert exact, "brute force returned nothing — fixture broken"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall:.2f} < 0.5"


def test_lsh_returns_ranked_topk(spark, sf_dir):
    rows = ann_lsh_bucketed(spark, sf_dir).collect()
    assert rows, "LSH returned zero rows (the r1 regression)"
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append((r["rank"], r["cos"]))
    for qid, rs in per_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        coss = [x[1] for x in rs]
        assert coss == sorted(coss, reverse=True)


def test_band_buckets_shape_and_range():
    rng = np.random.RandomState(0)
    planes = rng.randn(LSH_BANDS * LSH_BITS, 64)
    emb = pd.Series([rng.randn(64).tolist() for _ in range(17)])
    out = lsh_band_buckets(emb, planes)
    assert len(out) == 17
    for row in out:
        assert len(row) == LSH_BANDS
        assert all(0 <= b < (1 << LSH_BITS) for b in row)


def test_identical_vectors_always_collide():
    rng = np.random.RandomState(1)
    planes = rng.randn(LSH_BANDS * LSH_BITS, 64)
    v = rng.randn(64).tolist()
    a, b = lsh_band_buckets(pd.Series([v, v]), planes)
    assert a == b
