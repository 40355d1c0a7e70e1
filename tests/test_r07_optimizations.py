"""Round-7 optimization pins: every change here altered HOW something is
computed, never WHAT — these tests pin the equivalences directly.

- affinity_slices: exact partition of the input (no query lost/duplicated),
  determinism, slice-count bound, and result-identity of search_batch under
  it (batch == per-query searcher) is covered by the existing batch tests.
- build_dictionary: cf from decoded final-block tfs == cf from shard-block
  tf_sum sums (the old two-scan formula).
- dedup candidate generation: groupBy + in-bucket combination expansion ==
  the former band self-join, pair for pair.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# affinity_slices
# ---------------------------------------------------------------------------


def _mk_queries(n):
    terms = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    out = []
    for i in range(n):
        text = " ".join(terms[(i + j) % len(terms)] for j in range(1 + i % 3))
        out.append({"query_id": i, "query_text": text, "k": 10})
    return out


def test_affinity_slices_partition_and_determinism():
    from tesserae_ng_spark.query.search import affinity_slices

    qs = _mk_queries(100)
    df = {"alpha": 1000, "beta": 500, "gamma": 100, "delta": 10, "epsilon": 5}
    a = affinity_slices(qs, 8, "en", df=df)
    b = affinity_slices(qs, 8, "en", df=df)
    # deterministic
    assert [[q["query_id"] for q in s] for s in a] == [
        [q["query_id"] for q in s] for s in b
    ]
    # exact partition: every query exactly once
    ids = sorted(q["query_id"] for s in a for q in s)
    assert ids == list(range(100))
    assert 1 <= len(a) <= 8
    # no df given → occurrence-count fallback still partitions exactly
    c = affinity_slices(qs, 4, "en")
    assert sorted(q["query_id"] for s in c for q in s) == list(range(100))


def test_affinity_slices_edges():
    from tesserae_ng_spark.query.search import affinity_slices

    assert affinity_slices([], 8) == []
    one = [{"query_id": 0, "query_text": "", "k": 5}]
    assert affinity_slices(one, 8) == [one]
    # n_slices=1 → single slice, original order
    qs = _mk_queries(5)
    assert affinity_slices(qs, 1) == [qs]


# ---------------------------------------------------------------------------
# build_dictionary: one-scan cf == old two-scan cf
# ---------------------------------------------------------------------------


def test_build_dictionary_cf_matches_shard_tf_sums(spark, sf_dir, tmp_path):
    import shutil

    from tesserae_ng_spark.index.builder import build_index
    from tesserae_ng_spark.index.merge import build_dictionary
    from tesserae_ng_spark.sources.corpus import synthesize_corpus

    out = str(tmp_path / "idx")
    shutil.rmtree(out, ignore_errors=True)
    corpus = synthesize_corpus(spark, sf_dir)
    build_index(
        spark, corpus, out, n_parts=2, lang="es",
        target_postings_per_salt=32, block_size=16, n_buckets=4,
    )
    new = (
        build_dictionary(spark.read.parquet(f"{out}/postings"), 4)
        .orderBy("term")
        .collect()
    )
    old_cf = {
        r["term"]: r["cf"]
        for r in spark.read.parquet(f"{out}/shards/postings")
        .groupBy("term")
        .agg(F.sum("tf_sum").alias("cf"))
        .collect()
    }
    assert len(new) == len(old_cf) > 0
    for r in new:
        assert r["cf"] == old_cf[r["term"]], r["term"]


# ---------------------------------------------------------------------------
# dedup candidate generation: expansion == self-join
# ---------------------------------------------------------------------------


def test_dedup_candidate_expansion_matches_self_join(spark, sf_dir):
    from tesserae_ng_spark.operators.dedup import (
        BANDS,
        ROWS_PER_BAND,
        batch_minhash_signatures,
    )
    from tesserae_ng_spark.operators.common import t

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        return pd.Series(list(batch_minhash_signatures(text)))

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = docs.select("doc_id", _sig("text").alias("sig"))
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        F.slice(
                            "sig", i * ROWS_PER_BAND + 1, ROWS_PER_BAND
                        ).cast("string")
                    )
                    for i in range(BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    new = (
        bands.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    old = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    new_pairs = sorted((r["a"], r["b"]) for r in new.collect())
    old_pairs = sorted((r["a"], r["b"]) for r in old.collect())
    assert new_pairs == old_pairs
    assert len(new_pairs) > 0
