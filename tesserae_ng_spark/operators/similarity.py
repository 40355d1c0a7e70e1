"""Similarity search over the `embeddings` table (array<float> column).

- brute-force cosine top-k (the correctness baseline; JVM-side arithmetic
  via transform/aggregate — no Python in the loop)
- LSH-bucketed variant (random hyperplanes) — the scale path: candidates
  come from matching signature buckets only, then exact re-rank.

Scale: brute force is O(Q×N) — fine for a broadcast query batch against a
partitioned corpus (each executor scans its shard; no shuffle). The LSH
variant bounds candidates per query; at 10^9 vectors use more tables/bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesserae_ng_spark.operators import register
from tesserae_ng_spark.operators.common import t

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _cosine_cols():
    # exact dot/norm arithmetic in double, JVM-side (whole-stage codegen):
    # cast float→double first (exact), then zip_with + aggregate.
    qa = F.transform(F.col("qv"), lambda x: x.cast("double"))
    ca = F.transform(F.col("cv"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(qa, ca, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nq = F.sqrt(
        F.aggregate(F.transform(qa, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    nc = F.sqrt(
        F.aggregate(F.transform(ca, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (nq * nc)


@register(
    "ann_bruteforce_topk",
    f"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
                  WHERE vec_id < {N_QUERIES}),
       c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
       sims AS (
         SELECT qid, cid,
                list_cosine_similarity(qv, cv) AS cos
         FROM q CROSS JOIN c WHERE qid <> cid),
       ranked AS (
         SELECT qid, cid, cos,
                row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
         FROM sims)
       SELECT qid, cid, CAST(rn AS BIGINT) AS rank, ROUND(cos, 4) AS cos
       FROM ranked WHERE rn <= {TOP_K}""",
)
def ann_bruteforce_topk(spark, sf):
    emb = t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    # broadcast the (small) query side; candidates stream through executors
    sims = (
        c.join(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", _cosine_cols().alias("cos"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "rank", F.round("cos", 4).alias("cos"))
    )


EMB_DEDUP_TAU = 0.4  # cosine near-dup threshold (testdata margin ≥1e-4)


@register(
    "dedup_embedding",
    f"""WITH p AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_cosine_similarity(a.embedding, b.embedding) AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
       SELECT id_a, id_b, ROUND(cos, 4) AS cos FROM p
       WHERE cos >= {EMB_DEDUP_TAU}""",
)
def dedup_embedding(spark, sf):
    """Embedding-cosine near-duplicate pairs (cos ≥ τ), exact.

    This is the VERIFICATION operator (exact all-pairs over one broadcast
    side — bounded to the testdata-sized embedding sets where it is
    hash-checked against DuckDB); the SWEEP path at 10^9+ vectors is the
    banded LSH below: bucket candidates, exact-cosine check on candidates
    only — same shape as minhash-LSH text dedup."""
    emb = t(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("qv"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("cv"))
    return (
        b.join(F.broadcast(a), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _cosine_cols().alias("cos"))
        .filter(F.col("cos") >= EMB_DEDUP_TAU)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


# Banded random-hyperplane LSH (Charikar 2002 SimHash buckets + the banding
# amplification of Leskovec et al. MMDS ch.3): BANDS independent tables of
# BITS_PER_BAND hyperplane signs each. A candidate pair must agree on ALL
# bits of at least one band: P(candidate) = 1-(1-p^BITS)^BANDS with
# p = 1 - angle/pi. These are THE scale knobs: at 10^9 vectors raise
# BITS_PER_BAND (smaller buckets, fewer candidates), raise BANDS to buy
# recall back. At sandbox similarity levels (top-5 neighbors at cos ~0.3),
# 8 bands x 3 bits gives measured recall ~0.9 vs brute force
# (tests/test_similarity.py pins recall >= 0.5).
LSH_BANDS = 8
LSH_BITS = 3


def lsh_band_buckets(emb_batch: pd.Series, planes: np.ndarray) -> list[list[int]]:
    """Vectorized band buckets: (n, dim) @ planes.T -> sign bits -> per-band
    bucket ints. One matrix multiply per Arrow batch — no per-row Python."""
    if len(emb_batch) == 0:  # empty Arrow batch (empty fragment/partition)
        return []
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb_batch])
    bits = (mat @ planes.T) > 0  # (n, BANDS*BITS)
    weights = 1 << np.arange(LSH_BITS)[::-1]
    out = np.zeros((mat.shape[0], LSH_BANDS), dtype=np.int64)
    for b in range(LSH_BANDS):
        out[:, b] = bits[:, b * LSH_BITS : (b + 1) * LSH_BITS] @ weights
    return [row.tolist() for row in out]


@register("ann_lsh_bucketed", None)  # bucketing is engine-internal → rows-only
def ann_lsh_bucketed(spark, sf):
    """Banded LSH ANN: signatures → posexplode to (band, bucket) → candidate
    join per band → distinct pairs → exact cosine re-rank top-k.

    Scale shape: shuffle is O(n·BANDS) signature rows, candidates only
    materialize for bucket collisions — never all pairs. The query side is
    broadcast (tiny); at 10^9 vectors the candidate join keys on
    (band, bucket) so skewed buckets split across reducers."""
    rng = np.random.RandomState(42)
    planes = rng.randn(LSH_BANDS * LSH_BITS, 64).astype(np.float64)
    planes_b = [r.tolist() for r in planes]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _bands(emb: pd.Series) -> pd.Series:
        p = np.array(planes_b)
        return pd.Series(lsh_band_buckets(emb, p))

    emb = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", _bands("embedding").alias("bands")
    )
    sig = emb.select(
        "vec_id", F.posexplode("bands").alias("band", "bucket")
    )
    qsig = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "band", "bucket"
    )
    cand = (
        sig.join(F.broadcast(qsig), ["band", "bucket"])
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", F.col("vec_id").alias("cid"))
        .distinct()
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        cand.join(F.broadcast(q), "qid")
        .join(c, "cid")
        .select("qid", "cid", _cosine_cols().alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "rank", F.round("cos", 4).alias("cos"))
    )
