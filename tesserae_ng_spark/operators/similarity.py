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


@register("ann_lsh_bucketed", None)  # bucketing is engine-internal → rows-only
def ann_lsh_bucketed(spark, sf):
    """Random-hyperplane LSH: 16-bit signatures, candidates share signature,
    exact cosine re-rank within buckets. Recall < 1 by design — the scale
    path for 10^9+ vectors (multi-probe / more tables raise recall)."""
    rng = np.random.RandomState(42)
    planes = rng.randn(16, 64).astype(np.float64)
    planes_b = [r.tolist() for r in planes]

    @F.pandas_udf(T.IntegerType())
    def _sig(emb: pd.Series) -> pd.Series:
        p = np.array(planes_b)

        def s(v):
            bits = (p @ np.asarray(v, dtype=np.float64)) > 0
            return int(np.packbits(bits).view(">u2")[0])

        return emb.map(s)

    emb = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", _sig("embedding").alias("sig")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("sig").alias("qsig"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("sig").alias("csig"),
    )
    cand = c.join(F.broadcast(q), F.col("qsig") == F.col("csig")).filter(
        F.col("qid") != F.col("cid")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        cand.select("qid", "cid", _cosine_cols().alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "cid", "rank", F.round("cos", 4).alias("cos"))
    )
