"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard — each over
the `documents` table. Exact + Jaccard are SQL-checkable; the hash-family
ops (MinHash/SimHash) use engine-internal hash functions with no DuckDB
equivalent → rows-only checks + pytest property tests (tests/test_dedup.py).

Scale notes: every variant is a groupBy/join on a bounded-width key —
shuffle volume is O(signatures), not O(pairs). The LSH band join only
materializes candidate pairs that share a band bucket (Broder 1997;
Leskovec et al., Mining of Massive Datasets ch.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesserae_ng_spark.operators import register
from tesserae_ng_spark.operators.common import TOKS_CTE, t

N_PERM = 64  # minhash permutations
BANDS = 16  # 16 bands × 4 rows — catches jaccard ≳ 0.5 pairs
ROWS_PER_BAND = N_PERM // BANDS
_MERSENNE = (1 << 61) - 1


@register(
    "dedup_exact",
    """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents)
       SELECT h AS content_hash, CAST(min(doc_id) AS BIGINT) AS keeper,
              CAST(count(*) AS BIGINT) AS n_copies
       FROM h GROUP BY h""",
)
def dedup_exact(spark, sf):
    # exact dedup: hash-groupBy on md5(text), keep lowest doc_id.
    # At 100 TB: map-side partial agg on the 16-byte hash → tiny shuffle.
    return (
        t(spark, sf, "documents")
        .select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count("*").alias("n_copies"),
        )
    )


def _minhash_params():
    # deterministic affine permutations over the Mersenne prime field
    rng = np.random.RandomState(42)
    a = rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles → stable 61-bit hashes (FNV-1a over the shingle)."""
    toks = text.lower().split()
    if len(toks) < k:
        toks = toks + ["\x00"] * (k - len(toks))
    out = np.empty(max(1, len(toks) - k + 1), dtype=np.uint64)
    for i in range(out.size):
        h = np.uint64(0xCBF29CE484222325)
        for ch in " ".join(toks[i : i + k]).encode():
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h % np.uint64(_MERSENNE)
    return out


def minhash_signature(text: str) -> list[int]:
    a, b = _MINHASH_A, _MINHASH_B
    sh = _shingle_hashes(text)
    # sig[j] = min over shingles of (a_j * x + b_j) mod p   (vectorized)
    prod = (sh[:, None].astype(object) * a[None, :].astype(object) + b) % _MERSENNE
    return np.min(np.array(prod, dtype=np.uint64), axis=0).astype(np.int64).tolist()


_MINHASH_A, _MINHASH_B = _minhash_params()


@register("dedup_minhash_lsh", None)  # engine-hash-based → rows-only check
def dedup_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup candidate pairs with exact-Jaccard verification.

    shingle → 64-perm minhash (pandas UDF) → band buckets → self-join on
    (band, bucket) → exact token-set Jaccard on candidates only.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        return text.map(lambda s: minhash_signature(s or ""))

    docs = t(spark, sf, "documents").select("doc_id", "text")
    sigs = docs.select("doc_id", _sig("text").alias("sig"))
    # band buckets: hash each band's slice
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        F.slice("sig", i * ROWS_PER_BAND + 1, ROWS_PER_BAND).cast(
                            "string"
                        )
                    )
                    for i in range(BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .distinct()
    )
    # exact verify on candidates only (token-set Jaccard ≥ 0.5)
    tok_sets = docs.select(
        "doc_id",
        F.array_distinct(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("terms"),
    )
    av = tok_sets.select(F.col("doc_id").alias("a"), F.col("terms").alias("ta"))
    bv = tok_sets.select(F.col("doc_id").alias("b"), F.col("terms").alias("tb"))
    return (
        cand.join(av, "a")
        .join(bv, "b")
        .select(
            "a",
            "b",
            F.round(
                F.size(F.array_intersect("ta", "tb"))
                / F.size(F.array_union("ta", "tb")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


@register("dedup_simhash", None)  # engine-hash-based → rows-only check
def dedup_simhash(spark, sf):
    """64-bit SimHash per doc (Charikar 2002): sign of the weighted sum of
    term-hash bit vectors. Near-dups differ in few bits (Hamming ≤ 3)."""

    @F.pandas_udf(T.LongType())
    def _simhash(text: pd.Series) -> pd.Series:
        def sh(s: str) -> int:
            acc = np.zeros(64, dtype=np.int64)
            for tok in (s or "").lower().split():
                h = 0xCBF29CE484222325
                for ch in tok.encode():
                    h = (h ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF
                bits = np.unpackbits(
                    np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8),
                    bitorder="little",
                )
                acc += np.where(bits == 1, 1, -1)
            v = 0
            for i in range(64):
                if acc[i] > 0:
                    v |= 1 << i
            return v - (1 << 64) if v >= (1 << 63) else v  # to signed int64

        return text.map(sh)

    return t(spark, sf, "documents").select(
        "doc_id", _simhash("text").alias("simhash")
    )


@register(
    "ngram_jaccard",
    f"""WITH {TOKS_CTE},
       tri AS (
         SELECT DISTINCT a.doc_id AS doc_id,
                a.term || ' ' || b.term || ' ' || c.term AS tri
         FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                     JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
       sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tri GROUP BY doc_id),
       pairs AS (
         SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
         FROM tri x JOIN tri y ON x.tri = y.tri AND x.doc_id < y.doc_id
         WHERE x.doc_id < 20 AND y.doc_id < 20
         GROUP BY x.doc_id, y.doc_id)
       SELECT pairs.a AS a, pairs.b AS b,
              ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
       FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id
                  JOIN sizes sb ON pairs.b = sb.doc_id""",
)
def ngram_jaccard(spark, sf):
    # exact 3-gram Jaccard between doc pairs (bounded to doc_id < 20 —
    # pairwise Jaccard is a verification tool, not a sweep; the sweep path
    # is minhash LSH above).
    from tesserae_ng_spark.operators.common import tokens_df

    toks = tokens_df(spark, sf)
    a_, b_, c_ = toks.alias("a"), toks.alias("b"), toks.alias("c")
    tri = (
        a_.join(
            b_,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .join(
            c_,
            (F.col("a.doc_id") == F.col("c.doc_id"))
            & (F.col("c.pos") == F.col("a.pos") + 2),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", "a.term", "b.term", "c.term").alias("tri"),
        )
        .distinct()
    )
    sizes = tri.groupBy("doc_id").agg(F.count("*").alias("n"))
    x, y = tri.alias("x"), tri.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.tri") == F.col("y.tri"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .filter((F.col("x.doc_id") < 20) & (F.col("y.doc_id") < 20))
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )
