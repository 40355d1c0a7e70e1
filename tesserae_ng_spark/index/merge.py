"""Stage B: salted external merge of shard blocks → final scored postings.

The skew-critical exchange (SURVEY.md §2.11 `salted_repartition_sort` +
`external_merge`). Head terms (Zipf: df("the") can be ~N at web scale)
would hot-spot a single reducer if the merge grouped by term alone, so the
merge key is (term, salt) where

    salt(doc) = (b32 * nsalt(term)) >> 32,   b32 = u64(doc_id) >> 32

i.e. contiguous doc-id RANGE buckets (integer-exact, identical in Spark SQL
and numpy). doc_id = xxhash64(url) is uniform over int64, so ranges are
balanced by construction, and because salts are ordered by doc range the
merged sub-lists concatenate in global docID order — the final per-term
posting stream is (salt asc, block_id asc), no k-way merge across salts
needed at query time.

nsalt(term) = ceil(df / target_postings_per_salt), so only head terms
split; the tail (nsalt=1) shuffles exactly once with no amplification.
Shard blocks whose [first_doc, last_doc] straddles a salt boundary are
routed to EVERY covering salt (sequence-explode) and each group filters
decoded postings to its own range — merge groups stay disjoint and
memory-bounded (≤ target postings) regardless of term df.

df/cf are computed from block METADATA (sum of n_docs / tf_sum per term)
— exact, no decode: each (term, doc) lives in exactly one shard because
shards partition docs by url hash.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tesserae_ng_spark.index.codec import (
    concat_decode_ids,
    concat_decode_varints,
    delta_encode_ids,
    split_varint_stream,
    to_u64,
    varint_encode,
)
from tesserae_ng_spark.schemas import BLOCK_SIZE, BM25_B, BM25_K1, POSTINGS_SCHEMA

_LONG_MIN = -(1 << 63)


def salt_expr(doc_col, nsalt_col):
    """Spark-side salt: (b32 * nsalt) >> 32 with b32 = u64(doc) >> 32."""
    b32 = F.shiftrightunsigned(doc_col.bitwiseXOR(F.lit(_LONG_MIN)), 32)
    return F.shiftrightunsigned(b32 * nsalt_col, 32).cast("int")


def salt_np(doc_ids: np.ndarray, nsalt: int) -> np.ndarray:
    """numpy-side salt — bit-identical to salt_expr."""
    b32 = to_u64(doc_ids) >> np.uint64(32)
    return ((b32 * np.uint64(nsalt)) >> np.uint64(32)).astype(np.int64)


def merge_shard_blocks(
    shard_blocks: DataFrame,
    n_docs: int,
    avg_dl: float,
    target_postings_per_salt: int = 1 << 20,
    max_salt: int = 1 << 10,
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """shard block rows → final POSTINGS_SCHEMA rows (scored, re-blocked)."""
    term_stats = shard_blocks.groupBy("term").agg(
        F.sum("n_docs").alias("df"),
        F.sum("tf_sum").alias("cf"),
    )
    term_stats = term_stats.withColumn(
        "nsalt",
        F.least(
            F.greatest(
                F.ceil(F.col("df") / F.lit(target_postings_per_salt)), F.lit(1)
            ),
            F.lit(max_salt),
        ).cast("int"),
    )
    # route each block to every salt its doc range covers (straddlers are
    # rare: only blocks crossing a range boundary duplicate)
    routed = (
        shard_blocks.join(term_stats, "term")
        .withColumn("salt_lo", salt_expr(F.col("block_first_doc"), F.col("nsalt")))
        .withColumn("salt_hi", salt_expr(F.col("block_last_doc"), F.col("nsalt")))
        .withColumn("salt", F.explode(F.sequence("salt_lo", "salt_hi")))
        .drop("salt_lo", "salt_hi")
    )

    n_docs_f = float(n_docs)
    avg_dl_f = float(avg_dl)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        nsalt = int(pdf["nsalt"].iloc[0])
        df_t = int(pdf["df"].iloc[0])
        idf = math.log(1.0 + (n_docs_f - df_t + 0.5) / (df_t + 0.5))

        # decode the whole group's blocks in THREE vectorized passes (one
        # joined varint decode per column) instead of per-block-row loops —
        # at web scale a (head-term, salt) group holds up to
        # target_postings_per_salt postings across hundreds of blocks
        counts = pdf["n_docs"].to_numpy(dtype=np.int64)
        id_bufs = [bytes(x) for x in pdf["doc_ids"]]
        all_ids = concat_decode_ids(id_bufs, counts)
        all_tfs = concat_decode_varints(
            [bytes(x) for x in pdf["tfs"]]
        ).astype(np.int64)
        all_dls = concat_decode_varints(
            [bytes(x) for x in pdf["dls"]]
        ).astype(np.int64)
        pos_col = pdf["positions"]
        # positional only when EVERY block row carries positions — a mixed
        # group (e.g. a with_positions=False shard merged next to positional
        # ones via a direct _merge_all call) degrades to non-positional
        # instead of crashing on bytes(None) or silently dropping some docs
        has_pos = len(pdf) > 0 and all(b is not None for b in pos_col)
        if has_pos:
            # per-doc byte chunks, NO value decode (chunks are
            # self-contained: absolute first position per doc)
            flat_pos: list = []
            starts = np.cumsum(counts) - counts
            for r, buf in enumerate(pos_col):
                flat_pos.extend(
                    split_varint_stream(
                        bytes(buf), all_tfs[starts[r] : starts[r] + counts[r]]
                    )
                )
        # keep only this salt's doc range (straddling blocks carry a few
        # foreign postings)
        keep = salt_np(all_ids, nsalt) == salt
        if not keep.all():
            idx = np.nonzero(keep)[0]
            all_ids, all_tfs, all_dls = all_ids[idx], all_tfs[idx], all_dls[idx]
            if has_pos:
                flat_pos = [flat_pos[i] for i in idx]
        if not all_ids.size:
            return pd.DataFrame(columns=[f.name for f in POSTINGS_SCHEMA.fields])
        order = np.argsort(all_ids, kind="mergesort")
        all_ids, all_tfs, all_dls = all_ids[order], all_tfs[order], all_dls[order]
        all_pos = [flat_pos[i] for i in order] if has_pos else None
        scores = idf * all_tfs / (
            all_tfs + k1 * (1.0 - b + b * all_dls / avg_dl_f)
        )
        rows = []
        for bi, start in enumerate(range(0, all_ids.size, block_size)):
            sl = slice(start, min(start + block_size, all_ids.size))
            ids_b, tfs_b = all_ids[sl], all_tfs[sl]
            rows.append(
                {
                    "term": term,
                    "salt": salt,
                    "block_id": bi,
                    "n_docs": int(ids_b.size),
                    "block_first_doc": int(ids_b[0]),
                    "block_last_doc": int(ids_b[-1]),
                    "block_max_score": float(scores[sl].max()),
                    "block_max_tf": int(tfs_b.max()),
                    "block_min_dl": int(all_dls[sl].min()),
                    "doc_ids": delta_encode_ids(ids_b),
                    "tfs": varint_encode(tfs_b.astype(np.uint64)),
                    "dls": varint_encode(all_dls[sl].astype(np.uint64)),
                    "positions": (
                        b"".join(all_pos[sl.start : sl.stop])
                        if all_pos is not None
                        else None
                    ),
                }
            )
        return pd.DataFrame(rows)

    from tesserae_ng_spark.index.grouped import grouped_map_sorted

    # one exchange keyed by (term, salt) + partition-sorted grouped merge:
    # Arrow cost per batch, not per group (12k+ groups on a realistic
    # dictionary made per-group applyInPandas plumbing ~5x the merge work)
    return grouped_map_sorted(
        routed, ["term", "salt"], merge_group, POSTINGS_SCHEMA
    )


def build_dictionary(postings: DataFrame, term_stats_cf: DataFrame, n_buckets: int) -> DataFrame:
    """final blocks (+cf) → DICTIONARY_SCHEMA rows."""
    d = postings.groupBy("term").agg(
        F.sum("n_docs").alias("df"),
        F.count("*").cast("int").alias("n_blocks"),
        F.max("block_max_score").alias("max_score"),
    )
    return (
        d.join(term_stats_cf.select("term", "cf"), "term")
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        .select("term", "df", "cf", "max_score", "n_blocks", "bucket")
    )
