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
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tesserae_ng_spark.index.codec import (
    concat_decode_ids,
    concat_decode_varints,
    delta_encode_ids,
    expand_segment_values,
    from_u64,
    split_varint_stream,
    to_u64,
    varint_decode,
    varint_encode,
    varint_encode_lengths,
)
from tesserae_ng_spark.schemas import BLOCK_SIZE, BM25_B, BM25_K1, POSTINGS_SCHEMA

_LONG_MIN = -(1 << 63)

# per-call row bound for the Arrow batch merge (see merge_shard_blocks)
MERGE_BATCH_MAX_ROWS = int(os.environ.get("TNG_MERGE_BATCH_ROWS", "1536"))


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
    n_buckets: int | None = None,
    merge_width: int | None = None,
) -> DataFrame:
    """shard block rows → final POSTINGS_SCHEMA rows (scored, re-blocked).

    With ``n_buckets`` set, the merge exchange partitions by the FINAL
    storage bucket ``pmod(xxhash64(term), n_buckets)`` instead of
    (term, salt): the output is then already in sink layout — complete
    term groups per partition, (term, salt, block_id)-ordered — so the
    caller writes it directly with NO second shuffle and NO sort. The
    round-6 grouped-stage profile motivated this: the Arrow merge body
    is ~1.2 s/worker while the merge phase wall was 11-41 s, i.e. ~95%
    of the phase was JVM-side — half of it the now-removed second
    full shuffle + sort of the final postings. At cluster scale
    ``n_buckets`` must grow with the cluster (it caps merge/write
    parallelism); per-GROUP working sets stay salt-bounded either way."""
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

    def merge_batch(tbl):
        return merge_batch_arrow(
            tbl, n_docs_f, avg_dl_f,
            block_size=block_size, k1=k1, b=b,
        )

    from tesserae_ng_spark.index.grouped import grouped_arrow_sorted

    # one exchange keyed by (term, salt) + partition-sorted Arrow-native
    # batch merge: decode/score/re-encode run ONCE per Arrow batch over
    # many complete groups — per-group applyInPandas plumbing and per-row
    # bytes objects both dominated this stage on realistic dictionaries
    # (merge_group_reference below is the per-group spec; equivalence is
    # pinned bit-exactly in tests/test_merge_arrow.py)
    # max_rows bounds the per-call working set: a merge input row carries
    # up to a whole shard block (block_size postings), so 10k-row Arrow
    # batches decode to ~1.3M-posting transient arrays — a ~400 MB peak
    # whose FIRST touch costs ~50 s/worker on this VM's lazily-backed
    # memory (memtune.py). ~1.5k rows ≈ 200k postings keeps the one-time
    # arena growth at a few MB-scale faults while batch amortization stays
    # intact (measured: stage 117 s → 9 s cold).
    if n_buckets is not None:
        routed = routed.withColumn(
            "_bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
        )
        part_cols = ["_bucket"]
        n_parts = n_buckets
        if merge_width and merge_width > n_buckets:
            # n_buckets caps merge parallelism (it IS the exchange key);
            # when the caller has more cores than buckets, sub-split each
            # bucket with an INDEPENDENT term hash (same-hash mod would
            # correlate with _bucket and collapse the combinations) — the
            # write still lands rows in their bucket dir, just as a few
            # files per bucket instead of one (r7, guide §2.5: more
            # distinct partition values than partitions)
            sub = -(-merge_width // n_buckets)  # ceil
            routed = routed.withColumn(
                "_sub",
                F.pmod(
                    F.xxhash64(F.col("term"), F.lit(1)), F.lit(sub)
                ).cast("int"),
            )
            part_cols = ["_bucket", "_sub"]
            n_parts = merge_width
        return grouped_arrow_sorted(
            routed, ["term", "salt"], merge_batch, POSTINGS_SCHEMA,
            n_parts=n_parts, partition_cols=part_cols,
            max_rows=MERGE_BATCH_MAX_ROWS,
        )
    return grouped_arrow_sorted(
        routed, ["term", "salt"], merge_batch, POSTINGS_SCHEMA,
        max_rows=MERGE_BATCH_MAX_ROWS,
    )


def merge_group_reference(
    pdf: pd.DataFrame, n_docs: int, avg_dl: float,
    block_size: int = BLOCK_SIZE, k1: float = BM25_K1, b: float = BM25_B,
) -> pd.DataFrame:
    """Per-(term, salt)-group merge — the SPEC for merge_batch_arrow,
    byte-for-byte (tests/test_merge_arrow.py pins equivalence). Same body
    merge_shard_blocks used to run under grouped_map_sorted."""
    n_docs_f = float(n_docs)
    avg_dl_f = float(avg_dl)
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    nsalt = int(pdf["nsalt"].iloc[0])
    df_t = int(pdf["df"].iloc[0])
    idf = math.log(1.0 + (n_docs_f - df_t + 0.5) / (df_t + 0.5))
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
    has_pos = len(pdf) > 0 and all(bb is not None for bb in pos_col)
    flat_pos: list = []
    if has_pos:
        starts = np.cumsum(counts) - counts
        for r, buf in enumerate(pos_col):
            flat_pos.extend(
                split_varint_stream(
                    bytes(buf), all_tfs[starts[r] : starts[r] + counts[r]]
                )
            )
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


def _column_value_bytes(tbl, name: str):
    """An Arrow binary column's values as ONE contiguous bytes object
    (rows concatenate in order) — the batch decoders exploit that varint
    streams are self-delimiting."""
    arr = tbl.column(name).combine_chunks()
    bufs = arr.buffers()
    n = len(arr)
    off = np.frombuffer(
        bufs[1], dtype=np.int32, count=n + 1 + arr.offset
    )[arr.offset:]
    data = bytes(bufs[2])[off[0]:off[-1]]
    return data, off - off[0]


def merge_batch_arrow(
    tbl,
    n_docs_f: float,
    avg_dl_f: float,
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
):
    """Arrow-native merge of a table of COMPLETE (term, salt) groups →
    one RecordBatch of final scored POSTINGS_SCHEMA rows (or None).

    Byte-identical to merge_group_reference per group (pinned in
    tests/test_merge_arrow.py, incl. block_max_score float bits — idf is
    computed with math.log per group, matching the reference exactly).
    All work is batch-wide: ONE varint decode per payload column (rows'
    buffers are contiguous in Arrow), one lexsort, one scoring pass, one
    varint encode per output column, zero per-row/per-block Python."""
    import pyarrow as pa

    tbl = tbl.combine_chunks()
    nrows = tbl.num_rows
    if nrows == 0:
        return None
    term_arr = tbl.column("term").combine_chunks()
    tcodes = term_arr.dictionary_encode().indices.to_numpy(
        zero_copy_only=False
    )
    salt_row = tbl.column("salt").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    nsalt_row = tbl.column("nsalt").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    df_row = tbl.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    counts = tbl.column("n_docs").to_numpy(zero_copy_only=False).astype(
        np.int64
    )

    rchange = np.empty(nrows, dtype=bool)
    rchange[0] = True
    rchange[1:] = (tcodes[1:] != tcodes[:-1]) | (salt_row[1:] != salt_row[:-1])
    row_group = np.cumsum(rchange) - 1  # group ordinal per row
    g_first_row = np.flatnonzero(rchange).astype(np.int64)

    # ---- batch decode (value space: one entry per posting, pre-filter)
    id_stream, _ = _column_value_bytes(tbl, "doc_ids")
    tf_stream, _ = _column_value_bytes(tbl, "tfs")
    dl_stream, _ = _column_value_bytes(tbl, "dls")
    deltas = varint_decode(id_stream)
    total = int(counts.sum())
    row_starts_v = np.cumsum(counts) - counts
    glob = np.cumsum(deltas, dtype=np.uint64)
    seg_base = glob[row_starts_v] - deltas[row_starts_v]
    base = expand_segment_values(seg_base, row_starts_v, total)
    all_ids = from_u64(glob - base)
    all_tfs = varint_decode(tf_stream).astype(np.int64)
    all_dls = varint_decode(dl_stream).astype(np.int64)

    p_group = expand_segment_values(row_group, row_starts_v, total)
    p_nsalt = expand_segment_values(nsalt_row, row_starts_v, total)
    p_salt = expand_segment_values(salt_row, row_starts_v, total)

    # keep only each group's own salt range (straddling blocks carry a
    # few foreign postings) — vectorized salt_np with per-posting nsalt
    b32 = to_u64(all_ids) >> np.uint64(32)
    post_salt = (
        (b32 * p_nsalt.astype(np.uint64)) >> np.uint64(32)
    ).astype(np.int64)
    keep_idx = np.flatnonzero(post_salt == p_salt)
    if keep_idx.size == 0:
        return None

    # sort postings by doc_id within each group (groups stay in order)
    order = keep_idx[
        np.lexsort((all_ids[keep_idx], p_group[keep_idx]))
    ]
    ids_s = all_ids[order]
    tfs_s = all_tfs[order]
    dls_s = all_dls[order]
    grp_s = p_group[order]
    nk = order.size

    # per-group idf with math.log — bit-identical to the per-group spec
    g_df = df_row[g_first_row]
    idf_g = np.fromiter(
        (
            math.log(1.0 + (n_docs_f - d + 0.5) / (d + 0.5))
            for d in g_df
        ),
        dtype=np.float64,
        count=g_df.size,
    )
    scores = idf_g[grp_s] * tfs_s / (
        tfs_s + k1 * (1.0 - b + b * dls_s / avg_dl_f)
    )

    # re-block: rank within group, absolute delta at every block start
    gchange = np.empty(nk, dtype=bool)
    gchange[0] = True
    gchange[1:] = grp_s[1:] != grp_s[:-1]
    gstarts = np.flatnonzero(gchange).astype(np.int64)
    rank = np.arange(nk, dtype=np.int64) - expand_segment_values(
        gstarts, gstarts, nk
    )
    block_starts = np.flatnonzero(rank % block_size == 0).astype(np.int64)
    block_ends = np.append(block_starts[1:], nk)
    nblocks = block_starts.size
    bnd = np.append(block_starts, nk)

    u = to_u64(ids_s)
    d_out = np.empty_like(u)
    d_out[0] = u[0]
    d_out[1:] = u[1:] - u[:-1]
    d_out[block_starts] = u[block_starts]

    def _binary(buf: bytes, lens: np.ndarray) -> pa.Array:
        off = np.zeros(nk + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        bo = off[bnd]
        assert bo[-1] <= np.iinfo(np.int32).max, "batch binary > 2 GiB"
        return pa.Array.from_buffers(
            pa.binary(), nblocks,
            [None, pa.py_buffer(bo.astype(np.int32).tobytes()),
             pa.py_buffer(buf)],
        )

    id_arr = _binary(*varint_encode_lengths(d_out))
    tf_arr = _binary(*varint_encode_lengths(tfs_s.astype(np.uint64)))
    dl_arr = _binary(*varint_encode_lengths(dls_s.astype(np.uint64)))

    pos_col = tbl.column("positions").combine_chunks()
    if pos_col.null_count == 0:
        # per-posting chunk byte ranges in the contiguous positions
        # stream: value k of the stream ends at E[k]; posting j covers
        # values [cumtf[j]-tf[j], cumtf[j])
        pos_stream, _ = _column_value_bytes(tbl, "positions")
        P = np.frombuffer(pos_stream, dtype=np.uint8)
        E = np.flatnonzero((P & 0x80) == 0).astype(np.int64)
        cumtf = np.cumsum(all_tfs)
        chunk_end = E[cumtf - 1] + 1
        chunk_start = np.empty(total, dtype=np.int64)
        chunk_start[0] = 0
        chunk_start[1:] = chunk_end[:-1]
        cs = chunk_start[order]
        ce = chunk_end[order]
        lens = ce - cs
        out_off = np.zeros(nk + 1, dtype=np.int64)
        np.cumsum(lens, out=out_off[1:])
        tot = int(out_off[-1])
        shift = cs - out_off[:-1]
        gather = np.arange(tot, dtype=np.int64) + expand_segment_values(
            shift, out_off[:-1], tot
        )
        out_p = P[gather]
        po = out_off[bnd]
        assert po[-1] <= np.iinfo(np.int32).max, "batch positions > 2 GiB"
        pos_arr = pa.Array.from_buffers(
            pa.binary(), nblocks,
            [None, pa.py_buffer(po.astype(np.int32).tobytes()),
             pa.py_buffer(out_p.tobytes())],
        )
    else:
        # ANY null row degrades the whole batch's groups to
        # non-positional — same contract as the per-group spec (a mixed
        # group degrades rather than crashing or dropping docs)
        pos_arr = pa.nulls(nblocks, pa.binary())

    out_group = grp_s[block_starts]
    take_rows = pa.array(g_first_row[out_group], pa.int64())
    return pa.RecordBatch.from_arrays(
        [
            term_arr.take(take_rows),
            pa.array(salt_row[g_first_row[out_group]].astype(np.int32)),
            pa.array((rank[block_starts] // block_size).astype(np.int32)),
            pa.array((block_ends - block_starts).astype(np.int32)),
            pa.array(ids_s[block_starts]),
            pa.array(ids_s[block_ends - 1]),
            pa.array(np.maximum.reduceat(scores, block_starts)),
            pa.array(
                np.maximum.reduceat(tfs_s, block_starts).astype(np.int32)
            ),
            pa.array(
                np.minimum.reduceat(dls_s, block_starts).astype(np.int32)
            ),
            id_arr,
            tf_arr,
            dl_arr,
            pos_arr,
        ],
        names=[f.name for f in POSTINGS_SCHEMA.fields],
    )


def build_dictionary(postings: DataFrame, n_buckets: int) -> DataFrame:
    """final blocks → DICTIONARY_SCHEMA rows in ONE scan of the final
    postings (r7, guide §2.3/§2.4: aggregate before the shuffle, and drop
    the second full shards-postings scan + join the old path paid).

    cf per term is recovered by decoding each block's tf varints (a
    vectorized Arrow-batched pass over the ``tfs`` payload column only):
    the merge routed every posting to exactly one (term, salt) group
    (straddlers are filtered to their own salt range), so Σ decoded tf
    over the FINAL blocks equals the Σ tf_sum over shard blocks the old
    join supplied — integer-exact, value-identical dictionary rows
    (pinned in tests/test_build_e2e.py)."""
    import pandas as pd

    @F.pandas_udf("long")
    def _tf_sum(tfs: pd.Series) -> pd.Series:
        return pd.Series(
            [int(varint_decode(b).sum()) for b in tfs], dtype="int64"
        )

    d = postings.groupBy("term").agg(
        F.sum("n_docs").alias("df"),
        F.sum(_tf_sum("tfs")).alias("cf"),
        F.count("*").cast("int").alias("n_blocks"),
        F.max("block_max_score").alias("max_score"),
    )
    return (
        d.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        .select("term", "df", "cf", "max_score", "n_blocks", "bucket")
    )
