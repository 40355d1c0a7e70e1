"""Stage A block encoding: per-shard postings → compressed block rows.

Runs inside one shard's build job (index/builder.py): the shard's
(term, doc_id, tf, dl, positions) postings are grouped by term and encoded
into 128-doc blocks (delta+varint; index/codec.py) via ``applyInPandas``
— the Arrow-grouped-map path, no per-row Python.

Shard blocks carry tf/dl but NO scores: idf needs global df, which only
exists after all shards are built — stage B (index/merge.py) attaches
scores and block-max metadata during the merge.

Scale note: within one shard, a head term's group is bounded by the shard's
doc count (corpus_partitions >> 1 at 10^12 docs keeps groups in memory);
the global head-term problem is handled by the salted merge, not here.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesserae_ng_spark.index.codec import (
    delta_encode_ids,
    expand_segment_values,
    to_u64,
    varint_encode,
    varint_encode_lengths,
)
from tesserae_ng_spark.schemas import BLOCK_SIZE

SHARD_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("tf_sum", T.LongType(), False),
        T.StructField("block_first_doc", T.LongType(), False),
        T.StructField("block_last_doc", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), True),
    ]
)


def encode_term_group(pdf: pd.DataFrame, block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """One term's shard postings → block rows. Pure function (testable).

    ``positions`` arrives as per-posting varint byte slices (already in the
    final stream layout — build.py sliced them JVM-side), so a block's
    positions column is a plain byte join: no numeric re-encode.
    """
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    term = pdf["term"].iloc[0]
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    pos_col = pdf["positions"]
    has_pos = pos_col.iloc[0] is not None if len(pdf) else False
    pos_chunks = pos_col.tolist() if has_pos else None
    rows = []
    for b, start in enumerate(range(0, len(pdf), block_size)):
        sl = slice(start, min(start + block_size, len(pdf)))
        ids, tf_b, dl_b = doc_ids[sl], tfs[sl], dls[sl]
        rows.append(
            {
                "term": term,
                "block_id": b,
                "n_docs": len(ids),
                "tf_sum": int(tf_b.sum()),
                "block_first_doc": int(ids[0]),
                "block_last_doc": int(ids[-1]),
                "doc_ids": delta_encode_ids(ids),
                "tfs": varint_encode(tf_b.astype(np.uint64)),
                "dls": varint_encode(dl_b.astype(np.uint64)),
                "positions": (
                    b"".join(bytes(c) for c in pos_chunks[sl.start : sl.stop])
                    if has_pos
                    else None
                ),
            }
        )
    return pd.DataFrame(rows)


def encode_blocks_batch(pdf: pd.DataFrame, block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """Encode a frame of MANY complete term groups — rows pre-sorted by
    (term, doc_id) — into block rows, byte-identical to running
    ``encode_term_group`` per group (pinned by tests/test_codec.py).

    Everything is batch-wide numpy: ONE varint encode per column for the
    whole frame (per-value byte lengths → per-block byte offsets; varint
    streams are self-delimiting so slicing whole values is lossless), one
    reduceat for tf sums, one byte join + offset slicing for positions.
    Python-per-group cost is zero — this stage used to spend ~70 % of the
    build's encode wall on per-group pandas slicing + per-block small-array
    varint calls (round-5 profile: 36 s → ~6 s of a 46 s stage at 17M
    postings, local[8])."""
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(columns=[f.name for f in SHARD_BLOCK_SCHEMA])
    terms = pdf["term"].to_numpy()
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)

    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = terms[1:] != terms[:-1]
    group_starts = np.flatnonzero(change).astype(np.int64)
    # per-row index of its group's first row, then rank within group
    row_gs = expand_segment_values(group_starts, group_starts, n)
    rank = np.arange(n, dtype=np.int64) - row_gs
    block_starts = np.flatnonzero(rank % block_size == 0).astype(np.int64)
    block_ends = np.append(block_starts[1:], n)

    u = to_u64(ids)
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]
    deltas[block_starts] = u[block_starts]  # absolute at every block start
    id_buf, id_len = varint_encode_lengths(deltas)
    tf_buf, tf_len = varint_encode_lengths(tfs.astype(np.uint64))
    dl_buf, dl_len = varint_encode_lengths(dls.astype(np.uint64))

    def _slices(buf: bytes, lens: np.ndarray) -> list[bytes]:
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        return [
            buf[off[s]:off[e]] for s, e in zip(block_starts, block_ends)
        ]

    pos_col = pdf["positions"]
    has_pos = pos_col.iloc[0] is not None
    if has_pos:
        pos_list = pos_col.tolist()
        plens = np.fromiter(
            (len(x) for x in pos_list), dtype=np.int64, count=n
        )
        pbuf = b"".join(pos_list)
        poff = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(plens, out=poff[1:])
        pos_out = [
            pbuf[poff[s]:poff[e]] for s, e in zip(block_starts, block_ends)
        ]
    else:
        pos_out = None

    return pd.DataFrame(
        {
            "term": terms[block_starts],
            "block_id": (rank[block_starts] // block_size).astype(np.int32),
            "n_docs": (block_ends - block_starts).astype(np.int32),
            "tf_sum": np.add.reduceat(tfs, block_starts),
            "block_first_doc": ids[block_starts],
            "block_last_doc": ids[block_ends - 1],
            "doc_ids": _slices(id_buf, id_len),
            "tfs": _slices(tf_buf, tf_len),
            "dls": _slices(dl_buf, dl_len),
            "positions": pos_out,
        }
    )


def encode_batch_arrow(tbl, block_size: int = BLOCK_SIZE):
    """Arrow-native encode of a table of COMPLETE term groups, rows sorted
    by (term, doc_id) → one output RecordBatch of block rows (or None).

    Semantics identical to encode_blocks_batch / per-group
    encode_term_group (pinned in tests/test_codec.py) but with ZERO
    per-row Python objects: group boundaries come from a C-side
    dictionary-encode, numeric columns cross as numpy views, the
    positions column is sliced by offset math against its Arrow data
    buffer (per-row position streams are contiguous in row order, so a
    block's positions are one buffer slice — the output array SHARES the
    input data buffer), and the three varint columns are each ONE
    whole-batch encode whose per-value byte lengths yield per-block
    offsets for a zero-copy from_buffers binary array. Materializing 17M
    per-row bytes objects through pandas was ~2/3 of the stage wall."""
    import pyarrow as pa

    tbl = tbl.combine_chunks()
    n = tbl.num_rows
    if n == 0:
        return None
    term = tbl.column("term").combine_chunks()
    codes = term.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False
    )
    tfs = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    dls = tbl.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)

    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = codes[1:] != codes[:-1]
    group_starts = np.flatnonzero(change).astype(np.int64)
    row_gs = expand_segment_values(group_starts, group_starts, n)
    rank = np.arange(n, dtype=np.int64) - row_gs
    block_starts = np.flatnonzero(rank % block_size == 0).astype(np.int64)
    block_ends = np.append(block_starts[1:], n)
    nblocks = block_starts.size
    bnd = np.append(block_starts, n)  # n+1-ish boundary index vector

    u = to_u64(ids)
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]
    deltas[block_starts] = u[block_starts]

    def _binary(buf: bytes, lens: np.ndarray) -> pa.Array:
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        bo = off[bnd]
        assert bo[-1] <= np.iinfo(np.int32).max, "batch binary > 2 GiB"
        return pa.Array.from_buffers(
            pa.binary(),
            nblocks,
            [None, pa.py_buffer(bo.astype(np.int32).tobytes()),
             pa.py_buffer(buf)],
        )

    id_arr = _binary(*varint_encode_lengths(deltas))
    tf_arr = _binary(*varint_encode_lengths(tfs.astype(np.uint64)))
    dl_arr = _binary(*varint_encode_lengths(dls.astype(np.uint64)))

    pos = tbl.column("positions").combine_chunks()
    if pos.null_count >= n:
        pos_arr = pa.nulls(nblocks, pa.binary())
    else:
        if pos.null_count:
            # mixed positional/non-positional rows (not a real build shape)
            pos = pos.fill_null(b"").combine_chunks()
        pbufs = pos.buffers()
        # value offsets honor the array's own slice offset
        roff = np.frombuffer(
            pbufs[1], dtype=np.int32, count=n + 1 + pos.offset
        )[pos.offset:]
        pos_arr = pa.Array.from_buffers(
            pa.binary(),
            nblocks,
            [None, pa.py_buffer(roff[bnd].astype(np.int32).tobytes()),
             pbufs[2]],
        )

    return pa.RecordBatch.from_arrays(
        [
            term.take(pa.array(block_starts, pa.int64())),
            pa.array((rank[block_starts] // block_size).astype(np.int32)),
            pa.array((block_ends - block_starts).astype(np.int32)),
            pa.array(np.add.reduceat(tfs, block_starts).astype(np.int64)),
            pa.array(ids[block_starts]),
            pa.array(ids[block_ends - 1]),
            id_arr,
            tf_arr,
            dl_arr,
            pos_arr,
        ],
        names=[f.name for f in SHARD_BLOCK_SCHEMA],
    )


SHARDED_BLOCK_SCHEMA = T.StructType(
    [T.StructField("shard", T.IntegerType(), False), *SHARD_BLOCK_SCHEMA.fields]
)


def encode_sharded_batch(tbl, block_size: int = BLOCK_SIZE):
    """Arrow batch of complete (shard, term) groups → block rows + shard.

    Thin fan-out over ``encode_batch_arrow``: slice the batch at shard
    boundaries (a handful per batch — shards ≪ terms) and encode each
    slice with the single-shard batch encoder, so the per-block bytes are
    the same code path (and therefore byte-identical) as ``build_index``.
    """
    import pyarrow as pa

    n = tbl.num_rows
    if n == 0:
        return None
    shard = tbl.column("shard").combine_chunks().to_numpy(zero_copy_only=False)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = shard[1:] != shard[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    outs = []
    for s, e in zip(starts, ends):
        rb = encode_batch_arrow(tbl.slice(s, e - s), block_size)
        if rb is None or rb.num_rows == 0:
            continue
        outs.append(
            pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.full(rb.num_rows, shard[s], dtype=np.int32),
                        pa.int32(),
                    ),
                    *rb.columns,
                ],
                names=["shard", *rb.schema.names],
            )
        )
    if not outs:
        return None
    if len(outs) == 1:
        return outs[0]
    t = pa.Table.from_batches(outs).combine_chunks()
    return t.to_batches()[0]


def encode_shard_blocks(term_doc_dl: DataFrame, block_size: int = BLOCK_SIZE) -> DataFrame:
    """(term, doc_id, tf, dl, positions) → shard block rows.

    One exchange keyed by term and partition-sorted by (term, doc_id) —
    the JVM sort replaces per-group pandas sorts — then mapInArrow with
    batch-wide columnar encoding (encode_batch_arrow) over complete
    groups per Arrow batch: Arrow AND Python costs are per batch, not per
    term group, per block, or per row. A group straddling two Arrow
    batches is carried over (partition-sorted data keeps groups
    contiguous and within one partition), same contract as
    index/grouped.py.

    Kept as the exchange-based reference shape; the build now uses
    ``encode_blocks_local`` (below), which produces fragmented-but-
    equivalent block rows with NO exchange at all."""
    from tesserae_ng_spark.index.grouped import grouped_arrow_sorted

    return grouped_arrow_sorted(
        term_doc_dl,
        ["term"],
        lambda t: encode_batch_arrow(t, block_size),
        SHARD_BLOCK_SCHEMA,
        sort_extra=("doc_id",),
    )


def encode_blocks_local(
    term_doc_dl: DataFrame,
    block_size: int = BLOCK_SIZE,
    shard_aware: bool = False,
    max_buffer_rows: int | None = None,
) -> DataFrame:
    """Partition-LOCAL block encode: ZERO exchange.

    Why stage A needs no term shuffle: stage B (index/merge.py) fully
    decodes, lexsorts, and re-encodes every (term, salt) group anyway —
    block-grouping by term across partitions buys the final index
    nothing. Stage A's only real job is COMPRESSING the rows the merge's
    exchange will move. So: accumulate each input partition in the Arrow
    worker, numpy-lexsort by (term, doc_id) (5-10x cheaper than the JVM
    row sort, and the sort is the one build body that does NOT scale
    with cores — tools/encode_probe.py: sort 0.70 eff vs encode 1.22 at
    2→8 procs), then batch-encode per-partition term fragments. The
    merge's (term, salt) exchange then moves delta+varint blocks instead
    of raw posting rows (~3-5x fewer bytes), and the build has exactly
    ONE wide exchange end to end.

    Fragmentation is bounded and harmless: one block row per
    (partition, term) per ``block_size`` docs; because fragments are
    doc_id-sorted runs, their doc ranges stay tight, so the merge's
    salt-straddle routing stays ~1 salt per fragment even for head
    terms. Final index bytes are IDENTICAL to the exchange-based path
    (the merge's output is invariant to input block fragmentation —
    pinned in tests/test_merge_arrow.py and tests/test_build_e2e.py).

    ``max_buffer_rows`` bounds the per-worker accumulation (first-touch
    arena cost on lazily-backed VMs — same lesson as
    grouped_arrow_sorted(max_rows)); a larger partition is encoded in
    several sorted chunks, which only adds fragments. Default 2M rows,
    overridable via TNG_ENCODE_BUFFER_ROWS (read driver-side at plan
    build): the buffer's lexsort working set (~24 B/row keys + index)
    is the build's one non-streaming body, so the right size scales
    with the per-core LLC share, not a constant — co-located workers
    whose combined sort sets exceed the shared LLC go DRAM-random
    (tools/encode_probe.py sort control). Fragmentation stays bounded
    either way; final index bytes are invariant to the choice.

    ``shard_aware=True`` (fused sharded build): rows carry a ``shard``
    column; the local sort keys on (shard, term, doc_id) and the output
    prepends the shard column.
    """
    if max_buffer_rows is None:
        max_buffer_rows = int(
            os.environ.get("TNG_ENCODE_BUFFER_ROWS", "2000000")
        )
    sort_fn = _sorted_shard_table if shard_aware else _sorted_term_table
    enc = encode_sharded_batch if shard_aware else encode_batch_arrow
    schema = SHARDED_BLOCK_SCHEMA if shard_aware else SHARD_BLOCK_SCHEMA

    def runner(batches):
        import os as _os
        import time as _time

        import pyarrow as pa

        # TNG_GROUPED_PROFILE=1: same split as grouped_arrow_sorted —
        # encode body vs arrival gaps (arrival here includes the whole
        # pipelined upstream: scan, analysis UDF, JVM feed)
        prof = _os.environ.get("TNG_GROUPED_PROFILE") == "1"
        t_open = _time.time()
        body_s = 0.0
        rows_in = 0

        buf, rows = [], 0

        def flush():
            nonlocal buf, rows, body_s
            if not rows:
                return
            t0 = _time.time()
            t = (
                pa.concat_tables(
                    [pa.Table.from_batches([b]) for b in buf]
                ).combine_chunks()
                if len(buf) > 1
                else pa.Table.from_batches([buf[0]])
            )
            buf, rows = [], 0
            rb = enc(sort_fn(t), block_size)
            body_s += _time.time() - t0
            if rb is not None and rb.num_rows:
                yield rb

        for rb in batches:
            buf.append(rb)
            rows += rb.num_rows
            rows_in += rb.num_rows
            if rows >= max_buffer_rows:
                yield from flush()
        yield from flush()
        if prof:
            import json as _json

            import tempfile as _tf

            fd, _ = _tf.mkstemp(
                prefix=f"tng_encode_prof_{_os.getpid()}_", suffix=".json",
                dir=_os.environ.get("TNG_PROFILE_DIR") or None,
            )  # mkstemp = O_EXCL private file (ADVICE r6)
            with _os.fdopen(fd, "w") as f:
                f.write(_json.dumps({
                    "pid": _os.getpid(),
                    "wall_s": round(_time.time() - t_open, 3),
                    "body_s": round(body_s, 3), "rows_in": rows_in,
                }))

    return term_doc_dl.mapInArrow(runner, schema)


def _sorted_term_table(t):
    """Stable in-worker sort by (term, doc_id) via numpy lexsort over
    C-side dictionary codes (term group ORDER is first-appearance — the
    merge re-groups by hash, so only contiguity matters)."""
    t = t.combine_chunks()
    codes = (
        t.column("term").combine_chunks().dictionary_encode().indices
        .to_numpy(zero_copy_only=False)
    )
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    return t.take(np.lexsort((ids, codes)))


def _sorted_shard_table(t):
    t = t.combine_chunks()
    codes = (
        t.column("term").combine_chunks().dictionary_encode().indices
        .to_numpy(zero_copy_only=False)
    )
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    shards = t.column("shard").to_numpy(zero_copy_only=False)
    return t.take(np.lexsort((ids, codes, shards)))
