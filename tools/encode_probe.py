"""Spark-free 2-vs-8-process control for the BUILD encode (reduce) phase.

The scaling profile (tools/profile_build.py) shows the encode stage —
shuffle fetch → JVM partition sort by (term, doc_id) → mapInArrow
varint block encode → parquet write — scaling ~2.5x from local[2] to
local[8] while the analysis phase scales ~3.3x. This probe isolates the
PYTHON body (encode_batch_arrow over 64k-row Arrow slices, the runner's
batch shape) and, separately, a numpy stand-in for the partition sort
(lexsort of (term_code, doc_id)) and the merge body, each at 2 and 8
share-nothing processes over identical synthetic Zipf postings.

Measurement discipline (round 6): the original probe ran ONE timed
window per worker with no start synchronization, launched right after
the allocation-heavy setup (2M-row table build) of its pool siblings —
on this host, whose fault weather degrades box-wide for seconds after
8-wide fresh-page storms (BENCH/BASELINE.md fault traces), that graded
the setup's weather, not the body: byte-identical bodies swung 0.19-0.96
between runs. Now every worker (a) applies the engine's own allocator
tuning (memtune.tune_allocator — the deployed Spark python workers run
tuned, so an untuned probe measures a posture the engine never ships),
and (b) rendezvous at a barrier before EACH of R timed repetitions, so
per-rep max-over-workers is a truly concurrent window; the graded value
is the MEDIAN over reps (rep 1 absorbs residual warm-up).

Reading it: per-process work is identical, so any efficiency below 1.0
is the box's memory hierarchy (LLC share / DRAM), not the engine. If
the Python encode body scales well but the in-Spark stage does not, the
JVM side (shuffle fetch + row sort) is the non-scaling part.

Usage: python tools/encode_probe.py [rows_per_proc] [reps]  → one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _make_postings(n: int, seed: int = 7):
    """Sorted (term, doc_id, tf, dl, positions) Arrow table, Zipf terms
    over a 12k vocab — the bench index's dictionary shape."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    vocab = 12_000
    codes = (rng.zipf(1.3, size=n) - 1) % vocab
    doc_ids = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    order = np.lexsort((doc_ids, codes))
    codes, doc_ids = codes[order], doc_ids[order]
    tfs = rng.integers(1, 6, size=n, dtype=np.int64)
    dls = rng.integers(40, 400, size=n, dtype=np.int64)
    terms = pa.array([f"t{c:05d}" for c in codes], pa.string())
    # positions stream = exactly tf single-byte varints per posting
    positions = pa.array([b"\x05" * int(t) for t in tfs], pa.binary())
    return pa.table(
        {
            "term": terms,
            "doc_id": pa.array(doc_ids),
            "tf": pa.array(tfs),
            "dl": pa.array(dls),
            "positions": positions,
        }
    ), codes, doc_ids


def _worker(barrier, reps: int, n: int, seed: int, q) -> None:
    import numpy as np
    import pyarrow as pa

    from tesserae_ng_spark.index.encode import encode_batch_arrow
    from tesserae_ng_spark.index.merge import merge_batch_arrow
    from tesserae_ng_spark.memtune import tune_allocator

    tune_allocator(force=True)  # the posture every deployed worker runs
    tbl, codes, doc_ids = _make_postings(n, seed)
    # warm-up outside the timed windows
    encode_batch_arrow(tbl.slice(0, 65536))
    step = 65536

    def encode_pass():
        out_rows = 0
        blocks = []
        for s in range(0, n, step):
            rb = encode_batch_arrow(tbl.slice(s, min(step, n - s)))
            if rb is not None:
                out_rows += rb.num_rows
                blocks.append(rb)
        return out_rows, blocks

    t_enc = []
    for _ in range(reps):
        barrier.wait()
        t0 = time.time()
        out_rows, blocks = encode_pass()
        t_enc.append(time.time() - t0)

    # sort stand-in: unsorted copy -> full-partition lexsort + gather
    rev_codes = codes[::-1].copy()
    rev_ids = doc_ids[::-1].copy()
    t_sort = []
    for _ in range(reps):
        barrier.wait()
        t0 = time.time()
        order = np.lexsort((rev_ids, rev_codes))
        _ = rev_codes[order], rev_ids[order]
        t_sort.append(time.time() - t0)

    # merge body: decode + lexsort + score + re-encode the block rows
    # (stage B's per-batch work), chunked like the real merge
    bt = pa.Table.from_batches(blocks).combine_chunks()
    bt = bt.append_column("salt", pa.array(np.zeros(bt.num_rows, np.int32)))
    bt = bt.append_column("nsalt", pa.array(np.ones(bt.num_rows, np.int32)))
    bt = bt.append_column(
        "df", pa.array(np.full(bt.num_rows, 1000, np.int64))
    )
    bt = bt.append_column(
        "cf", pa.array(np.full(bt.num_rows, 2000, np.int64))
    )
    merge_batch_arrow(bt.slice(0, 256), 5e5, 120.0)  # warm-up
    t_merge = []
    for _ in range(reps):
        barrier.wait()
        t0 = time.time()
        for s in range(0, bt.num_rows, 1536):
            merge_batch_arrow(
                bt.slice(s, min(1536, bt.num_rows - s)), 5e5, 120.0
            )
        t_merge.append(time.time() - t0)
    q.put((t_enc, t_sort, t_merge, out_rows))


def _median(xs):
    xs = sorted(xs)
    m = len(xs)
    return xs[m // 2] if m % 2 else (xs[m // 2 - 1] + xs[m // 2]) / 2.0


def _run_level(nproc: int, rows: int, reps: int):
    """Per rep: aggregate rate = total rows / max-over-workers elapsed
    (the rep is barrier-synced, so max is the honest all-concurrent
    window). Graded value per body = median over reps."""
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(nproc)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(barrier, reps, rows, 7 + i, q))
        for i in range(nproc)
    ]
    for p in procs:
        p.start()
    res = [q.get() for _ in procs]
    for p in procs:
        p.join()
    total = rows * nproc
    rates = []
    for body in range(3):  # encode, sort, merge
        per_rep = [
            total / max(r[body][rep] for r in res) for rep in range(reps)
        ]
        rates.append(round(_median(per_rep) / 1e6, 3))
    return rates


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    e2, s2, m2 = _run_level(2, rows, reps)
    e8, s8, m8 = _run_level(8, rows, reps)
    print(
        json.dumps(
            {
                "rows_per_proc": rows,
                "reps": reps,
                "encode_Mrows_s_2proc": e2,
                "encode_Mrows_s_8proc": e8,
                "encode_eff_2_to_8": round((e8 / e2) / 4.0, 3),
                "sort_Mrows_s_2proc": s2,
                "sort_Mrows_s_8proc": s8,
                "sort_eff_2_to_8": round((s8 / s2) / 4.0, 3),
                "merge_Mrows_s_2proc": m2,
                "merge_Mrows_s_8proc": m8,
                "merge_eff_2_to_8": round((m8 / m2) / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
