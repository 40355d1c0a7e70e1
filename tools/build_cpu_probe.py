"""Spark-free 2-vs-8-process control for the BUILD parts phase.

The scaling protocol's build row runs the per-doc analysis chain
(html_extract → tokenize → Porter → doc vector, functions/analysis.py)
inside pandas UDF workers. This probe runs the EXACT same task bodies —
`doc_vector_html` over the same synthesized documents — in plain
`multiprocessing` processes with no Spark layer at all, at 2 and 8
processes, and reports aggregate docs/sec at each level plus the 2→8
efficiency ( (thr_8/thr_2)/4 ).

Measurement discipline (round 6, same rework as tools/encode_probe.py):
workers apply the engine's allocator tuning (deployed python workers
run tuned), rendezvous at a barrier before EACH of R timed repetitions
(so per-rep max-over-workers is a truly concurrent window instead of
one unsynced window right after the setup's 8-wide allocation storm),
and the graded value is the median over reps.

Reading it: if this control lands on the same ceiling as the engine's
build row, the residual build-scaling gap is the single-box
memory-system artifact already documented for the query rows
(BENCH/BASELINE.md "controls" section) — per-process work here is
identical and share-nothing, so anything below 1.0 is the memory
hierarchy, not the engine or Spark. Real N→4N executors hold
per-executor cache/DRAM constant.

Usage: python tools/build_cpu_probe.py [sf_dir] [docs_per_proc] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_docs(sf_dir: str, n: int) -> list[tuple[int, str, str, str]]:
    """(doc_id, source, text, lang) rows, replicated to length n the same
    way synthesize_corpus does (identical text under distinct urls)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text", "lang"],
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("source").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    out = []
    rep = 0
    while len(out) < n:
        out.extend(
            (d, f"{s}-r{rep}", tx, lg) for d, s, tx, lg in rows
        )
        rep += 1
    return out[:n]


def _worker(barrier, reps: int, docs, q) -> None:
    """One process's task body: html synthesis OUTSIDE the timed window
    (the bench corpus pre-materializes html), then the timed analysis
    chain — exactly what a pandas-UDF worker executes per batch."""
    from tesserae_ng_spark.functions.analysis import doc_vector
    from tesserae_ng_spark.functions.html import extract_text, make_html
    from tesserae_ng_spark.memtune import tune_allocator

    tune_allocator(force=True)  # the posture every deployed worker runs
    htmls = [make_html(int(d), s, tx or "") for d, s, tx, _ in docs]
    langs = [lg for _, _, _, lg in docs]
    # warm-up slice outside the timed window (imports, memo, allocator)
    for h, lg in zip(htmls[:50], langs[:50]):
        doc_vector(extract_text(h), lg)
    walls = []
    for _ in range(reps):
        barrier.wait()
        t0 = time.time()
        memo: dict = {}
        for h, lg in zip(htmls, langs):
            doc_vector(extract_text(h), lg, _memo=memo)
        walls.append(time.time() - t0)
    q.put(walls)


def _median(xs):
    xs = sorted(xs)
    m = len(xs)
    return xs[m // 2] if m % 2 else (xs[m // 2 - 1] + xs[m // 2]) / 2.0


def _run_level(nproc: int, docs_per_proc: int, sf_dir: str, reps: int) -> float:
    docs = _load_docs(sf_dir, docs_per_proc)
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(nproc)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(barrier, reps, docs, q))
        for _ in range(nproc)
    ]
    for p in procs:
        p.start()
    res = [q.get() for _ in procs]
    for p in procs:
        p.join()
    total_docs = docs_per_proc * nproc
    per_rep = [total_docs / max(w[rep] for w in res) for rep in range(reps)]
    return round(_median(per_rep), 2)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    docs_per_proc = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    thr2 = _run_level(2, docs_per_proc, sf_dir, reps)
    thr8 = _run_level(8, docs_per_proc, sf_dir, reps)
    print(
        json.dumps(
            {
                "docs_per_proc": docs_per_proc,
                "reps": reps,
                "agg_docs_per_sec_2proc": thr2,
                "agg_docs_per_sec_8proc": thr8,
                "eff_2_to_8": round((thr8 / thr2) / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
