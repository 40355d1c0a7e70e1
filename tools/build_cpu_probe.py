"""Spark-free 2-vs-8-process control for the BUILD parts phase.

The scaling protocol's build row runs the per-doc analysis chain
(html_extract → tokenize → Porter → doc vector, functions/analysis.py)
inside pandas UDF workers. This probe runs the EXACT same task bodies —
`doc_vector_html` over the same synthesized documents — in plain
`multiprocessing` processes with no Spark layer at all, at 2 and 8
processes, and reports aggregate docs/sec at each level plus the 2→8
efficiency ( (thr_8/thr_2)/4 ).

Reading it: if this control lands on the same ceiling as the engine's
build row, the residual build-scaling gap is the single-box
memory-system artifact already documented for the query rows
(BENCH/BASELINE.md "controls" section) — per-process work here is
identical and share-nothing, so anything below 1.0 is the memory
hierarchy, not the engine or Spark. Real N→4N executors hold
per-executor cache/DRAM constant.

Usage: python tools/build_cpu_probe.py [sf_dir] [docs_per_proc]
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


def _worker(args):
    """One process's task body: html synthesis OUTSIDE the timed window
    (the bench corpus pre-materializes html), then the timed analysis
    chain — exactly what a pandas-UDF worker executes per batch."""
    docs, = args
    from tesserae_ng_spark.functions.analysis import doc_vector
    from tesserae_ng_spark.functions.html import extract_text, make_html

    htmls = [make_html(int(d), s, tx or "") for d, s, tx, _ in docs]
    langs = [lg for _, _, _, lg in docs]
    # warm-up slice outside the timed window (imports, memo, allocator)
    for h, lg in zip(htmls[:50], langs[:50]):
        doc_vector(extract_text(h), lg)
    t0 = time.time()
    memo: dict = {}
    for h, lg in zip(htmls, langs):
        doc_vector(extract_text(h), lg, _memo=memo)
    return len(docs), time.time() - t0


def _run_level(nproc: int, docs_per_proc: int, sf_dir: str) -> float:
    docs = _load_docs(sf_dir, docs_per_proc)
    ctx = mp.get_context("spawn")
    with ctx.Pool(nproc) as pool:
        res = pool.map(_worker, [(docs,)] * nproc)
    total_docs = sum(n for n, _ in res)
    max_wall = max(w for _, w in res)
    return round(total_docs / max_wall, 2)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    docs_per_proc = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    thr2 = _run_level(2, docs_per_proc, sf_dir)
    thr8 = _run_level(8, docs_per_proc, sf_dir)
    print(
        json.dumps(
            {
                "docs_per_proc": docs_per_proc,
                "agg_docs_per_sec_2proc": thr2,
                "agg_docs_per_sec_8proc": thr8,
                "eff_2_to_8": round((thr8 / thr2) / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
