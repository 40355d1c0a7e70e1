"""Profile the positional (phrase/proximity) query legs single-thread.

Builds (once, memoized in /tmp) the bench-shaped sf0.01 enriched corpus
index, then runs the positional subset of the 2000-query fixture batch
through Searcher.search in-process under cProfile. This is the
single-thread body of VERDICT r4 #7 ("4.8 s / 291 mixed positional
queries, searchsorted-bound") — the numbers here decide what to batch.

Usage: python tools/profile_positional.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "8"))


def ensure_index(sf_dir: str, idx_dir: str) -> None:
    if os.path.exists(os.path.join(idx_dir, "stats.json")):
        return
    from tesserae_ng_spark.index.builder import build_index
    from tesserae_ng_spark.session import get_spark
    from tesserae_ng_spark.sources.corpus import synthesize_corpus

    spark = get_spark("prof", master="local[8]", shuffle_partitions=8)
    corpus = synthesize_corpus(
        spark, sf_dir, replicas=REPLICAS, enrich_vocab=True
    )
    build_index(
        spark, corpus, idx_dir, n_parts=2,
        target_postings_per_salt=1 << 14, n_buckets=16,
    )
    spark.stop()


def positional_queries(sf_dir: str, n: int) -> list[dict]:
    import duckdb

    from tesserae_ng_spark.fixtures import make_queries
    from tesserae_ng_spark.sources.corpus import enrichment_vocab

    vocab_rows = duckdb.sql(
        f"""SELECT term, count(DISTINCT doc_id) AS df FROM (
              SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
              FROM '{sf_dir}/documents.parquet') WHERE term <> ''
            GROUP BY term ORDER BY df DESC, term"""
    ).fetchall()
    ids_n = duckdb.sql(
        f"""SELECT min(doc_id), max(doc_id), count(*)
            FROM '{sf_dir}/documents.parquet'"""
    ).fetchone()
    vocab = [(t, d * REPLICAS) for t, d in vocab_rows] + [
        (t, d * REPLICAS)
        for t, d in enrichment_vocab([ids_n[0], ids_n[1]], ids_n[2])
    ]
    vocab.sort(key=lambda p: (-p[1], p[0]))
    qs = make_queries(vocab, n=2000, seed=777)
    pos = [q for q in qs if q.get("mode") in ("phrase", "proximity")]
    return pos[:n]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    tag = os.path.basename(os.path.normpath(sf_dir))
    idx_dir = f"/tmp/tng_prof_idx_{tag}_r{REPLICAS}"
    ensure_index(sf_dir, idx_dir)
    qs = positional_queries(sf_dir, n)
    print(f"{len(qs)} positional queries "
          f"({sum(q['mode'] == 'phrase' for q in qs)} phrase)")

    from tesserae_ng_spark.query.search import Searcher

    s = Searcher(idx_dir)
    # warm pass: decode caches hot so the profile shows steady-state math,
    # not first-touch I/O (run with --cold to keep it in)
    if "--cold" not in sys.argv:
        for q in qs:
            s.search(q["query_text"], k=q.get("k", 10), mode=q["mode"],
                     window=q.get("window", 5))
    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    for q in qs:
        s.search(q["query_text"], k=q.get("k", 10), mode=q["mode"],
                 window=q.get("window", 5))
    prof.disable()
    wall = time.time() - t0
    print(f"wall {wall:.3f}s = {1e3 * wall / len(qs):.2f} ms/query "
          f"({len(qs) / wall:.1f} q/s single-thread)")
    out = io.StringIO()
    ps = pstats.Stats(prof, stream=out).sort_stats("cumulative")
    ps.print_stats(28)
    print(out.getvalue())


if __name__ == "__main__":
    main()
