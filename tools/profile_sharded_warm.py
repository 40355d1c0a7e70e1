"""Where does the warm sharded batch spend its time at local[2] vs [8]?

The round-6 pooled protocol graded sharded-warm scaling 0.78 — just
under the 0.8 bar, with per-run medians swinging 0.625/0.833. Amdahl at
4x parallelism puts the implied serial fraction near 9% (~2 s of a 23 s
local[2] batch). This probe decomposes one warm batch per level into:

  t_analyze  driver-side analyze_query over the whole batch (serial)
  t_stats    phase-1 global stats (memoized warm -> ~0)
  t_job      the distributed phase-2 job + merge + collect
  tasks      per-task wall + searcher-cache hit/miss from
             TNG_SHARDED_PROFILE (task->worker affinity: a warm task on
             a worker caching a DIFFERENT shard re-pays per-process
             decode, which depresses warm throughput most at high
             worker counts where each worker has seen fewer shards)

Run against the scaling protocol's kept shard dirs (SPARK_GRAFT_KEEP_
SHARDS) so the input is byte-identical to the graded rows.

Usage: python tools/profile_sharded_warm.py [shard_prefix] [cpus...]
       default prefix /dev/shm/tesserae_scale_idx_2_shard, levels 2 8
Prints one JSON line per (level, pass).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import glob, json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/tng_spark_local")
shard_dirs = {shard_dirs!r}
cpus = {cpus}
prof_dir = {prof_dir!r}

from tesserae_ng_spark.session import get_spark
from tesserae_ng_spark.fixtures import make_queries
from tesserae_ng_spark.sources.corpus import enrichment_vocab
import duckdb

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
replicas = int(os.environ.get("SPARK_GRAFT_REPLICAS", "96"))
vocab_rows = duckdb.sql(
    f'''SELECT term, count(DISTINCT doc_id) AS df FROM (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM '{{sf_dir}}/documents.parquet') WHERE term <> ''
        GROUP BY term ORDER BY df DESC, term'''
).fetchall()
ids_n = duckdb.sql(
    f"SELECT min(doc_id), max(doc_id), count(*) FROM '{{sf_dir}}/documents.parquet'"
).fetchone()
vocab = [(t, d * replicas) for t, d in vocab_rows] + [
    (t, d * replicas) for t, d in enrichment_vocab([ids_n[0], ids_n[1]], ids_n[2])
]
vocab.sort(key=lambda p: (-p[1], p[0]))
queries = make_queries(vocab, n=2000, seed=777)
# mode filters: decompose which workload owns the 2->8 steady-state task
# inflation (bm25 = candidate gathers + accumulator scatters; positional
# = position gathers + key merges — the LLC-heaviest slice)
if os.environ.get("TNG_PROF_BM25_ONLY") == "1":
    queries = [q for q in queries if q["mode"] == "bm25"]
if os.environ.get("TNG_PROF_POS_ONLY") == "1":
    queries = [q for q in queries if q["mode"] != "bm25"]

spark = get_spark("prof_sharded", master=f"local[{{cpus}}]", shuffle_partitions=cpus)

from tesserae_ng_spark.functions.analysis import analyze_query
from tesserae_ng_spark.query import sharded
from tesserae_ng_spark.query.sharded import (
    global_shard_stats, prime_shard_workers, search_sharded,
)

for pass_name in ("cold", "warm1", "prime", "warm_primed1", "warm_primed2"):
    if pass_name == "prime":
        t0 = time.time()
        info = prime_shard_workers(spark, shard_dirs, queries=queries)
        print("RESULT " + json.dumps({{
            "cpus": cpus, "pass": "prime", "prime_s": round(time.time() - t0, 3),
            **info,
        }}), flush=True)
        continue
    for f in os.listdir(prof_dir):
        os.unlink(os.path.join(prof_dir, f))
    t0 = time.time()
    terms = set()
    for q in queries:
        terms.update(analyze_query(q["query_text"]))
    t_analyze = time.time() - t0
    t0 = time.time()
    global_shard_stats(shard_dirs, sorted(terms), sc=spark.sparkContext)
    t_stats = time.time() - t0
    t0 = time.time()
    n = search_sharded(spark, shard_dirs, queries, k=10).count()
    t_job = time.time() - t0
    tasks = []
    for p in glob.glob(os.path.join(prof_dir, "task_*")):
        with open(p) as f:
            for line in f:
                tasks.append(json.loads(line))
    hits = sum(1 for t in tasks if t["cache_hit"])
    walls = sorted(t["wall_s"] for t in tasks)
    pids = {{}}
    for t in tasks:
        pids.setdefault(t["pid"], []).append((t["shard"], t["cache_hit"]))
    print("RESULT " + json.dumps({{
        "cpus": cpus, "pass": pass_name, "hits": n,
        "t_analyze": round(t_analyze, 3), "t_stats": round(t_stats, 3),
        "t_job": round(t_job, 3),
        "task_walls": walls, "task_sum": round(sum(walls), 3),
        "cache_hits": f"{{hits}}/{{len(tasks)}}",
        "workers": {{str(k): v for k, v in sorted(pids.items())}},
    }}), flush=True)
spark.stop()
"""


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/tesserae_scale_idx_2_shard"
    levels = [int(x) for x in sys.argv[2:]] or [2, 8]
    shard_dirs = sorted(glob.glob(prefix + "*"))
    assert shard_dirs, f"no shard dirs at {prefix}*"
    prof_dir = "/tmp/tng_sharded_prof"
    shutil.rmtree(prof_dir, ignore_errors=True)
    os.makedirs(prof_dir)
    env = dict(os.environ, TNG_SHARDED_PROFILE=prof_dir, PYTHONPATH=REPO)
    for cpus in levels:
        code = CHILD.format(
            repo=REPO, shard_dirs=shard_dirs, cpus=cpus, prof_dir=prof_dir
        )
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[7:], flush=True)
        if r.returncode != 0:
            print(r.stderr[-3000:], file=sys.stderr)
            sys.exit(1)
        print(json.dumps({"cpus": cpus, "child_wall": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
