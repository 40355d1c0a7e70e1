"""Index build orchestration: resumable shard builds + salted merge.

Layout under ``out_dir``:
    shards/postings/part=i/   stage-A block rows (tf/dl, unscored)
    shards/docs/part=i/       (doc_id, url, lang, dl) per shard
    manifests/part-i.json     per-partition lineage (status/metrics/checksum)
    postings/bucket=b/        final scored blocks (partitioned by term bucket)
    dictionary/               term → df/cf/max_score/n_blocks/bucket
    docs/                     consolidated docs table
    stats.json                corpus stats + build metrics
    manifests/merge.json      stage-B lineage

Stage A partitions the corpus by ``pmod(xxhash64(url), n_parts)`` — one
Spark job per partition, each independently resumable. Because a url maps
to exactly one partition, the as-of latest-crawl dedupe inside a partition
IS the global dedupe, and each (term, doc) pair lands in exactly one shard
(df/cf from block metadata is exact).

Scale note: on a real Iceberg corpus the partition predicate would be the
table's own partitioning (crawl date / bucket(url)) so each stage-A job
scans only its slice of manifests instead of hash-filtering a full scan;
the orchestration, manifests, and merge are unchanged.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tesserae_ng_spark.index.build import (
    docs_table,
    prepare_docs,
    term_doc_table,
)
from tesserae_ng_spark.index.encode import encode_blocks_local
from tesserae_ng_spark.index.manifest import (
    all_manifests,
    partition_done,
    write_manifest,
)
from tesserae_ng_spark.index.merge import build_dictionary, merge_shard_blocks
from tesserae_ng_spark.schemas import BLOCK_SIZE
from tesserae_ng_spark.sources.corpus import load_corpus


@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    avg_dl: float
    total_tokens: int
    n_terms: int
    n_blocks: int
    built_parts: list[int]
    skipped_parts: list[int]
    wall_s: float
    # wall per build phase (parts = shard builds incl. UDF analysis;
    # merge_postings = global block merge + bucketed write; merge_dict =
    # dictionary build + stats) — scaling-protocol observability: the
    # serial fraction at 4N hides here, not in the per-doc work
    phases: dict = None


def _fingerprint(
    source_desc: str, n_parts: int, part: int, lang: str | None,
    with_positions: bool, use_stored_text: bool, block_size: int,
) -> str:
    # every build-affecting parameter participates: resuming a dir whose
    # shards were built with different params must rebuild, not skip
    return (
        f"{source_desc}|P={n_parts}|part={part}|lang={lang}"
        f"|pos={with_positions}|stored={use_stored_text}|bs={block_size}"
    )


def _source_desc(source) -> str:
    if isinstance(source, str):
        return source
    # content-derived id for DataFrame sources: the canonicalized logical
    # plan's semantic hash — two builds from different plans never collide
    # into one resume lineage (they used to collapse to 'dataframe')
    try:
        return f"df:{source._jdf.queryExecution().analyzed().semanticHash()}"
    except Exception:
        return "dataframe"


def _write_shard(
    prepared: DataFrame, out_dir: str, part: int, block_size: int,
    with_positions: bool = True,
) -> dict:
    """Write one shard's docs + postings, collecting manifest metrics from
    Observations ON the write jobs themselves — no extra metric pass and no
    parquet read-back (each used to double shard I/O)."""
    from pyspark.sql import Observation

    doc_obs = Observation(f"docs-{part}")
    docs = docs_table(prepared).observe(
        doc_obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("tokens"),
    )

    td_dl = term_doc_table(prepared)
    if not with_positions:
        td_dl = td_dl.withColumn("positions", F.lit(None).cast("binary"))
    blk_obs = Observation(f"blocks-{part}")
    # exchange-free stage A (encode_blocks_local): partition-local numpy
    # sort + fragment encode; the only wide exchange in the whole build
    # is stage B's (term, salt) merge, which moves compressed blocks
    blocks = encode_blocks_local(td_dl, block_size=block_size).observe(
        blk_obs,
        F.count(F.lit(1)).alias("blocks"),
        # observe() forbids distinct aggregates; HLL is single-pass. The
        # exact term count lives in the final dictionary — the manifest
        # count is lineage metadata, not a query input.
        F.approx_count_distinct("term").alias("terms"),
        F.sum(F.crc32(F.col("doc_ids"))).alias("crc"),
    )
    # both writes consume the persisted `prepared`; submit them
    # concurrently (r7, guide §2.6): the cache's per-block locks make the
    # first job materialize each partition while the other waits, so the
    # analyzer chain runs once and the docs job back-fills the encode
    # job's tail instead of serializing after it.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_docs = pool.submit(
            lambda: docs.write.mode("overwrite").parquet(
                f"{out_dir}/shards/docs/part={part}"
            )
        )
        f_blocks = pool.submit(
            lambda: blocks.write.mode("overwrite").parquet(
                f"{out_dir}/shards/postings/part={part}"
            )
        )
        f_docs.result()
        f_blocks.result()
    d, b = doc_obs.get, blk_obs.get
    return {
        "row_count": int(d["n_docs"] or 0),
        "total_tokens": int(d["tokens"] or 0),
        "term_count": int(b["terms"] or 0),
        "block_count": int(b["blocks"] or 0),
        "checksum": str(b["crc"]),
    }


def build_index(
    spark: SparkSession,
    source,
    out_dir: str,
    n_parts: int = 4,
    lang: str | None = None,
    use_stored_text: bool = False,
    with_positions: bool = True,
    target_postings_per_salt: int = 1 << 20,
    n_buckets: int = 8,
    block_size: int = BLOCK_SIZE,
    resume: bool = True,
    fail_after_part: int | None = None,  # test hook: crash mid-build
) -> BuildResult:
    """Build (or resume) the full index. ``source`` = str for load_corpus
    or a ready corpus DataFrame."""
    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)
    if isinstance(source, str):
        corpus = load_corpus(spark, source)
    else:
        corpus = source
    source_desc = _source_desc(source)

    expected = {
        part: _fingerprint(
            source_desc, n_parts, part, lang,
            with_positions, use_stored_text, block_size,
        )
        for part in range(n_parts)
    }
    built, skipped, todo = [], [], []
    for part, fp in expected.items():
        if resume and partition_done(out_dir, part, fp):
            skipped.append(part)
        else:
            todo.append((part, fp))

    if fail_after_part is not None:
        # test hook path: deterministic ordering, crash mid-build
        for part, fp in todo:
            _build_partition(
                spark, corpus, out_dir, part, n_parts, fp, lang,
                use_stored_text, with_positions, block_size,
            )
            built.append(part)
            if part >= fail_after_part:
                raise RuntimeError(f"injected failure after partition {part}")
    elif todo:
        # partition jobs are independent (distinct output paths + manifests):
        # submit them concurrently so per-job fixed costs (scheduling, UDF
        # worker spin-up, small final stages) overlap. Spark's scheduler
        # interleaves the jobs across the same executor slots.
        from concurrent.futures import ThreadPoolExecutor

        max_conc = min(4, len(todo))
        # divide the 2×cores task budget between the concurrent jobs: each
        # job alone at 2×parallelism width made max_conc × 2 × cores tiny
        # tasks (and as many output files) for the same total work
        width = max(
            4, spark.sparkContext.defaultParallelism * 2 // max_conc
        )
        with ThreadPoolExecutor(max_workers=max_conc) as pool:
            futs = {
                pool.submit(
                    _build_partition, spark, corpus, out_dir, part, n_parts,
                    fp, lang, use_stored_text, with_positions, block_size,
                    width,
                ): part
                for part, fp in todo
            }
            for f, part in futs.items():
                f.result()
                built.append(part)
        built.sort()

    t_parts = time.time() - t_start
    result = _merge_all(
        spark, out_dir, target_postings_per_salt, n_buckets, block_size,
        expected=expected,
        merge_width=spark.sparkContext.defaultParallelism,
    )
    result.built_parts = built
    result.skipped_parts = skipped
    result.wall_s = time.time() - t_start
    result.phases["parts_s"] = round(t_parts, 3)
    return result


def _build_partition(
    spark, corpus: DataFrame, out_dir: str, part: int, n_parts: int,
    fingerprint: str, lang, use_stored_text, with_positions, block_size,
    width: int | None = None,
) -> None:
    t0 = time.time()
    corpus_i = corpus.filter(F.pmod(F.xxhash64("url"), F.lit(n_parts)) == part)
    # document-at-a-time term vectors: (term, doc_id, tf, positions, dl)
    # with NO token-level shuffle and no dl join (build.py). persist() so
    # the analyze UDF runs once for both the docs and postings writes.
    prepared = prepare_docs(
        corpus_i, lang=lang, use_stored_text=use_stored_text, width=width
    ).persist()
    try:
        metrics = _write_shard(prepared, out_dir, part, block_size, with_positions)
    finally:
        prepared.unpersist()
    write_manifest(
        out_dir,
        part,
        {
            "status": "done",
            "input_fingerprint": fingerprint,
            **metrics,
            "wall_ms": int((time.time() - t0) * 1000),
        },
    )


def _merge_all(
    spark, out_dir: str, target_postings_per_salt: int, n_buckets: int,
    block_size: int, expected: dict[int, str] | None = None,
    merge_width: int | None = None,
) -> BuildResult:
    manifests = [
        m
        for m in all_manifests(out_dir)
        if m.get("status") == "done" and m.get("stage") != "merge"
    ]
    if expected is not None:
        # lineage gate: the merge consumes EXACTLY the current build's
        # shards. Stale part dirs (different n_parts/params/source reusing
        # this out_dir) would silently duplicate postings or skew
        # n_docs/avg_dl — fail loudly instead.
        by_part = {m["partition_id"]: m for m in manifests}
        missing = sorted(p for p in expected if p not in by_part)
        mismatched = sorted(
            p for p, fp in expected.items()
            if p in by_part and by_part[p].get("input_fingerprint") != fp
        )
        extra = sorted(p for p in by_part if p not in expected)
        import glob as _glob
        import re as _re

        disk_parts = set()
        for d in _glob.glob(f"{out_dir}/shards/postings/part=*"):
            m = _re.search(r"part=(\d+)$", d)
            if m:
                disk_parts.add(int(m.group(1)))
        stray = sorted(disk_parts - set(expected))
        if missing or mismatched or extra or stray:
            raise ValueError(
                f"merge lineage mismatch in {out_dir}: missing manifests "
                f"{missing}, fingerprint mismatches {mismatched}, manifests "
                f"outside this build {extra}, stray shard dirs {stray} — "
                "the out_dir holds shards from a different build "
                "(n_parts/params/source changed?); use a fresh out_dir or "
                "delete the stale parts"
            )
        manifests = [by_part[p] for p in expected]
    n_docs = sum(m["row_count"] for m in manifests)
    total_tokens = sum(m["total_tokens"] for m in manifests)
    avg_dl = (total_tokens / n_docs) if n_docs else 0.0

    t_merge = time.time()
    shard_blocks = spark.read.parquet(f"{out_dir}/shards/postings")
    # the merge exchange partitions by the FINAL bucket (n_buckets), so
    # its output is already in sink layout — complete term groups per
    # partition, (term, salt, block_id)-ordered — and writes directly:
    # one shuffle for the whole stage instead of the former two (the
    # old path re-shuffled + re-sorted every final posting into buckets;
    # round-6 profile showed that second JVM pass was ~half the phase)
    postings = merge_shard_blocks(
        shard_blocks,
        n_docs=n_docs,
        avg_dl=avg_dl,
        target_postings_per_salt=target_postings_per_salt,
        block_size=block_size,
        n_buckets=n_buckets,
        # widen the merge exchange past n_buckets when cores allow (the
        # sharded per-shard merges run many _merge_alls concurrently and
        # pass no width — their combined tasks already fill the cores)
        merge_width=merge_width,
    )
    postings = postings.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )
    # small row groups: parquet min/max stats prune `term IN (...)` per
    # row group, so a query reads ~its terms' bytes instead of
    # decompressing a whole 128 MB default row group per bucket
    # (measured: 86 s → sub-second cold fetch). Rows arrive term-
    # clustered from the merge, so row-group stats stay tight without a
    # sort here.
    (
        postings.write.mode("overwrite")
        .option("parquet.block.size", 4 << 20)
        .partitionBy("bucket")
        .parquet(f"{out_dir}/postings")
    )

    t_dict = time.time()
    final_posts = spark.read.parquet(f"{out_dir}/postings")
    # r7: dictionary = ONE scan of the final postings (cf decoded from the
    # tf payloads — see merge.build_dictionary) and the n_terms/n_blocks
    # stats ride the SAME write job as an Observation: the old path paid a
    # second shards-postings scan + join for cf plus a dictionary
    # read-back job for stats (3 extra actions per merge; ×9 per bench run
    # counting the 8 sharded merges).
    from pyspark.sql import Observation

    dict_obs = Observation(f"dict-{os.path.basename(out_dir)}")
    dictionary = build_dictionary(final_posts, n_buckets).observe(
        dict_obs,
        F.count(F.lit(1)).alias("terms"),
        F.sum("n_blocks").alias("blocks"),
    )
    dictionary.coalesce(1).sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/dictionary")

    # docs stay where the shards wrote them (shards/docs/part=*) — readers
    # fall back there; re-copying terabytes of doc metadata buys nothing
    dagg = dict_obs.get
    stats = {
        "n_docs": n_docs,
        "avg_dl": avg_dl,
        "total_tokens": total_tokens,
        "n_terms": int(dagg["terms"] or 0),
        "n_blocks": int(dagg["blocks"] or 0),
        "n_buckets": n_buckets,
    }
    with open(f"{out_dir}/stats.json", "w") as f:
        json.dump(stats, f, sort_keys=True)
    write_manifest(out_dir, 99999, {"status": "done", "stage": "merge",
                                    "input_fingerprint": "merge", **stats})
    return BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avg_dl=avg_dl,
        total_tokens=total_tokens,
        n_terms=stats["n_terms"],
        n_blocks=stats["n_blocks"],
        built_parts=[],
        skipped_parts=[],
        wall_s=0.0,
        phases={
            "merge_postings_s": round(t_dict - t_merge, 3),
            "merge_dict_s": round(time.time() - t_dict, 3),
        },
    )
