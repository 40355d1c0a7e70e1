"""Incremental index builds over a corpus stream (SURVEY.md §2.10).

The reference ingests via batch HTTP POSTs to Solr (no streaming
semantics); the engine analog is an incremental build: new corpus files
arrive → each micro-batch becomes one more index shard partition (stage A
of index/builder.py) with its own lineage manifest → the salted merge
(stage B) runs on demand to refresh the queryable index, exactly like a
Lucene segment merge after a commit.

Structured Streaming specifics:
- file source (``readStream``) with ``maxFilesPerTrigger`` batching;
  checkpointLocation gives exactly-once batch ids, and the per-batch
  manifest makes the shard write idempotent on replay (batch id = shard
  partition id + a reserved offset).
- watermarking is NOT needed: the as-of latest-crawl dedupe is an index-
  wide rule, enforced at merge/query time across shards (late re-crawls
  land in later shards; `asof_latest` semantics then pick the newest
  warc_ts; see merge note below).

Late-data note: duplicate urls ACROSS shards are possible in streaming
mode (the batch build partitions by url so they are not). The merge keeps
both postings; rank-identity workloads either dedupe upstream or run
compaction (rebuild affected partitions) — documented trade-off, same as
Lucene soft-deletes vs merge-time purge.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from tesserae_ng_spark.index.build import prepare_docs
from tesserae_ng_spark.index.manifest import partition_done, write_manifest
from tesserae_ng_spark.schemas import BLOCK_SIZE, CORPUS_SCHEMA

STREAM_PART_BASE = 10_000  # shard ids for streamed batches live above this


def _process_batch(batch_df: DataFrame, batch_id: int, out_dir: str,
                   lang: str | None, block_size: int) -> None:
    part = STREAM_PART_BASE + int(batch_id)
    fp = f"stream-batch={batch_id}"
    if partition_done(out_dir, part, fp):
        return  # replayed batch after checkpoint recovery → idempotent skip
    t0 = time.time()
    from tesserae_ng_spark.index.builder import _write_shard

    prepared = prepare_docs(batch_df, lang=lang).persist()
    try:
        metrics = _write_shard(prepared, out_dir, part, block_size)
    finally:
        prepared.unpersist()
    write_manifest(out_dir, part, {
        "status": "done",
        "input_fingerprint": fp,
        **metrics,
        "wall_ms": int((time.time() - t0) * 1000),
    })


def incremental_index_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    lang: str | None = None,
    max_files_per_trigger: int = 4,
    block_size: int = BLOCK_SIZE,
):
    """Start the incremental build stream; returns the StreamingQuery.

    Callers refresh the queryable index by running stage B
    (index.builder._merge_all) after any number of committed batches.
    """
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: _process_batch(df, bid, out_dir, lang, block_size)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
