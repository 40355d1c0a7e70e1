"""Streaming corpus monitoring: watermarked windowed aggregation + custom
stateful first-seen tracking (SURVEY.md §2.10).

Two Structured Streaming shapes the incremental build (incremental.py)
doesn't exercise:

- ``crawl_rate_stream``: event-time windowed aggregation with a watermark —
  the ingest-monitoring query a production crawl pipeline runs next to the
  indexer (docs/hour per lang, late crawls folded in until the watermark
  closes a window). Late data past the watermark is dropped by Spark's
  state store; in-order replays are idempotent.

- ``first_seen_stream``: custom stateful operator via
  ``applyInPandasWithState`` — tracks per-url first-seen crawl time across
  micro-batches (GroupState, one tiny state row per url) and emits a url
  exactly once, when first observed. This is the streaming analog of the
  as-of dedupe: the batch build dedupes within its snapshot; a stream has
  to REMEMBER across triggers.

Scale notes: both operators key state by low-cardinality-per-task keys
(window×lang; url hash-partitioned), state size is O(windows) resp.
O(urls seen); at web scale the first-seen state would use a TTL timeout
(GroupStateTimeout) or an approximate filter — wired here with
ProcessingTimeTimeout left NoTimeout for determinism in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tesserae_ng_spark.schemas import CORPUS_SCHEMA


def _corpus_stream(spark: SparkSession, input_path: str, max_files: int):
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_path)
    )


def crawl_rate_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    query_name: str = "crawl_rate",
    window: str = "1 hour",
    watermark: str = "1 day",
    max_files_per_trigger: int = 4,
):
    """Watermarked windowed crawl-rate aggregation → in-memory sink.

    Returns the StreamingQuery; results land in the ``query_name`` table:
    (window struct, lang, n_pages, total_bytes).
    """
    stream = _corpus_stream(spark, input_path, max_files_per_trigger)
    agg = (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("window"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("total_bytes"),
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("first_ts", T.TimestampType(), False),
    ]
)
_STATE_SCHEMA = "seen boolean"


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit (url, first_ts) the FIRST time a url appears.

    Semantics (processing-order first-seen, by design): ``first_ts`` is the
    min ``warc_ts`` WITHIN the first micro-batch that contains the url —
    not the min over the whole stream. With out-of-order file ingestion a
    later batch may carry an earlier crawl of the same url; emitting
    exactly once in append mode forbids revising the row, and holding every
    row back for a global min would turn a streaming dedupe into a batch
    job (no bounded emission point without a watermark-style timeout). The
    batch as-of dedupe (index.build.asof_latest) is the reconciling oracle
    when event-time-exact firsts are needed. Pinned by
    tests/test_streaming.py::test_first_seen_timestamp_semantics."""
    if state.exists:
        return
    first_ts = None
    for pdf in pdfs:
        ts = pdf["warc_ts"].min()
        if first_ts is None or ts < first_ts:
            first_ts = ts
    state.update((True,))
    yield pd.DataFrame({"url": [key[0]], "first_ts": [first_ts]})


def first_seen_stream(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Custom stateful streaming dedupe via applyInPandasWithState:
    one output row per url, at its first appearance across micro-batches.
    Output appends parquet at ``out_path``."""
    stream = _corpus_stream(spark, input_path, max_files_per_trigger)
    firsts = (
        stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        firsts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def crawl_rate_batch_oracle(corpus: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch-mode ground truth for crawl_rate_stream on a finite input."""
    return corpus.groupBy(F.window("warc_ts", window).alias("window"), "lang").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.length("html")).alias("total_bytes"),
    )
