"""Index build: corpus → docs / token stream / term-doc postings / stats.

This is the logical plan shared by BOTH the oracle path (uncompressed
term-doc DataFrame + pure-DataFrame BM25; SURVEY.md §7 M1 — kept forever)
and the engine path (block-compressed postings, index/encode.py).

Pipeline (SURVEY.md §3.1), every stage a DataFrame with a declared schema:

  scan (pruned/pushed-down) → as-of latest-crawl dedupe → html_extract UDF
  → analyze UDF (tokenize+stem) → posexplode → (doc_id, term, pos)
  → groupBy aggregations (tf / dl / df / corpus stats)

Scale notes (100 TB):
- The only wide exchanges are the groupBys; Spark plans partial (map-side)
  aggregation for count/sum automatically, so the shuffle carries
  (term, doc_id) partial counts, not raw token occurrences.
- doc_id = xxhash64(url): stable, coordination-free, uniformly distributed
  → later doc-range salting is balanced by construction.
- The as-of dedupe is a window over url; urls are near-unique so there is
  no skew, and AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tesserae_ng_spark.functions.analysis import analyze_udf
from tesserae_ng_spark.functions.html import html_extract_udf


def asof_latest(corpus: DataFrame) -> DataFrame:
    """Latest-wins dedupe per url (as-of semantics on warc_ts).

    Spark has no native as-of join; the idiom is a ranking window with a
    deterministic tie-break (SURVEY.md §2.3 `asof_latest_crawl`).
    """
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (
        corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def prepare_docs(
    corpus: DataFrame,
    lang: str | None = None,
    use_stored_text: bool = False,
) -> DataFrame:
    """corpus → (doc_id, url, lang, text, tokens array<struct<term,pos>>).

    ``lang`` filter is applied FIRST so Catalyst pushes it into the scan
    (partition pruning on Iceberg, row-group skip on parquet).
    ``use_stored_text=False`` runs the real extractor (production path);
    True trusts the stored text column (used to cross-check byte-identity).
    """
    df = corpus
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    df = asof_latest(df)
    text = F.col("text") if use_stored_text else html_extract_udf(F.col("html"))
    df = df.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        "lang",
        text.alias("text"),
    )
    return df.withColumn("tokens", analyze_udf(F.col("text"), F.col("lang")))


def tokens_stream(prepared: DataFrame) -> DataFrame:
    """(doc_id, term, pos) token-occurrence stream."""
    return prepared.select(
        "doc_id", F.explode("tokens").alias("tk")
    ).select("doc_id", F.col("tk.term").alias("term"), F.col("tk.pos").alias("pos"))


def docs_table(prepared: DataFrame) -> DataFrame:
    """(doc_id, url, lang, dl). dl = exact token count (no quantization)."""
    return prepared.select(
        "doc_id", "url", "lang", F.size("tokens").alias("dl")
    )


def term_doc_table(tokens: DataFrame) -> DataFrame:
    """Uncompressed positional postings: (term, doc_id, tf, positions).

    Positions are sorted ascending — analyze emits ordinals in order, but
    array_sort makes the invariant explicit and shuffle-order-proof.
    """
    return tokens.groupBy("term", "doc_id").agg(
        F.count("*").cast("int").alias("tf"),
        F.array_sort(F.collect_list("pos")).alias("positions"),
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Single-row (n_docs, avg_dl, total_tokens); broadcast at query time."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).cast("double").alias("avg_dl"),
        F.sum("dl").alias("total_tokens"),
    )
