"""Corpus-table operator keys: contract-shaped scan, lang pushdown, as-of
latest-crawl dedupe, HTML extraction byte-identity, stable doc ids.

The Spark side synthesizes the corpus from `documents` (pure-function
derivation, FIXTURES.md §1); the DuckDB oracle replays the SAME derivation
via corpus_oracle_cte — so these keys check the engine's *semantics* on
identical rows, including the extractor's byte-identity invariant.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tesserae_ng_spark.operators import register
from tesserae_ng_spark.operators.common import t
from tesserae_ng_spark.sources.corpus import corpus_oracle_cte, synthesize_corpus

_CTE = corpus_oracle_cte()
_CTE_NO_TEXT = corpus_oracle_cte(include_text=False)


@register(
    "scan_documents",
    "SELECT doc_id, lang, source, n_chars FROM documents",
)
def scan_documents(spark, sf):
    # projection-pruned scan of the corpus-backing table.
    return t(spark, sf, "documents").select("doc_id", "lang", "source", "n_chars")


@register(
    "lang_filter_pushdown",
    "SELECT doc_id, n_chars FROM documents WHERE lang = 'en'",
)
def lang_filter_pushdown(spark, sf):
    # `lang = 'en'` reaches the scan (PushedFilters); on Iceberg this is
    # partition pruning — at 10^12 docs it skips entire manifests.
    return (
        t(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )


@register(
    "asof_latest_crawl",
    f"""WITH {_CTE},
       ranked AS (
         SELECT url, warc_epoch, lang,
                row_number() OVER (PARTITION BY url ORDER BY warc_epoch DESC) AS rn
         FROM corpus)
       SELECT url, CAST(warc_epoch AS BIGINT) AS warc_epoch, lang
       FROM ranked WHERE rn = 1""",
)
def asof_latest_crawl(spark, sf):
    # latest-wins per url over the 2%-duplicated corpus (window idiom —
    # Spark has no native as-of join; SURVEY.md §2.3).
    corpus = synthesize_corpus(spark, sf)
    w = W.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "url",
            F.unix_timestamp("warc_ts").cast("long").alias("warc_epoch"),
            "lang",
        )
    )


@register(
    "html_extract",
    f"""WITH {_CTE}
       SELECT url, CAST(warc_epoch AS BIGINT) AS warc_epoch, text FROM corpus""",
)
def html_extract(spark, sf):
    # THE per-row invariant (BASELINE.json): extracted text must be
    # byte-identical to the golden text column — checked here across every
    # row (incl. duplicate older crawls) via the driver's value hash.
    from tesserae_ng_spark.functions.html import html_extract_udf

    corpus = synthesize_corpus(spark, sf)
    return corpus.select(
        "url",
        F.unix_timestamp("warc_ts").cast("long").alias("warc_epoch"),
        html_extract_udf(F.col("html")).alias("text"),
    )


@register(
    "hash_ids",
    f"""WITH {_CTE_NO_TEXT}
       SELECT CAST(count(DISTINCT url) AS BIGINT) AS n FROM corpus""",
)
def hash_ids(spark, sf):
    # stable doc_id = xxhash64(url): the oracle checks injectivity on this
    # corpus (count of distinct hashes == count of distinct urls).
    corpus = synthesize_corpus(spark, sf, with_dups=True)
    return corpus.select(F.xxhash64("url").alias("doc_id")).agg(
        F.countDistinct("doc_id").alias("n")
    )


# sort_within_partitions (§2.6): the repartition-on-term +
# sortWithinPartitions(term, doc_id) exchange is exercised and checked as
# part of `salted_repartition_sort` (the index builder literally IS that
# exchange — engine_ops.py) under the 50-key driver cap; its partition-local
# order invariant is pytest-asserted in tests/test_index_e2e.py.
