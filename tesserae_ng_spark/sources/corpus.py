"""Corpus source: Iceberg-or-parquet loader + deterministic synthesizer.

Production input (BASELINE.json input_hint) is an Iceberg table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
at 10^12-document scale, partitioned by ``lang`` (and in production by a
crawl-date bucket) so `lang` filters prune partitions at the source.

In-sandbox there is no Iceberg runtime jar, so the loader accepts
``iceberg:<table>`` when the catalog resolves and falls back to parquet
paths; the synthesizer derives a contract-shaped corpus 1:1 from the
driver's read-only ``documents.parquet`` (FIXTURES.md §1) so that the same
rows back both the engine and the DuckDB oracle views.

Derivation rules (deterministic, seed-free — pure functions of the row):
    url      = 'https://{source}.example.com/{doc_id:08d}'
    warc_ts  = epoch 1735689600 (2025-01-01T00:00:00Z) + doc_id * 137 s
    html     = make_html(doc_id, source, text)  (template in functions/html.py)
    text     = golden extracted text (byte-identical target for html_extract)
    lang     = documents.lang
plus, for every doc_id divisible by 50 (~2%), a second OLDER crawl row for
the same url: warc_ts - 86400 s, text = substr(text, 1, 100), html rebuilt
from that text — exercising latest-wins as-of dedupe (`asof_latest_crawl`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesserae_ng_spark.functions.html import make_html

EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z
DUP_MOD = 50  # doc_id % 50 == 0 → extra older crawl row (~2%)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (parquet)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@F.pandas_udf(T.BinaryType())
def _make_html_udf(doc_id: pd.Series, source: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [make_html(int(d), s, t or "") for d, s, t in zip(doc_id, source, text)]
    )


ZIPF_LEVELS = range(1, 11)  # zipf{j}x{m}: df ≈ n_docs / 2^j — a 2^10 tail


def enrichment_vocab(doc_ids: list[int], n_docs: int) -> list[tuple[str, int]]:
    """(term, approx df) pairs for the deterministic enrichment vocabulary —
    lets the bench build QUERIES over the enriched dictionary without
    re-scanning the corpus."""
    out = []
    for j in ZIPF_LEVELS:
        for m in range(min(3, 1 << j)):
            out.append((f"zipf{j}x{m}", max(1, n_docs >> j)))
    for d in doc_ids[:3]:
        out.append((f"hapaxa{d:08d}", 1))
    return out


def synthesize_corpus(
    spark: SparkSession, sf_dir: str, with_dups: bool = True, replicas: int = 1,
    enrich_vocab: bool = False,
) -> DataFrame:
    """documents.parquet → contract-shaped corpus DataFrame.

    ``replicas > 1`` deterministically amplifies the corpus for bench runs:
    each document repeats under distinct urls (…{doc_id}r{rep}) — text and
    html identical, so analyzer work scales linearly while staying seeded.

    ``enrich_vocab`` (bench only — oracle keys must see the raw text)
    appends deterministic synthetic tokens per doc so the dictionary has a
    realistic shape instead of the base fixture's ~37 head terms:
    two doc-unique hapax terms + one term per Zipf level j with
    df ≈ n_docs/2^j (term `zipf{j}x{doc_id mod 2^j}`) — ≥10k distinct terms
    at sf0.1, spanning five orders of magnitude of df, so dictionary lookup,
    row-group pruning, and WAND skipping get measured on a real spectrum.

    Column pruning note: html generation is a pandas UDF, but it runs only
    in fixture synthesis — the production path reads html from storage.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id"),
        F.col("source"),
        F.col("text"),
        F.col("lang"),
    )
    if enrich_vocab:
        base = base.withColumn(
            "text",
            F.concat_ws(
                " ",
                F.col("text"),
                F.format_string("hapaxa%08d", "doc_id"),
                F.format_string("hapaxb%08d", "doc_id"),
                *[
                    F.format_string(
                        f"zipf{j}x%d", F.pmod("doc_id", F.lit(1 << j))
                    )
                    for j in ZIPF_LEVELS
                ],
            ),
        )
    if replicas > 1:
        base = base.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
        ).withColumn(
            "source", F.concat_ws("-r", "source", F.col("rep").cast("string"))
        ).drop("rep")
        # documents.parquet is a single file → one input partition; spread
        # the exploded rows so the html-template UDF runs on every core
        base = base.repartition(spark.sparkContext.defaultParallelism * 2)
    dups = (
        base.filter(F.col("doc_id") % DUP_MOD == 0).withColumn(
            "text", F.substring("text", 1, 100)
        )
        if with_dups
        else None
    )

    def finish(df: DataFrame, ts_offset: int) -> DataFrame:
        return df.select(
            F.format_string("https://%s.example.com/%08d", "source", "doc_id").alias(
                "url"
            ),
            F.timestamp_seconds(
                F.lit(EPOCH_2025) + F.col("doc_id") * 137 - F.lit(ts_offset)
            ).alias("warc_ts"),
            _make_html_udf("doc_id", "source", "text").alias("html"),
            F.col("text"),
            F.col("lang"),
        )

    out = finish(base, 0)
    if dups is not None:
        out = out.unionByName(finish(dups, 86400))
    return out


def corpus_oracle_cte(with_dups: bool = True, include_text: bool = True) -> str:
    """DuckDB CTE reproducing the synthesizer's (url, warc_epoch, text, lang)
    derivation from the pre-registered ``documents`` view — the oracle replays
    the same pure-function derivation so engine and oracle see identical rows.
    (html is engine-side only; the oracle checks text/metadata semantics.)
    """
    text_col = "text" if include_text else "NULL AS text"
    base = f"""
        SELECT printf('https://%s.example.com/%08d', source, doc_id) AS url,
               ({EPOCH_2025} + doc_id * 137) AS warc_epoch,
               {text_col}, lang, doc_id
        FROM documents
    """
    if not with_dups:
        return f"corpus AS ({base})"
    dup_text = "substr(text, 1, 100)" if include_text else "NULL"
    return f"""corpus AS (
        {base}
        UNION ALL
        SELECT printf('https://%s.example.com/%08d', source, doc_id) AS url,
               ({EPOCH_2025} + doc_id * 137 - 86400) AS warc_epoch,
               {dup_text} AS text, lang, doc_id
        FROM documents WHERE doc_id % {DUP_MOD} = 0
    )"""


def load_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Load the corpus table.

    ``source`` forms:
      - ``iceberg:<catalog.db.table>`` → ``spark.table`` (Iceberg catalog;
        partition pruning on `lang`/date from the table spec)
      - a directory containing ``corpus.parquet`` → read it
      - a driver testdata sf dir containing ``documents.parquet`` → synthesize
    """
    if source.startswith("iceberg:"):
        return spark.table(source.split(":", 1)[1])
    import os

    if os.path.exists(f"{source}/corpus.parquet"):
        return spark.read.parquet(f"{source}/corpus.parquet")
    return synthesize_corpus(spark, source)
