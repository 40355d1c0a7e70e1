"""Shared helpers for the operator surface.

Cross-engine hash-match discipline (the driver compares Spark vs DuckDB by
row-count + schema + order-insensitive value hash):
- alias every computed column identically on both sides
- cast counts/sums to BIGINT explicitly (DuckDB SUM(BIGINT) → HUGEINT
  otherwise), ratios/scores to DOUBLE
- round every float that went through arithmetic to 6 decimals (both
  engines round half-away-from-zero for doubles)
- timestamps cross as strings (strftime / date_format)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tesserae_ng_spark.sources.corpus import load_table

# Deterministic token stream over the `documents` view, JVM-side (codegen;
# the pandas-UDF analyzer path is exercised by the `tokenize` key and the
# engine build). Matches functions/analysis.tokenize exactly: lowercase,
# maximal [a-z0-9] runs, 0-based ordinals.
TOKS_CTE = """
toks AS (
  SELECT doc_id, term,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS BIGINT) AS pos
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term,
           generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9]+'), 1) AS ord
    FROM documents
  ) WHERE term <> ''
)"""


def tokens_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side (doc_id, term, pos) token stream over documents."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("ord")
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("ord", "term"),
        )
        .filter(F.col("term") != "")
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "term", "pos")
    )


def terms_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) token stream WITHOUT ordinals — for consumers that
    never read ``pos`` (bm25_exhaustive, math_scores). Skipping the
    row_number window drops its per-doc exchange + sort from every use of
    the stream (r7, guide §2.4): downstream groupBys then aggregate
    map-side before any shuffle instead of shuffling raw tokens first.
    Row multiset of (doc_id, term) is identical to tokens_df."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
