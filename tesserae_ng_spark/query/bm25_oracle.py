"""Exhaustive BM25 top-k as a pure DataFrame plan (SURVEY.md §7 M1).

This is the permanent oracle path: no WAND, no compression — Catalyst
plans it as scan → semi-join on query terms → join stats → arithmetic →
TakeOrderedAndProject (per-partition bounded heap + driver merge, the same
algorithm as Lucene's TopScoreDocCollector).

BM25 spec (FIXTURES.md §3, Lucene BM25Similarity semantics, exact dl):
    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm    = tf / (tf + k1 * (1 - b + b * dl / avg_dl))
    score(q,d) = Σ_{t ∈ unique(q), t ∈ d} idf(t) * tf_norm(t, d)
Query terms are DEDUPLICATED (set semantics). Ties break (score desc,
doc_id asc) — deterministic rank-identity across parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tesserae_ng_spark.schemas import BM25_B, BM25_K1


def idf_expr(n_docs: Column | float, df_col: Column) -> Column:
    return F.log(1.0 + (n_docs - df_col + 0.5) / (df_col + 0.5))


def tf_norm_expr(tf: Column, dl: Column, avg_dl: Column | float,
                 k1: float = BM25_K1, b: float = BM25_B) -> Column:
    return tf / (tf + k1 * (1.0 - b + b * dl / avg_dl))


def bm25_scores(
    term_doc: DataFrame,
    query_terms: list[str],
    n_docs: int,
    avg_dl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-doc BM25 scores for a single query → (doc_id, score).

    ``term_doc`` carries (term, doc_id, tf, dl). Plan shape: the query-term
    IN-list filter is pushed into the postings scan; df comes from a groupBy
    over the *filtered* postings (tiny) and is broadcast back.
    """
    qterms = sorted(set(query_terms))
    if not qterms:
        return term_doc.sparkSession.createDataFrame([], "doc_id long, score double")
    matched = term_doc.filter(F.col("term").isin(qterms))
    term_df = matched.groupBy("term").agg(F.count("*").alias("df"))
    scored = matched.join(F.broadcast(term_df), "term").select(
        "doc_id",
        (
            idf_expr(float(n_docs), F.col("df"))
            * tf_norm_expr(F.col("tf"), F.col("dl"), float(avg_dl), k1, b)
        ).alias("partial"),
    )
    return scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))


def bm25_topk_oracle(
    term_doc: DataFrame,
    query_terms: list[str],
    k: int,
    n_docs: int,
    avg_dl: float,
) -> DataFrame:
    """Top-k (rank, doc_id, score) with the deterministic tie-break."""
    scores = bm25_scores(term_doc, query_terms, n_docs, avg_dl)
    return (
        scores.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
            .alias("rank"),
            "doc_id",
            "score",
        )
    )
