"""Relational operator keys (SURVEY.md §2.1–2.7) over the driver testdata.

These validate the engine's relational skeleton — the same join/agg/window
/sort/set-op shapes the index build and query paths are composed of —
against the DuckDB oracle. Every plan is declarative DataFrame API: Catalyst
does pushdown/pruning, AQE picks join strategies and coalesces shuffles.

Scale notes are attached per operator where the 100 TB story differs from
the sandbox plan (broadcast thresholds, shuffle keys, skew).
"""

from __future__ import annotations

import heapq

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tesserae_ng_spark.operators import register
from tesserae_ng_spark.operators.common import TOKS_CTE, t, tokens_df

# ---------------------------------------------------------------------------
# §2.2 projection / predicates
# ---------------------------------------------------------------------------


@register(
    "project_prune",
    "SELECT l_orderkey, l_extendedprice FROM lineitem",
)
def project_prune(spark, sf):
    # Catalyst prunes the parquet scan to exactly these two columns
    # (ReadSchema in explain) — at 100 TB this is the difference between
    # reading 2 columns and reading 11.
    return t(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice")


@register(
    "predicate_and_or",
    """SELECT l_orderkey, l_linenumber, l_quantity
       FROM lineitem
       WHERE (l_quantity > 30 AND l_discount < 0.05) OR NOT (l_returnflag = 'N')""",
)
def predicate_and_or(spark, sf):
    li = t(spark, sf, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)) | ~(
        F.col("l_returnflag") == "N"
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "min_ncharsfilter",
    "SELECT doc_id, n_chars FROM documents WHERE n_chars >= 200",
)
def min_ncharsfilter(spark, sf):
    # range predicate reaches the parquet scan (PushedFilters: GreaterThanOrEqual)
    return (
        t(spark, sf, "documents")
        .filter(F.col("n_chars") >= 200)
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_dim",
    """SELECT c_custkey, c_name, n_name
       FROM customer JOIN nation ON c_nationkey = n_nationkey""",
)
def join_broadcast_dim(spark, sf):
    # dims (nation: 25 rows) are broadcast — no shuffle of the fact side.
    # Same shape as dictionary-rows→postings attachment at query time.
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )


@register(
    "join_sortmerge_fact",
    """SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
)
def join_sortmerge_fact(spark, sf):
    # fact×fact equi-join: planner picks SMJ (or AQE demotes to broadcast at
    # sandbox scale). At 100 TB both sides shuffle on the key — this is the
    # term_doc × docs (attach dl) join shape in the index build.
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus"
    )


@register(
    "semi_join_queryterms",
    """SELECT l_orderkey, l_partkey FROM lineitem
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')""",
)
def semi_join_queryterms(spark, sf):
    # left-semi: keep only postings of query terms (§2.3). The semi side is
    # tiny at query time → broadcast semi-join, no fact shuffle.
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").select(
        "l_orderkey", "l_partkey"
    )


@register(
    "anti_join_stopwords",
    """SELECT l_orderkey, l_partkey FROM lineitem
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_orderkey = l_orderkey AND o_totalprice > 200000)""",
)
def anti_join_stopwords(spark, sf):
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").filter(F.col("o_totalprice") > 200000)
    return li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").select(
        "l_orderkey", "l_partkey"
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "corpus_stats_agg",
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
              ROUND(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_nchars,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents""",
)
def corpus_stats_agg(spark, sf):
    return t(spark, sf, "documents").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias(
            "avg_nchars"
        ),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "grouping_sets_stats",
    """SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt
       FROM documents GROUP BY ROLLUP(lang, source)""",
)
def grouping_sets_stats(spark, sf):
    # Solr-facet cousin (SURVEY.md §2.4): per-(lang, source) ops rollup.
    return (
        t(spark, sf, "documents")
        .rollup("lang", "source")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "doclen_agg",
    f"""WITH {TOKS_CTE}
       SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id""",
)
def doclen_agg(spark, sf):
    return tokens_df(spark, sf).groupBy("doc_id").agg(F.count("*").alias("dl"))


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------


@register(
    "topk_per_term",
    """SELECT * FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
         FROM orders) WHERE rn <= 3""",
)
def topk_per_term(spark, sf):
    # per-key top-N (per-term top docs by score metadata). Spark plans a
    # partial window-group-limit before the shuffle in recent versions.
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "rank_results",
    """SELECT doc_id, n_chars,
              CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rnk
       FROM documents""",
)
def rank_results(spark, sf):
    # final-results ranking with the engine's deterministic tie-break.
    w = W.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        t(spark, sf, "documents")
        .select("doc_id", "n_chars")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
    )


@register(
    "running_cf",
    """SELECT o_custkey, o_orderkey,
              ROUND(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
       FROM orders""",
)
def running_cf(spark, sf):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running"),
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / top-k
# ---------------------------------------------------------------------------


@register(
    "global_sort_limit",
    """SELECT doc_id, n_chars FROM documents
       ORDER BY n_chars DESC, doc_id ASC LIMIT 100""",
)
def global_sort_limit(spark, sf):
    # Spark plans TakeOrderedAndProject: per-partition bounded heap + driver
    # merge — the same algorithm as Lucene's TopScoreDocCollector.
    return (
        t(spark, sf, "documents")
        .select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(100)
    )


@register(
    "bounded_minheap_topk",
    """SELECT doc_id, n_chars FROM documents
       ORDER BY n_chars DESC, doc_id ASC LIMIT 50""",
)
def bounded_minheap_topk(spark, sf):
    # Explicit distributed bounded-heap top-k: per-partition Python heap →
    # driver merge. This is the WAND result-heap shape (§2.11) exercised as
    # a standalone operator; oracle = exhaustive ORDER BY LIMIT.
    k = 50
    docs = t(spark, sf, "documents").select("doc_id", "n_chars")

    def part_topk(rows):
        heap = []
        for r in rows:
            # invert ordering: keep k largest by (n_chars, -doc_id)
            item = (r["n_chars"], -r["doc_id"])
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
        return heap

    partials = docs.rdd.mapPartitions(lambda it: part_topk(it)).collect()
    top = heapq.nlargest(k, partials)
    rows = [(-negid, nch) for (nch, negid) in top]
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@register(
    "union_all_batches",
    """SELECT event_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-03'
       UNION ALL
       SELECT event_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-03'""",
)
def union_all_batches(spark, sf):
    ev = t(spark, sf, "events")
    a = ev.filter(F.col("ts") < "2024-01-03").select("event_id", "event_type")
    b = ev.filter(F.col("ts") >= "2024-01-03").select("event_id", "event_type")
    return a.unionByName(b)


@register(
    "union_shards",
    """SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
       UNION ALL
       SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 1""",
)
def union_shards(spark, sf):
    d = t(spark, sf, "documents")
    return (
        d.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "lang")
        .unionByName(d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang"))
    )


@register(
    "intersect_doc_sets",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
)
def intersect_doc_sets(spark, sf):
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "except_doc_sets",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
)
def except_doc_sets(spark, sf):
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.subtract(b)  # set semantics: EXCEPT DISTINCT, matches the SQL


# ---------------------------------------------------------------------------
# §2.8 scalar functions on relational testdata
# ---------------------------------------------------------------------------


@register(
    "len_chars",
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS len_calc,
              concat(lang, ':', source) AS tag
       FROM documents""",
)
def len_chars(spark, sf):
    return t(spark, sf, "documents").select(
        "doc_id",
        F.length("text").cast("long").alias("len_calc"),
        F.concat_ws(":", "lang", "source").alias("tag"),
    )


@register(
    "date_bucket",
    """SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS cnt
       FROM events GROUP BY 1""",
)
def date_bucket(spark, sf):
    return (
        t(spark, sf, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "map_props_json",
    """SELECT event_id, json_extract_string(props, '$.k') AS k_val
       FROM events""",
)
def map_props_json(spark, sf):
    return t(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").alias("k_val")
    )


@register(
    "array_ops",
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
              ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val
       FROM embeddings""",
)
def array_ops(spark, sf):
    return t(spark, sf, "embeddings").select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
    )
