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
from tesserae_ng_spark.operators.common import t

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
    "grouping_sets_stats",
    """SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt,
              CAST(sum(n_chars) AS BIGINT) AS total_chars,
              ROUND(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_nchars
       FROM documents GROUP BY ROLLUP(lang, source)""",
)
def grouping_sets_stats(spark, sf):
    # Solr-facet cousin (SURVEY.md §2.4): per-(lang, source) ops rollup.
    # Consolidates corpus_stats_agg under the 50-key driver cap: the rollup's
    # grand-total row (lang=source=NULL) IS the whole-corpus n_docs /
    # total_chars / avg_nchars aggregate.
    return (
        t(spark, sf, "documents")
        .rollup("lang", "source")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias(
                "avg_nchars"
            ),
        )
    )


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
       FROM (SELECT doc_id, n_chars FROM documents
             ORDER BY n_chars DESC, doc_id ASC LIMIT 100)""",
)
def rank_results(spark, sf):
    # final-results ranking with the engine's deterministic tie-break.
    # Ranks the top-100 ONLY: orderBy+limit (per-partition bounded heap +
    # driver merge) bounds the window input to k rows — an unpartitioned
    # row_number over the full table would single-reducer-sort everything
    # at 100 TB. A search engine never ranks beyond the page it returns.
    top = (
        t(spark, sf, "documents")
        .select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(100)
    )
    w = W.partitionBy(F.lit(0)).orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


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
    """SELECT 'sort' AS variant, doc_id, n_chars FROM
         (SELECT doc_id, n_chars FROM documents
          ORDER BY n_chars DESC, doc_id ASC LIMIT 100)
       UNION ALL
       SELECT 'heap' AS variant, doc_id, n_chars FROM
         (SELECT doc_id, n_chars FROM documents
          ORDER BY n_chars DESC, doc_id ASC LIMIT 50)""",
)
def global_sort_limit(spark, sf):
    # Two §2.6 top-k strategies in one key (50-key driver cap), tagged:
    #   variant='sort' — declarative orderBy+limit: Spark plans
    #     TakeOrderedAndProject (per-partition bounded heap + driver merge,
    #     the same algorithm as Lucene's TopScoreDocCollector)
    #   variant='heap' — bounded_minheap_topk: explicit per-partition Python
    #     heap → driver merge, the WAND result-heap shape (§2.11) exercised
    #     standalone; oracle for both = exhaustive ORDER BY LIMIT.
    docs = t(spark, sf, "documents").select("doc_id", "n_chars")
    sorted_top = (
        docs.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(100)
        .select(F.lit("sort").alias("variant"), "doc_id", "n_chars")
    )

    k = 50

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
    heap_top = spark.createDataFrame(rows, "doc_id long, n_chars long").select(
        F.lit("heap").alias("variant"), "doc_id", "n_chars"
    )
    return sorted_top.unionByName(heap_top)


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@register(
    "union_shards",
    """SELECT 'shard' AS src, doc_id AS id FROM documents WHERE doc_id % 2 = 0
       UNION ALL
       SELECT 'shard' AS src, doc_id AS id FROM documents WHERE doc_id % 2 = 1
       UNION ALL
       SELECT 'batch' AS src, event_id AS id FROM events
       WHERE ts < TIMESTAMP '2024-01-03'
       UNION ALL
       SELECT 'batch' AS src, event_id AS id FROM events
       WHERE ts >= TIMESTAMP '2024-01-03'""",
)
def union_shards(spark, sf):
    # §2.7 UNION ALL in both guises (one key under the 50-key driver cap):
    #   src='shard' — index-shard reunification over documents
    #   src='batch' — union_all_batches: time-sliced ingest batches (events)
    # UNION ALL is shuffle-free in Spark (partitions concatenate).
    d = t(spark, sf, "documents")
    ev = t(spark, sf, "events")
    shard = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(F.lit("shard").alias("src"), F.col("doc_id").alias("id"))
        .unionByName(
            d.filter(F.col("doc_id") % 2 == 1).select(
                F.lit("shard").alias("src"), F.col("doc_id").alias("id")
            )
        )
    )
    batch = (
        ev.filter(F.col("ts") < "2024-01-03")
        .select(F.lit("batch").alias("src"), F.col("event_id").alias("id"))
        .unionByName(
            ev.filter(F.col("ts") >= "2024-01-03").select(
                F.lit("batch").alias("src"), F.col("event_id").alias("id")
            )
        )
    )
    return shard.unionByName(batch)


@register(
    "intersect_doc_sets",
    """SELECT 'intersect' AS op, o_custkey FROM
         (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
       UNION ALL
       SELECT 'except' AS op, o_custkey FROM
         (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""",
)
def intersect_doc_sets(spark, sf):
    # §2.7 INTERSECT + EXCEPT (except_doc_sets folded in under the 50-key
    # driver cap), tagged by op. Both are distinct-set semantics, matching
    # the SQL; Spark plans them as aggregated joins on the full row key.
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    inter = a.intersect(b).select(F.lit("intersect").alias("op"), "o_custkey")
    exc = a.subtract(b).select(F.lit("except").alias("op"), "o_custkey")
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# §2.8 scalar functions on relational testdata
# ---------------------------------------------------------------------------


@register(
    "len_chars",
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS len_calc,
              concat(lang, ':', source) AS tag, lower(text) AS folded
       FROM documents""",
)
def len_chars(spark, sf):
    # §2.8 scalar funcs over documents in one pass (50-key driver cap):
    # length (len_chars), concat (concat_fields), and lower() — the
    # analyzer chain's lowercase_fold normalize step as a column op (inside
    # the UDF chain it's pd.Series.str.lower; same byte semantics here).
    return t(spark, sf, "documents").select(
        "doc_id",
        F.length("text").cast("long").alias("len_calc"),
        F.concat_ws(":", "lang", "source").alias("tag"),
        F.lower("text").alias("folded"),
    )


@register(
    "map_props_json",
    """SELECT event_id, json_extract_string(props, '$.k') AS k_val,
              strftime(ts, '%Y-%m-%d') AS day
       FROM events""",
)
def map_props_json(spark, sf):
    # §2.8 semi-structured + temporal scalar funcs over events (date_bucket
    # folded in under the 50-key driver cap: the day column is the bucket;
    # bucketed groupBy-count shape is covered by grouping_sets_stats).
    return t(spark, sf, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_val"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
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
