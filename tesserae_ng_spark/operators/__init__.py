"""Operator surface (SURVEY.md §2): every driver-checkable key.

Each module registers ``(spark_fn, oracle_sql_or_None)`` pairs into
REGISTRY via ``register``. ``__spark_entry__.py`` exposes them as
``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(key: str, sql: str | None):
    def deco(fn):
        REGISTRY[key] = (fn, sql)
        return fn

    return deco


# Canonical driver-facing order: the correctness gate records at most ~50
# keys in registry order, so the flagship/engine/§2.9 keys lead and the
# generic relational shapes follow. The registry is consolidated to exactly
# 50 keys (SURVEY.md §2 key map documents which ops share a key).
KEY_ORDER = [
    # flagship + engine path
    "bm25_exhaustive",
    "blockmax_wand",
    "block_encode",
    "external_merge",
    "salted_repartition_sort",
    "checkpoint_resume",
    "streaming_incremental",
    # §2.9 tesserae family
    "phrase_match",
    "proximity_match",
    "tesserae_pair_score",
    "math_scores",
    # corpus / analyzer chain
    "scan_documents",
    "lang_filter_pushdown",
    "asof_latest_crawl",
    "html_extract",
    "hash_ids",
    "tokenize",
    "stem",
    "stopword_filter",
    "collect_positions",
    "doc_freq_agg",
    "approx_df_agg",
    # LLM-pipeline ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "ngram_jaccard",
    "ann_bruteforce_topk",
    "ann_lsh_bucketed",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "media_feature_extract",
    "media_frame_sample",
    # relational skeleton
    "project_prune",
    "predicate_and_or",
    "min_ncharsfilter",
    "join_broadcast_dim",
    "join_sortmerge_fact",
    "semi_join_queryterms",
    "anti_join_stopwords",
    "grouping_sets_stats",
    "topk_per_term",
    "rank_results",
    "running_cf",
    "global_sort_limit",
    "union_shards",
    "intersect_doc_sets",
    "len_chars",
    "map_props_json",
    "array_ops",
]


def load_all() -> dict:
    """Import every operator module (side effect: registry fills), returned
    in the canonical driver-facing order."""
    from tesserae_ng_spark.operators import (  # noqa: F401
        corpus_ops,
        dedup,
        engine_ops,
        multimodal,
        relational,
        similarity,
        text,
    )

    # the driver records the FIRST 50 keys only — drift between the
    # registry and KEY_ORDER must fail loudly, not slide past the cap
    # (ADVICE r2): a typo'd @register or an unlisted new key would
    # otherwise silently fall outside the recorded contract.
    if set(REGISTRY) != set(KEY_ORDER) or len(KEY_ORDER) != 50:
        extra = sorted(set(REGISTRY) - set(KEY_ORDER))
        missing = sorted(set(KEY_ORDER) - set(REGISTRY))
        raise RuntimeError(
            f"driver key contract drift: {len(KEY_ORDER)} ordered / "
            f"{len(REGISTRY)} registered; unlisted={extra} unregistered={missing}"
        )
    return {k: REGISTRY[k] for k in KEY_ORDER}
