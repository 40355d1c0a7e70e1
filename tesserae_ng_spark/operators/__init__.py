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


def load_all() -> dict:
    """Import every operator module (side effect: registry fills)."""
    from tesserae_ng_spark.operators import (  # noqa: F401
        corpus_ops,
        dedup,
        engine_ops,
        multimodal,
        relational,
        similarity,
        text,
    )

    return REGISTRY
