"""Scalar function surface: the analyzer chain (HTML→text → tokenize → stem).

These mirror the *role* of tesserae-ng's Solr analyzer chain
(tokenizer → lowercase → lemma/stem filter; SURVEY.md §2.8) but carry the
web-text payload pinned by BASELINE.json. Everything is exposed twice:

- as pure deterministic Python functions (query-time analysis runs
  in-process, no Spark needed for a single query), and
- as Arrow-vectorized pandas UDFs (index-time bulk path — no per-row
  Python rows cross the JVM boundary; batches move via Arrow).
"""

from tesserae_ng_spark.functions.html import extract_text, html_extract_udf
from tesserae_ng_spark.functions.analysis import (
    analyze,
    analyze_query,
    tokenize,
    analyze_udf,
    tokenize_udf,
)
from tesserae_ng_spark.functions.stemmer import porter_stem

__all__ = [
    "extract_text",
    "html_extract_udf",
    "analyze",
    "analyze_query",
    "tokenize",
    "analyze_udf",
    "tokenize_udf",
    "porter_stem",
]
