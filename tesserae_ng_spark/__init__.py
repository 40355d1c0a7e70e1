"""tesserae_ng_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the query/data-processing capabilities of
``eberle1080/tesserae-ng`` (Solr/Lucene indexing + Tesserae phrase/proximity
comparison — see SURVEY.md) as an idiomatic PySpark engine:

- vectorized Arrow/pandas UDF analyzer chain (HTML→text, tokenize, stem)
- term-partitioned, docID-sorted, delta+varint block-compressed postings
  with per-block max-score metadata (Lucene block-postings analog)
- salted repartition-and-sort to defeat head-term (Zipf) skew
- checkpoint-resumable builds via per-partition lineage manifests
- query-time block-max WAND top-k with a bounded min-heap
- phrase / proximity / Tesserae-pair scoring via positional postings

Everything relational is declared through the DataFrame API so Catalyst /
AQE handle pushdown, pruning, join strategy and skew; the custom physics
(codec, WAND) live inside Arrow UDF bodies and pure-Python query executors.
"""

__version__ = "0.1.0"

# Allocator tuning for lazily-backed-VM first-touch pathology (see
# memtune.py; TNG_NO_MALLOC_TUNE=1 to disable). Runs once per process —
# Spark executor python workers import this package when unpickling UDFs,
# so every worker gets it too.
from tesserae_ng_spark.memtune import tune_allocator as _tune_allocator

_tune_allocator()
