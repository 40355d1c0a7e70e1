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

# Allocator tuning for lazily-backed-VM first-touch pathology (memtune.py)
# is OPT-IN: this call is a no-op unless TNG_MALLOC_TUNE=1 is set in the
# environment (session.get_spark exports it so Spark executor python
# workers — which import this package when unpickling UDFs — are tuned),
# so merely importing the library leaves process-global allocator state
# alone (ADVICE r2). Engine entry points call tune_allocator(force=True).
from tesserae_ng_spark.memtune import tune_allocator as _tune_allocator

_tune_allocator()
