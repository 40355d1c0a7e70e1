from tesserae_ng_spark.sources.corpus import (
    load_corpus,
    synthesize_corpus,
    corpus_oracle_cte,
    load_table,
)

__all__ = ["load_corpus", "synthesize_corpus", "corpus_oracle_cte", "load_table"]
