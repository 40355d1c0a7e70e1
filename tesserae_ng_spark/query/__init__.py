from tesserae_ng_spark.query.bm25_oracle import bm25_topk_oracle, idf_expr, tf_norm_expr

__all__ = ["bm25_topk_oracle", "idf_expr", "tf_norm_expr"]
