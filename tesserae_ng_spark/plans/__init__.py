from tesserae_ng_spark.plans.audit import explain_str, assert_in_plan

__all__ = ["explain_str", "assert_in_plan"]
