"""Physical-plan audits: make Catalyst's work visible and assertable.

"`.explain("formatted")` the plan and iterate until it's the plan you'd
want" — these helpers let tests PIN the wanted plan properties so a
regression (lost pushdown, surprise shuffle, broadcast that stopped
broadcasting) fails CI instead of silently costing 10× at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str, absent: tuple = ()) -> str:
    plan = explain_str(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in plan:\n{plan}"
    for n in absent:
        assert n not in plan, f"did NOT expect {n!r} in plan:\n{plan}"
    return plan


def count_in_plan(df: DataFrame, needle: str) -> int:
    return explain_str(df).count(needle)
