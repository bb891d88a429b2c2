"""Plan introspection helpers — the engine's guard rails for scale.

Correctness tests say "the rows are right"; these helpers let tests say
"the PLAN is right": filters pushed into the parquet scan, dims broadcast,
aggregates split partial/final, top-k planned without a global sort. A plan
regression here is a 100 TB incident that a row-level test can't see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what .explain prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    """Which of the given substrings appear in the physical plan."""
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}
