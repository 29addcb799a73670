"""Physical-plan introspection helpers.

Used by tests to assert the plans are the ones we want at scale:
filters pushed to the parquet scan, dimension joins broadcast, sorts
compiled to top-k. Grading "would this survive 100x data" starts with
reading the plan, so the asserts live next to the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """String form of the (possibly adaptive) physical plan."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan (PushedFilters)."""
    plan = formatted_plan(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(
            f"expected pushed filter containing {fragment!r}; plan:\n{plan}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan:
        raise AssertionError(f"expected BroadcastHashJoin; plan:\n{plan}")


def assert_no_shuffle(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "Exchange" in plan:
        raise AssertionError(f"expected shuffle-free plan; plan:\n{plan}")
