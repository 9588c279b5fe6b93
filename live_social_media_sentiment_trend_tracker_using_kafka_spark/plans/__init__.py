"""Plan-inspection helpers: assert the physical plan is the one we designed.

Used by tests to enforce scale-readiness properties (broadcast joins where
intended, pushed filters, no Python in pure-SQL paths) instead of hoping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # type: ignore[attr-defined]


def plan_text(df: DataFrame) -> str:
    """Formatted physical plan as a string (without printing)."""
    try:
        return formatted_plan(df)
    except Exception:
        return df._jdf.queryExecution().explainString("formatted")  # type: ignore[attr-defined]


def assert_broadcast_join(df: DataFrame, expected: int = 1) -> None:
    plan = plan_text(df)
    found = plan.count("BroadcastHashJoin")
    assert found >= expected, f"expected >= {expected} BroadcastHashJoin, plan:\n{plan}"


def assert_pushed_filters(df: DataFrame) -> None:
    plan = plan_text(df)
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan.split("PushedFilters: [", 1)[0], (
        f"no pushed filters in plan:\n{plan}"
    )


def assert_no_python_udf(df: DataFrame) -> None:
    plan = plan_text(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, f"unexpected Python boundary ({marker}) in plan:\n{plan}"
