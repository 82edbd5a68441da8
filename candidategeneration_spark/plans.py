"""Physical-plan inspection: the optimizer evidence layer.

The reference hand-schedules its execution (fixed 4 threads, hand-rolled
buffers); this engine instead DECLARES plans and relies on Catalyst for
pushdown, pruning, broadcast selection and whole-stage codegen (SURVEY.md
§4). These helpers make that reliance testable: every headline pipeline has
a test asserting its physical plan actually contains the shapes we designed
for — a scan that reads all columns for a 2-column projection, or a big
join that should have broadcast but shuffled, fails CI rather than only
showing up as a 100 TB regression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain() text as a string (explain() only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def scan_read_schema(plan: str) -> list[str]:
    """Column names in every parquet scan's ReadSchema, flattened."""
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            for field in inner.split(","):
                if ":" in field:
                    cols.append(field.split(":")[0].strip())
    return cols

def assert_columns_pruned(df: DataFrame, allowed: set[str]) -> None:
    """Every parquet scan reads a subset of ``allowed`` columns."""
    plan = explain_str(df)
    read = set(scan_read_schema(plan))
    extra = read - allowed
    assert not extra, f"scan reads unpruned columns {sorted(extra)}:\n{plan}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Some scan's PushedFilters mentions ``fragment`` (e.g. a column name
    of a filter that must reach the parquet reader)."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), \
        f"no pushed filter mentions {fragment!r}:\n" + "\n".join(pushed)


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, \
        f"expected a broadcast join:\n{plan}"


def assert_no_shuffle_join_of(df: DataFrame, forbidden: str = "SortMergeJoin"
                              ) -> None:
    plan = explain_str(df, "simple")
    assert forbidden not in plan, f"plan contains {forbidden}:\n{plan}"


def assert_wholestage_codegen(df: DataFrame) -> None:
    # AQE reports no codegen subtrees until the adaptive plan finalizes,
    # so execute first and read the final physical plan; codegen stages
    # print as "*(<id>) Operator" (the * prefix = WholeStageCodegen)
    import re
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\*\(\d+\)", plan) or "WholeStageCodegen" in plan, \
        f"no codegen span:\n{plan[:2000]}"
