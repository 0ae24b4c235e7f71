"""Query-plan inspection: the engine's guardrails for 100 TB discipline.

The reference exposes plans via QueryExecution (sql/core/.../execution/
QueryExecution.scala:43); here the physical plan string is parsed for the
properties that decide whether a query survives scale-up:

- filters/column pruning reached the parquet scan (PushedFilters, ReadSchema)
- small-side joins are broadcast (BroadcastHashJoin), not shuffled
- top-k plans as TakeOrderedAndProject (bounded heaps), not global Sort
- no CartesianProduct where an equi-join was intended
- whole-stage codegen spans cover the hot path

tests/test_plans.py asserts these on the engine's headline queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_operator(df: DataFrame, op: str) -> bool:
    return op in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates the parquet scan accepted (empty = nothing pushed)."""
    out: list[str] = []
    for line in physical_plan(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            body = s.split(":", 1)[1].strip()
            if body.startswith("[") and body.endswith("]") and body != "[]":
                out.extend(p.strip() for p in body[1:-1].split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the file scan actually reads (column pruning check)."""
    cols: list[str] = []
    for line in physical_plan(df).splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            body = s.split(":", 1)[1].strip()
            # struct<a:bigint,b:string,...>
            if body.startswith("struct<"):
                inner = body[len("struct<"):].rstrip(">")
                cols.extend(f.split(":")[0] for f in inner.split(",") if f)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (AQE may collapse at runtime).
    Counts only the formatted-mode detail entries "(N) Exchange" so the tree
    header and detail section aren't double-counted."""
    import re

    return sum(
        1
        for line in physical_plan(df).splitlines()
        if re.match(r"^\(\d+\) Exchange$", line.strip())
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans (simple-mode `*(N)` markers)."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df, "simple"))))


def uses_broadcast_join(df: DataFrame) -> bool:
    return has_operator(df, "BroadcastHashJoin") or has_operator(
        df, "BroadcastNestedLoopJoin"
    )


def uses_top_k(df: DataFrame) -> bool:
    return has_operator(df, "TakeOrderedAndProject")
