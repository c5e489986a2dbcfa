"""Plan-inspection helpers: assertions over the executed physical plan
used by tests to pin the properties that matter at 100 TB — pushdown,
broadcast vs shuffle joins, shuffle counts, column pruning.

Correctness tests prove an operator computes the right answer; these
prove it computes it with the PLAN we designed (a correct-but-
full-scan regression fails CI here, not in production).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The final executed physical plan as text (post-AQE re-plan is not
    included — this is the initial physical plan, which is what pins
    strategy choices like join type and pushdown)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_op(df: DataFrame, op: str) -> int:
    return len(re.findall(re.escape(op), physical_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans."""
    return [
        m.strip()
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))
        if m.strip()
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — the column-pruning witness."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", physical_plan(df))


def assert_join_strategy(
    df: DataFrame,
    *,
    sort_merge: int = 0,
    broadcast_hash: int = 0,
    allow_nested_loop: bool = False,
) -> None:
    plan = physical_plan(df)
    smj = plan.count("SortMergeJoin")
    bhj = plan.count("BroadcastHashJoin")
    assert smj == sort_merge, f"expected {sort_merge} SortMergeJoin, got {smj}"
    assert bhj == broadcast_hash, (
        f"expected {broadcast_hash} BroadcastHashJoin, got {bhj}"
    )
    if not allow_nested_loop:
        assert "CartesianProduct" not in plan, "unexpected CartesianProduct"


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = shuffle_count(df)
    assert got <= n, f"expected <= {n} shuffles, got {got}"


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    pf = pushed_filters(df)
    assert any(fragment in p for p in pf), (
        f"no pushed filter containing {fragment!r}; pushed: {pf}"
    )


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """The named column must appear in NO scan's ReadSchema (and, for
    computed columns, nowhere in the plan)."""
    for rs in read_schemas(df):
        assert column not in rs, f"{column} not pruned from scan: {rs}"
