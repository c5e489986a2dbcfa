"""As-of (nearest-event) join — an operator Spark's join menu lacks.

Reference scope note: the reference library has no join other than the
full-outer diff join (`/root/reference/find_datacol_diff.py:96`); this is
a north-star extension for time-series / training-data pipelines.

The naive formulation — range join ``l.ts >= r.ts`` then ``groupBy max``
— explodes quadratically per key (every left row pairs with its whole
right-side history). This implementation is the scale shape instead:
tag both sides, union, ONE shuffle on the join keys, ONE sort per
partition, and a running ``last(ignorenulls)`` window carries each right
row forward to the left rows it serves. Cost is O((|L|+|R|) log) per
key with no pair blow-up, and the plan is a single Exchange + Sort —
exactly what a merge-based as-of join does in engines that have one
natively (DuckDB ASOF JOIN, pandas merge_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    *,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the nearest right row per ``on`` key:
    the latest ``right_ts <= left_ts`` (``direction='backward'``) or the
    earliest ``right_ts >= left_ts`` (``'forward'``). Ties at equal
    timestamps match (inclusive, like DuckDB ASOF). Left rows with no
    candidate keep nulls (left-join semantics).

    ``right_cols`` are the right-side columns to carry (emitted with
    ``suffix``; ``right_ts`` itself is a natural choice). All left
    columns pass through unchanged.

    Null timestamps: a right row with null ``right_ts`` is never a
    candidate (dropped before the union — otherwise default nulls-first
    ordering would sort it before everything and its values would leak
    into left rows with no real match); a left row with null
    ``left_ts`` matches nothing and keeps nulls (nulls-first ordering
    on both directions puts it before any right row).

    The right row is carried ATOMICALLY (one struct column, one
    ``last(ignorenulls)``): per-column carries would let a null field
    in the nearest right row be back-filled from an OLDER right row,
    emitting a combination of values no actual right row contains —
    pandas ``merge_asof`` / DuckDB ASOF carry whole rows, and so does
    this.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    carried = [c + suffix for c in right_cols]
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(
            *[F.col(c).alias(c + suffix) for c in right_cols]
        ).alias("__asof_row"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row.
    # Nulls first in BOTH directions: null-ts left rows see no carried
    # values (desc's default nulls-last would instead hand them the
    # entire history).
    if direction == "backward":
        w = Window.partitionBy(*on).orderBy(F.asc_nulls_first(_TS), F.asc(_SIDE))
    else:
        w = Window.partitionBy(*on).orderBy(F.desc_nulls_first(_TS), F.asc(_SIDE))
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = u.select(
        "*", F.last("__asof_row", ignorenulls=True).over(w).alias("__asof_m")
    )
    return (
        matched.filter(F.col(_SIDE) == 1)
        .select(
            *left.columns,
            *[F.col(f"__asof_m.{c}").alias(c) for c in carried],
        )
    )


def scd2_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list,
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
    include_validity: bool = False,
) -> DataFrame:
    """Enrich facts from a type-2 slowly-changing dimension: each fact
    row joins the dimension VERSION whose half-open validity interval
    ``[valid_from, valid_to)`` contains the fact's event time — the
    standard warehouse SCD2 lookup. ``on`` lists the business keys as
    strings (same name both sides) or ``(fact_col, dim_col)`` pairs.

    With contiguous, non-overlapping versions per key (the SCD2
    invariant — the caller's contract, as in every warehouse), each
    fact matches AT MOST one version; ``how="inner"`` drops facts
    outside all validity windows, ``how="left"`` keeps them with NULL
    attributes.

    Scale shape: ONE equi-join on the business keys with the validity
    predicate evaluated inside the join — per-key fan-out before the
    filter is bounded by that key's version count (SCD2 histories are
    shallow — single digits), so this is strictly a keyed shuffle
    join, never a range/nested-loop explosion. Version-heavy keys at
    100 TB would call for the bucketed range join instead
    (:func:`~.range_join.bounded_range_join`).
    """
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in on]
    dim_keys_early = {dk for _, dk in pairs}
    attr_names = {
        c
        for c in dim.columns
        if c not in dim_keys_early
        and (include_validity or c not in (valid_from, valid_to))
    }
    clash = attr_names & set(fact.columns)
    if clash:
        # a dim attribute named like a fact column would silently emit
        # duplicate output columns — rename one side first
        raise ValueError(
            f"dim attribute(s) {sorted(clash)} collide with fact columns"
        )
    f, d = fact.alias("__f"), dim.alias("__d")
    cond = (F.col(f"__f.{ts_col}") >= F.col(f"__d.{valid_from}")) & (
        F.col(f"__f.{ts_col}") < F.col(f"__d.{valid_to}")
    )
    for fk, dk in pairs:
        cond = (F.col(f"__f.{fk}") == F.col(f"__d.{dk}")) & cond
    dim_keys = {dk for _, dk in pairs}
    skip = dim_keys if include_validity else (
        dim_keys | {valid_from, valid_to}
    )
    attrs = [F.col(f"__d.{c}") for c in dim.columns if c not in skip]
    return f.join(d, cond, how).select("__f.*", *attrs)
