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
