"""Bounded range (interval) join — the scale shape for time-window joins.

Reference scope note: the reference library's only join is the diff's
full-outer equi-join (`/root/reference/find_datacol_diff.py:96`); this is
a north-star extension for event-correlation workloads.

A condition like ``r.ts BETWEEN l.ts + min_delta AND l.ts + max_delta``
has no equi-key, so Spark plans it as BroadcastNestedLoopJoin — O(|L|x|R|)
per key group and a driver-killer at scale. With a BOUNDED window the
classic fix applies: bucket time into bins at least as wide as the
window, join on (keys, bin) — each left row probes at most two bins —
then apply the exact range predicate. Cost: one shuffle per side on
(keys, bin), pair blow-up limited to rows actually within two bins of
each other. This is the same strategy behind "bin-bucketed" range joins
in warehouse engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"
_LTS = "__rj_lts"
_RTS = "__rj_rts"

_US = 1_000_000


def _to_micros(c: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.unix_micros(c)
    return (c.cast("double") * _US).cast("long")


def bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    *,
    min_delta: float,
    max_delta: float,
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join pairs where ``right_ts - left_ts`` lies in
    ``[min_delta, max_delta]`` seconds (inclusive) and the ``on`` keys
    match. Timestamp columns may be TIMESTAMP or numeric seconds.

    ``right_cols`` are carried from the right side with ``suffix``; all
    left columns pass through. Requires ``max_delta > min_delta`` (a
    degenerate zero-width window is an equi-join on the timestamp —
    express it directly).
    """
    if not max_delta > min_delta:
        raise ValueError(
            f"max_delta must exceed min_delta, got [{min_delta}, {max_delta}]"
        )
    lo_us = int(round(min_delta * _US))
    hi_us = int(round(max_delta * _US))
    bin_us = hi_us - lo_us

    ldt = dict(left.dtypes)[left_ts]
    rdt = dict(right.dtypes)[right_ts]

    l_us = _to_micros(F.col(left_ts), ldt)
    r_us = _to_micros(F.col(right_ts), rdt)

    # Each left row's admissible right window spans exactly bin_us, so it
    # overlaps at most two bins of that width.
    l = left.withColumn(_LTS, l_us).withColumn(
        _BIN,
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col(_LTS) + lo_us) / F.lit(bin_us)),
                    F.floor((F.col(_LTS) + hi_us) / F.lit(bin_us)),
                )
            )
        ),
    )
    r = right.select(
        *on,
        r_us.alias(_RTS),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    ).withColumn(_BIN, F.floor(F.col(_RTS) / F.lit(bin_us)))

    joined = l.join(r, on=on + [_BIN], how="inner").filter(
        (F.col(_RTS) >= F.col(_LTS) + lo_us)
        & (F.col(_RTS) <= F.col(_LTS) + hi_us)
    )
    return joined.select(*left.columns, *[c + suffix for c in right_cols])
