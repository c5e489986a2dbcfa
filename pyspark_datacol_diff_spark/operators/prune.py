"""Shuffle pruning: Bloom-filter pre-joins (runtime row filters).

Spark's own runtime filtering (``spark.sql.optimizer.runtime.bloomFilter
.enabled``) injects a Bloom filter from one join side into the other's
scan — but only when the creation side is already aggregated/filtered
below thresholds the optimizer controls, and the ``bloom_filter_agg``
expression is not exposed in the public function registry (verified on
pyspark 4.1: ``UNRESOLVED_ROUTINE``). This module makes the pattern an
explicit operator for the case that matters at 100 TB: a semi join
whose BUILD side is too large to broadcast, so the probe side would
otherwise shuffle in full.

``bloom_semi_join(big, small, on)`` builds a compact bitset over the
small side's keys (one aggregate pass), ships it to every probe task as
a literal array (kilobytes, no broadcast exchange), drops non-matching
big-side rows MAP-SIDE — before the semi-join shuffle — and then runs
the exact semi join on the survivors to remove Bloom false positives.
Result is bit-identical to ``big.join(small, on, "left_semi")``; the
Bloom only changes how many rows reach the shuffle. With a 1% match
rate and the default 2^20-bit / 5-hash filter (<1% false positives),
the probe-side shuffle shrinks ~50x.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEED = 0x5CA1AB1E


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k independent bit positions for one key: ``xxhash64`` seeded by
    mixing in a distinct literal per hash (the tuple-hash trick — the
    public xxhash64 has no seed parameter)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEED + i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Semi join ``big`` against ``small`` on ``on``, pre-pruning the
    big side with a Bloom filter of the small side's keys.

    Exact: false positives are removed by the trailing semi join, so
    the output equals ``big.join(small.select(on), on, "left_semi")``
    row for row. Multi-column keys hash as a tuple.

    Scale shape: one aggregate pass over the small side builds the
    bitset as at most ``num_bits/64`` ``(word, bits)`` rows (the only
    ``collect`` — bounded by the parameter, 16 K rows / 128 KiB at the
    default, independent of data size). The probe-side membership test
    is a pure-Column expression against an array literal: no join, no
    exchange, evaluated inside the scan stage — rows failing it never
    enter the semi-join shuffle. Choose ``num_bits`` ~ 10x the small
    side's distinct keys for a ~1% false-positive rate; the filter
    only affects performance, never correctness.
    """
    if not on:
        raise ValueError("on must be a non-empty list of key columns")
    if num_bits < 64 or num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two >= 64, got {num_bits}")
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in [1, 16], got {num_hashes}")
    # xxhash64 is TYPE-sensitive: int 3 and bigint 3 hash differently,
    # so mismatched key dtypes would set build-side bits the probe side
    # never reads and every true match would be pruned. The plain semi
    # join silently coerces; this operator refuses instead — cast one
    # side explicitly.
    big_types = dict(big.dtypes)
    small_types = dict(small.dtypes)
    mismatched = [
        (c, big_types.get(c), small_types.get(c))
        for c in on
        if big_types.get(c) != small_types.get(c)
    ]
    if mismatched:
        raise ValueError(
            "bloom_semi_join key dtypes must match exactly on both sides "
            f"(xxhash64 is type-sensitive): {mismatched}; cast the keys "
            "to a common type first"
        )

    def key(df: DataFrame) -> Column:
        # single expression over the tuple; NULL keys never match a
        # semi join, so rows with any NULL key are dropped up front
        return F.struct(*[df[c] for c in on])

    small_keys = small.dropna(subset=list(on)).select(
        F.explode(
            F.array(*_positions(key(small), num_bits, num_hashes))
        ).alias("__pos")
    )
    words = (
        small_keys.select(
            F.shiftright("__pos", 6).cast("int").alias("__w"),
            F.expr("shiftleft(1L, CAST(__pos & 63 AS INT))").alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
        .collect()
    )
    bitset = [0] * (num_bits >> 6)
    for r in words:
        bitset[r["__w"]] = r["__bits"]
    # ship the bitset as ONE string and let ConstantFolding turn the
    # from_json into an array literal at plan time: a plain
    # F.lit(list) builds num_bits/64 py4j Literal nodes (~0.9 s at
    # 2^17 bits, growing with the parameter); this is O(1) calls
    blit = F.from_json(
        F.lit("[" + ",".join(map(str, bitset)) + "]"), "array<bigint>"
    )

    def contains() -> Column:
        tests = [
            F.expr(
                f"(shiftright(element_at(__dcd_bloom, "
                f"CAST(shiftright(__dcd_p{i}, 6) AS INT) + 1), "
                f"CAST(__dcd_p{i} & 63 AS INT)) & 1L) = 1L"
            )
            for i in range(num_hashes)
        ]
        return reduce(lambda a, b: a & b, tests)

    probe = big.withColumn("__dcd_bloom", blit)
    for i, p in enumerate(_positions(key(big), num_bits, num_hashes)):
        probe = probe.withColumn(f"__dcd_p{i}", p)
    pruned = (
        probe.filter(contains())
        .drop("__dcd_bloom", *[f"__dcd_p{i}" for i in range(num_hashes)])
    )
    return pruned.join(small.select(*on).dropna(), on, "left_semi")
