"""Salted-join equivalence: same rows as the plain join, hot key spread."""

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators.skew import salted_join


@pytest.fixture()
def skewed_pair(spark):
    # 10k rows, 90% on key 0 (the hot key), the rest uniform over 1..99
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(99)) + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("m"), F.col("id")).alias("meta")
    )
    return big, small


def test_salted_inner_matches_plain(spark, skewed_pair):
    big, small = skewed_pair
    plain = big.join(small, ["k"]).select("k", "payload", "meta")
    salted = salted_join(big, small, ["k"], num_salts=8).select(
        "k", "payload", "meta"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_keeps_unmatched_once(spark, skewed_pair):
    big, small = skewed_pair
    small_missing = small.filter(F.col("k") != 0)  # drop the hot key's match
    out = salted_join(big, small_missing, ["k"], num_salts=4, how="left")
    hot = out.filter(F.col("k") == 0)
    assert hot.count() == big.filter(F.col("k") == 0).count()
    assert hot.filter(F.col("meta").isNotNull()).count() == 0


def test_salt_spreads_hot_key(spark, skewed_pair):
    big, _ = skewed_pair
    salts = (
        big.withColumn(
            "s", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
        )
        .filter(F.col("k") == 0)
        .groupBy("s")
        .count()
    )
    rows = salts.collect()
    assert len(rows) == 8  # hot key present in every salt bucket
    assert max(r["count"] for r in rows) < 0.9 * 9_000  # actually spread


def test_outer_rejected():
    with pytest.raises(ValueError):
        salted_join(None, None, ["k"], how="full_outer")
