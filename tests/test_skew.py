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


def test_two_stage_agg_matches_plain_groupby(spark):
    import pyspark.sql.functions as F
    from pyspark_datacol_diff_spark.operators.skew import two_stage_agg

    df = spark.range(5000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    got = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in two_stage_agg(
            df,
            ["k"],
            {"n": ("v", "count"), "total": ("v", "sum"),
             "lo": ("v", "min"), "hi": ("v", "max")},
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_two_stage_agg_rejects_nondecomposable(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pyspark_datacol_diff_spark.operators.skew import two_stage_agg

    df = spark.range(10).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError):
        two_stage_agg(df, ["k"], {"d": ("k", "count_distinct")})


def test_two_stage_agg_salts_stage_one(spark):
    import re

    from pyspark_datacol_diff_spark.operators.skew import two_stage_agg

    df = spark.range(100).selectExpr("0 AS k", "id AS v")
    plan = (
        two_stage_agg(df, ["k"], {"n": ("v", "count")})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stage-1 exchange must partition on (k, salt), not k alone
    assert re.search(r"hashpartitioning\([^)]*__dcd_salt", plan), plan
