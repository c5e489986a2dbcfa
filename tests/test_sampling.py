"""Deterministic sampling/split tests: stability is the whole contract."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators import sampling as SAMP


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "key")


def test_hash_bucket_matches_hand_md5(spark):
    df = spark.createDataFrame([(42,), (7,)], ["key"])
    got = {
        r["key"]: r["b"]
        for r in df.select(
            "key", SAMP.hash_bucket("key").alias("b")
        ).collect()
    }
    for k in (42, 7):
        want = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 10_000
        assert got[k] == want


def test_hash_split_weights_and_stability(spark, ids):
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = SAMP.hash_split(ids, "key", splits)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert 1500 < counts["train"] < 1700  # ~80% of 2000
    assert 120 < counts["val"] < 280
    assert 120 < counts["test"] < 280
    # membership is identical under a different partitioning
    again = SAMP.hash_split(ids.repartition(13), "key", splits)
    assert (
        out.select("key", "split")
        .exceptAll(again.select("key", "split"))
        .count()
        == 0
    )


def test_hash_split_rejects_bad_weights(spark, ids):
    with pytest.raises(ValueError):
        SAMP.hash_split(ids, "key", [("a", 0.5), ("b", 0.2)])


def test_stratified_sample_per_stratum_fractions(spark):
    df = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "key")
        .withColumn(
            "cls",
            F.when(F.col("key") % 3 == 0, "common").otherwise("rare"),
        )
    )
    out = SAMP.stratified_sample(
        df, "key", "cls", {"common": 0.1, "rare": 1.0}
    )
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts["rare"] == 2000  # fraction 1.0 keeps everything
    assert 50 < counts["common"] < 150  # ~10% of 1000


def test_stratified_sample_drops_unlisted_strata(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["key", "cls"])
    out = SAMP.stratified_sample(df, "key", "cls", {"a": 1.0})
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["cls"] == "a"


def test_split_is_pure_projection(spark, ids):
    """Scale contract: labeling adds no shuffle — the plan has zero
    exchanges."""
    out = SAMP.hash_split(ids, "key", [("train", 0.9), ("test", 0.1)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
