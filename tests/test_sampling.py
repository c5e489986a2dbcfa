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


def test_mix_sources_copy_counts(spark):
    from pyspark_datacol_diff_spark.operators.sampling import (
        hash_bucket,
        mix_sources,
    )

    d = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
        + [(1000, "unlisted")],
        ["k", "src"],
    )
    out = mix_sources(d, "k", "src", {"a": 2.0, "b": 0.5}).collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["k"], []).append(r["copy_no"])
    # weight 2.0: exactly two copies each, numbered 1,2
    for i in range(0, 200, 2):
        assert sorted(per_key[i]) == [1, 2]
    # weight 0.5: zero or one copy, decided by the hash bucket
    buckets = {
        r["k"]: r["bk"]
        for r in d.select("k", hash_bucket("k").alias("bk")).collect()
    }
    for i in range(1, 200, 2):
        expect = [1] if buckets[i] < 5000 else []
        assert sorted(per_key.get(i, [])) == expect
    # unlisted stratum dropped entirely
    assert 1000 not in per_key


def test_mix_sources_zero_shuffle_and_validation(spark):
    from pyspark_datacol_diff_spark import plans as P
    from pyspark_datacol_diff_spark.operators.sampling import mix_sources

    d = spark.createDataFrame([(1, "a")], ["k", "src"])
    P.assert_max_shuffles(mix_sources(d, "k", "src", {"a": 1.5}), 0)
    with pytest.raises(ValueError):
        mix_sources(d, "k", "src", {})
    with pytest.raises(ValueError):
        mix_sources(d, "k", "src", {"a": -0.1})


def test_cap_per_group_deterministic_survivors(spark):
    from pyspark.sql import functions as F

    from pyspark_datacol_diff_spark.operators.sampling import cap_per_group

    rows = [(s, i) for s in ("a", "b") for i in range(10)] + [("c", 0)]
    df = spark.createDataFrame(rows, "src string, id long")
    got = cap_per_group(df, "src", 3, order_by=[F.col("id")])
    out = {(r["src"], r["id"]) for r in got.collect()}
    assert out == {("a", 0), ("a", 1), ("a", 2),
                   ("b", 0), ("b", 1), ("b", 2), ("c", 0)}
    # repartitioned input -> identical survivors (determinism)
    got2 = cap_per_group(df.repartition(7), "src", 3, order_by=[F.col("id")])
    assert {(r["src"], r["id"]) for r in got2.collect()} == out


def test_cap_per_group_validates_args(spark):
    import pytest
    from pyspark.sql import functions as F

    from pyspark_datacol_diff_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([("a", 1)], "src string, id long")
    with pytest.raises(ValueError):
        cap_per_group(df, "src", 0, order_by=[F.col("id")])
    with pytest.raises(ValueError):
        cap_per_group(df, "src", 5, order_by=None)


def test_weighted_sample_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    from pyspark_datacol_diff_spark.operators.sampling import weighted_sample

    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        # thirds: weight 0.0 / 0.5 / 1.0
        ((F.col("id") % 3) / F.lit(2.0)).alias("w"),
    )
    kept = weighted_sample(df, F.col("id"), "w")
    counts = {
        r["w"]: r["cnt"]
        for r in kept.groupBy("w").agg(F.count("*").alias("cnt")).collect()
    }
    n_w1 = sum(1 for i in range(n) if i % 3 == 2)
    n_w05 = sum(1 for i in range(n) if i % 3 == 1)
    assert 0.0 not in counts                     # weight 0 never keeps
    assert counts[1.0] == n_w1                   # weight 1 keeps all
    assert 0.45 < counts[0.5] / n_w05 < 0.55     # weight .5 keeps ~half
    # determinism: same verdicts under different partitioning
    again = weighted_sample(df.repartition(13), F.col("id"), "w")
    assert {r["id"] for r in again.collect()} == {r["id"] for r in kept.collect()}
