"""bloom_semi_join: exactness vs the plain semi join, null keys,
false-positive pruning, validation."""

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators.prune import bloom_semi_join


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_matches_plain_semi_join(spark):
    big = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(0, 10).select((F.col("id") * 7).alias("k"))
    got = bloom_semi_join(big, small, ["k"])
    exp = big.join(small, ["k"], "left_semi")
    assert _same(got, exp)


def test_multi_column_key_and_null_keys(spark):
    big = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 11), (2, "a", 12), (None, "a", 13), (2, None, 14)],
        "k1 int, k2 string, v int",
    )
    small = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "a")], "k1 int, k2 string"
    )
    got = bloom_semi_join(big, small, ["k1", "k2"])
    exp = big.join(small, ["k1", "k2"], "left_semi")
    # null-key rows match in neither (semi join equality is null-rejecting)
    assert _same(got, exp)
    assert got.count() == 1


def test_tiny_filter_forces_false_positives_still_exact(spark):
    # 64 bits for 50 keys: nearly every probe passes the Bloom test,
    # so the trailing semi join is doing the correctness work
    big = spark.range(0, 500).select((F.col("id") % 100).alias("k"))
    small = spark.range(0, 50).select((F.col("id") * 2).alias("k"))
    got = bloom_semi_join(big, small, ["k"], num_bits=64, num_hashes=1)
    exp = big.join(small, ["k"], "left_semi")
    assert _same(got, exp)


def test_empty_small_side(spark):
    big = spark.range(0, 10).select(F.col("id").alias("k"))
    small = spark.range(0, 0).select(F.col("id").alias("k"))
    assert bloom_semi_join(big, small, ["k"]).count() == 0


def test_validation(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="non-empty"):
        bloom_semi_join(df, df, [])
    with pytest.raises(ValueError, match="power of two"):
        bloom_semi_join(df, df, ["k"], num_bits=100)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_semi_join(df, df, ["k"], num_hashes=0)


def test_bloom_prunes_before_shuffle(spark):
    """The membership test must sit below the semi-join exchange: the
    probe side's filter stage contains the bitset probe, so pruned rows
    never enter the shuffle."""
    big = spark.range(0, 1000).select((F.col("id") % 50).alias("k"))
    small = spark.range(0, 3).select(F.col("id").alias("k"))
    plan = (
        bloom_semi_join(big, small, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the probe filter references the literal bitset via element_at,
    # and the build-side aggregate is gone (collected at plan time)
    assert "element_at" in plan


def test_rejects_mismatched_key_dtypes(spark):
    """xxhash64 is type-sensitive: int 3 and bigint 3 set different
    bits, so a silent coercion would prune every true match. The
    operator must refuse instead."""
    big = spark.range(0, 10).select(F.col("id").alias("k"))  # bigint
    small = spark.createDataFrame([(3,), (7,)], "k int")
    with pytest.raises(ValueError, match="type-sensitive"):
        bloom_semi_join(big, small, ["k"])
    # cast to a common type and it matches the plain semi join
    got = bloom_semi_join(big, small.select(F.col("k").cast("long")), ["k"])
    assert sorted(r["k"] for r in got.collect()) == [3, 7]


# --- property: bloom prune is invisible — equals plain semi join ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    big_keys=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    ),
    small_keys=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=0, max_size=20
    ),
    num_bits=st.sampled_from([64, 256, 4096]),
    num_hashes=st.integers(min_value=1, max_value=4),
)
def test_property_equals_plain_semi_join(
    spark, big_keys, small_keys, num_bits, num_hashes
):
    big = spark.createDataFrame([(k,) for k in big_keys], "k long")
    small = spark.createDataFrame([], "k long") if not small_keys else (
        spark.createDataFrame([(k,) for k in small_keys], "k long")
    )
    got = bloom_semi_join(
        big, small, ["k"], num_bits=num_bits, num_hashes=num_hashes
    )
    exp = big.join(small, ["k"], "left_semi")
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in exp.collect()
    )
