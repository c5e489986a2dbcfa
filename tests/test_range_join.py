"""Bounded range join: hand cases, randomized cross-check vs the naive
cross-join, and the no-nested-loop plan contract."""

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators.range_join import bounded_range_join


def test_hand_case_inclusive_bounds(spark):
    left = spark.createDataFrame([("u", 100.0, "l1")], ["user", "t", "lid"])
    right = spark.createDataFrame(
        [
            ("u", 90.0, "in_lo"),   # exactly at lower bound (100-10)
            ("u", 100.0, "in_hi"),  # exactly at upper bound
            ("u", 89.9, "below"),
            ("u", 100.1, "above"),
            ("v", 95.0, "wrong_key"),
        ],
        ["user", "t", "rid"],
    )
    out = bounded_range_join(
        left, right, ["user"], "t", "t", ["rid"], min_delta=-10, max_delta=0
    )
    got = sorted(r["rid_r"] for r in out.collect())
    assert got == ["in_hi", "in_lo"]


def test_randomized_matches_naive_cross_join(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "user": rng.integers(0, 4, 150),
            "t": rng.uniform(0, 1000, 150),
            "lid": np.arange(150),
        }
    )
    right = pd.DataFrame(
        {
            "user": rng.integers(0, 4, 150),
            "t": rng.uniform(0, 1000, 150),
            "rid": np.arange(150),
        }
    )
    lo, hi = -37.5, 12.25
    want = set()
    for l in left.itertuples():
        for r in right.itertuples():
            if l.user == r.user and lo <= r.t - l.t <= hi:
                want.add((l.lid, r.rid))

    out = bounded_range_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        ["user"],
        "t",
        "t",
        ["rid"],
        min_delta=lo,
        max_delta=hi,
    )
    got = {(r["lid"], r["rid_r"]) for r in out.collect()}
    # float->micros rounding can flip membership only for pairs within
    # 1e-6 s of a bound; the generator makes that measure-zero
    assert got == want


def test_degenerate_window_raises(spark):
    df = spark.createDataFrame([("u", 1.0)], ["user", "t"])
    with pytest.raises(ValueError):
        bounded_range_join(
            df, df, ["user"], "t", "t", [], min_delta=5, max_delta=5
        )


def test_plan_has_no_nested_loop(spark):
    left = spark.createDataFrame([("u", 100.0)], ["user", "t"])
    right = spark.createDataFrame([("u", 95.0, 7)], ["user", "t", "rid"])
    out = bounded_range_join(
        left, right, ["user"], "t", "t", ["rid"], min_delta=-10, max_delta=0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
