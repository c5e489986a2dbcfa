"""histogram / histogram_quantiles: hand-computed bins, clamping,
quantile ranks, validation, map-side-combinable plan."""

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators.histogram import (
    histogram,
    histogram_quantiles,
)


def _hist_map(df):
    return {r["bin"]: (r["lo_edge"], r["n"]) for r in df.collect()}


def test_histogram_hand_computed(spark):
    df = spark.createDataFrame(
        [(x,) for x in [0, 5, 9, 10, 19, 20, 99]], "v long"
    )
    got = _hist_map(histogram(df, "v", lo=0, width=10, num_bins=5))
    # bins of width 10 from 0; 99 clamps into last bin (idx 4)
    assert got == {0: (0, 3), 1: (10, 2), 2: (20, 1), 4: (40, 1)}


def test_histogram_clamps_below_lo_and_drops_nulls(spark):
    df = spark.createDataFrame(
        [(-50,), (None,), (5,), (1000,)], "v long"
    )
    got = _hist_map(histogram(df, "v", lo=0, width=10, num_bins=3))
    assert got == {0: (0, 2), 2: (20, 1)}


def test_histogram_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="width"):
        histogram(df, "v", lo=0, width=0, num_bins=3)
    with pytest.raises(ValueError, match="num_bins"):
        histogram(df, "v", lo=0, width=1, num_bins=0)


def test_quantiles_hand_computed(spark):
    # 10 values in bin 0, 80 in bin 1, 10 in bin 2
    rows = [(0,)] * 10 + [(10,)] * 80 + [(20,)] * 10
    df = spark.createDataFrame(rows, "v long")
    h = histogram(df, "v", lo=0, width=10, num_bins=3)
    got = {
        r["q_permille"]: (r["bin"], r["lo_edge"])
        for r in histogram_quantiles(h, [100, 500, 950]).collect()
    }
    # rank(100) = 10 -> bin 0 exactly; rank(500) = 50 -> bin 1;
    # rank(950) = 95 -> bin 2
    assert got == {100: (0, 0), 500: (1, 10), 950: (2, 20)}


def test_quantile_boundary_exact_rank(spark):
    # cum*1000 >= q*total must treat an exact boundary as reached:
    # 4 values, q=500 -> rank 2 -> second value's bin
    df = spark.createDataFrame([(0,), (0,), (10,), (10,)], "v long")
    h = histogram(df, "v", lo=0, width=10, num_bins=2)
    got = {r["q_permille"]: r["bin"] for r in histogram_quantiles(h, [500]).collect()}
    assert got == {500: 0}


def test_quantiles_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    h = histogram(df, "v", lo=0, width=1, num_bins=1)
    with pytest.raises(ValueError, match="non-empty"):
        histogram_quantiles(h, [])
    with pytest.raises(ValueError, match="permille"):
        histogram_quantiles(h, [0])
    with pytest.raises(ValueError, match="permille"):
        histogram_quantiles(h, [1001])


def test_histogram_is_partial_aggregable(spark):
    """The plan must show a partial/final hash aggregate pair — the
    property that caps map output at num_bins rows per partition."""
    df = spark.range(0, 1000).select(F.col("id").alias("v"))
    plan = (
        histogram(df, "v", lo=0, width=100, num_bins=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2


def test_quantiles_plan_has_no_window(spark):
    """The quantile pass must not use a single-partition window — the
    histogram folds into one array row instead."""
    df = spark.range(0, 100).select(F.col("id").alias("v"))
    h = histogram(df, "v", lo=0, width=10, num_bins=10)
    plan = (
        histogram_quantiles(h, [500])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_grouped_histogram(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 15), ("a", 17), ("b", 5), ("b", None)],
        "g string, v long",
    )
    got = {
        (r["g"], r["bin"]): (r["lo_edge"], r["n"])
        for r in histogram(
            df, "v", lo=0, width=10, num_bins=3, keys=["g"]
        ).collect()
    }
    assert got == {("a", 0): (0, 1), ("a", 1): (10, 2), ("b", 0): (0, 1)}


def test_merge_histograms_equals_direct(spark):
    from pyspark_datacol_diff_spark.operators.histogram import merge_histograms

    df = spark.range(0, 300).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 97).alias("v")
    )
    batches = [
        df.filter((F.col("v") + F.col("g")) % 3 == i) for i in range(3)
    ]
    kw = dict(lo=0, width=10, num_bins=10, keys=["g"])
    merged = merge_histograms([histogram(b, "v", **kw) for b in batches], keys=["g"])
    direct = histogram(df, "v", **kw)
    a = {(r["g"], r["bin"]): (r["lo_edge"], r["n"]) for r in merged.collect()}
    b = {(r["g"], r["bin"]): (r["lo_edge"], r["n"]) for r in direct.collect()}
    assert a == b


def test_merge_histograms_validation(spark):
    import pytest

    from pyspark_datacol_diff_spark.operators.histogram import merge_histograms

    with pytest.raises(ValueError, match="at least one"):
        merge_histograms([])


# --- property: quantile = first bin reaching ceil(q/1000 * total) ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.integers(min_value=-20, max_value=120), min_size=1, max_size=50
    ),
    qs=st.lists(
        st.integers(min_value=1, max_value=1000),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
def test_property_quantiles_match_brute_force(spark, values, qs):
    import math

    df = spark.createDataFrame([(v,) for v in values], "v long")
    h = histogram(df, "v", lo=0, width=10, num_bins=10)
    got = {
        r["q_permille"]: r["bin"]
        for r in histogram_quantiles(h, qs).collect()
    }
    bins = sorted(min(max((v - 0) // 10, 0), 9) for v in values)
    total = len(bins)
    for q in qs:
        rank = math.ceil(q * total / 1000)
        assert got[q] == bins[rank - 1], (q, rank, bins)


def test_histogram_quantiles_by_per_group(spark):
    """Grouped quantiles: each group's ranks computed over ITS bins
    only — the semantics histogram_quantiles' guard protects."""
    import pytest

    from pyspark_datacol_diff_spark.operators.histogram import (
        histogram,
        histogram_quantiles_by,
    )

    rows = [("a", v) for v in (1, 1, 1, 9)] + [("b", v) for v in (9, 9, 9, 1)]
    df = spark.createDataFrame(rows, "src string, v long")
    h = histogram(df, "v", lo=0, width=2, num_bins=8, keys=["src"])
    got = {
        (r["src"], r["q_permille"]): (r["bin"], r["lo_edge"])
        for r in histogram_quantiles_by(h, ["src"], [500, 900]).collect()
    }
    # a: 3x value-1 (bin 0), 1x value-9 (bin 4): p50 -> bin 0, p90 -> bin 4
    assert got[("a", 500)] == (0, 0)
    assert got[("a", 900)] == (4, 8)
    # b mirrors: p50 -> bin 4, p90 -> bin 4
    assert got[("b", 500)] == (4, 8)
    assert got[("b", 900)] == (4, 8)
    with pytest.raises(ValueError, match="keys"):
        histogram_quantiles_by(h, [], [500])
    with pytest.raises(ValueError, match="not in histogram"):
        histogram_quantiles_by(h, ["nope"], [500])
