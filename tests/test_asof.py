"""As-of join tests: hand-built frames with known nearest-event answers."""

import pytest

from pyspark_datacol_diff_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "c1"),
            ("u1", 20, "c2"),
            ("u1", 5, "c0"),   # before any right row
            ("u2", 10, "c3"),  # key with no right rows at all
        ],
        ["user", "t", "cid"],
    )
    right = spark.createDataFrame(
        [
            ("u1", 8, "v1"),
            ("u1", 10, "v2"),   # exactly simultaneous with c1
            ("u1", 15, "v3"),
        ],
        ["user", "t", "vid"],
    )
    return left, right


def _rows(df):
    return {r["cid"]: (r["t_r"], r["vid_r"]) for r in df.collect()}


def test_backward_matches_latest_at_or_before(spark, frames):
    left, right = frames
    out = asof_join(left, right, ["user"], "t", "t", ["t", "vid"])
    got = _rows(out)
    assert got["c1"] == (10, "v2")  # ties at equal ts match
    assert got["c2"] == (15, "v3")
    assert got["c0"] == (None, None)  # nothing at or before
    assert got["c3"] == (None, None)  # key absent from right
    assert out.count() == 4  # left-join: every left row survives


def test_forward_matches_earliest_at_or_after(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, ["user"], "t", "t", ["t", "vid"], direction="forward"
    )
    got = _rows(out)
    assert got["c0"] == (8, "v1")
    assert got["c1"] == (10, "v2")
    assert got["c2"] == (None, None)  # nothing at or after 20
    assert got["c3"] == (None, None)


def test_bad_direction_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, ["user"], "t", "t", ["t"], direction="nearest")


def test_single_shuffle_plan(spark, frames):
    """The scale contract: one Exchange (on the join key), no join node,
    no cartesian/range blow-up."""
    left, right = frames
    out = asof_join(left, right, ["user"], "t", "t", ["vid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
