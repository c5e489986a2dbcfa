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


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, direction):
    """Randomized cross-validation against pandas.merge_asof, the
    canonical as-of implementation (same inclusive tie semantics)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "user": rng.integers(0, 5, 300),
            "t": rng.integers(0, 500, 300),
            "cid": np.arange(300),
        }
    )
    right = (
        pd.DataFrame(
            {
                "user": rng.integers(0, 5, 300),
                "t": rng.integers(0, 500, 300),
            }
        )
        .drop_duplicates(["user", "t"])  # unique (key, ts): match is unambiguous
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable").assign(t_r=lambda d: d["t"]),
        on="t",
        by="user",
        direction=direction,
    ).set_index("cid")["t_r"]

    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        ["user"],
        "t",
        "t",
        ["t"],
        direction=direction,
    )
    got = {r["cid"]: r["t_r"] for r in out.collect()}
    assert len(got) == len(left)
    for cid, w in want.items():
        g = got[cid]
        if pd.isna(w):
            assert g is None, f"cid={cid}: expected no match, got {g}"
        else:
            assert g == int(w), f"cid={cid}: expected {w}, got {g}"


def test_asof_carries_nearest_row_atomically(spark):
    """Round-5 review fix: a null FIELD in the nearest right row must be
    carried as null, not back-filled from an older right row (per-column
    last(ignorenulls) built combination rows no actual right row
    contains; merge_asof/DuckDB ASOF carry whole rows)."""
    import datetime as dt

    from pyspark_datacol_diff_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 12, m, 0)
    left = spark.createDataFrame([(1, t(10))], "k long, lts timestamp")
    right = spark.createDataFrame(
        [(1, t(1), 100, "old"), (1, t(9), None, "near")],
        "k long, rts timestamp, price int, tag string",
    )
    row = asof_join(
        left, right, ["k"], "lts", "rts", ["price", "tag"]
    ).collect()[0]
    assert row["tag_r"] == "near"
    assert row["price_r"] is None  # NOT 100 from the older row


class TestScd2Join:
    """Round-6: type-2 slowly-changing-dimension lookup."""

    def _dim(self, spark):
        import datetime as dt

        rows = [
            # key 1: two contiguous versions split at 2000-01-01
            (1, dt.datetime(1990, 1, 1), dt.datetime(2000, 1, 1), "old"),
            (1, dt.datetime(2000, 1, 1), dt.datetime(9999, 1, 1), "new"),
            # key 2: one version ending before some facts
            (2, dt.datetime(1990, 1, 1), dt.datetime(1995, 1, 1), "only"),
        ]
        return spark.createDataFrame(
            rows, "k long, valid_from timestamp, valid_to timestamp, attr string"
        )

    def _fact(self, spark):
        import datetime as dt

        rows = [
            (10, 1, dt.datetime(1999, 12, 31, 23, 59, 59)),  # -> old
            (11, 1, dt.datetime(2000, 1, 1)),  # boundary -> new (half-open)
            (12, 2, dt.datetime(1994, 6, 1)),  # -> only
            (13, 2, dt.datetime(1996, 1, 1)),  # outside every window
        ]
        return spark.createDataFrame(rows, "fid long, k long, ts timestamp")

    def test_half_open_lookup_inner_and_left(self, spark):
        from pyspark_datacol_diff_spark.operators.asof import scd2_join

        inner = {
            r["fid"]: r["attr"]
            for r in scd2_join(
                self._fact(spark), self._dim(spark), on=["k"], ts_col="ts"
            ).collect()
        }
        assert inner == {10: "old", 11: "new", 12: "only"}
        left = {
            r["fid"]: r["attr"]
            for r in scd2_join(
                self._fact(spark), self._dim(spark), on=["k"],
                ts_col="ts", how="left",
            ).collect()
        }
        assert left == {10: "old", 11: "new", 12: "only", 13: None}

    def test_include_validity_and_key_pairs(self, spark):
        from pyspark.sql import functions as F

        from pyspark_datacol_diff_spark.operators.asof import scd2_join

        fact = self._fact(spark).withColumnRenamed("k", "fk")
        out = scd2_join(
            fact, self._dim(spark), on=[("fk", "k")], ts_col="ts",
            include_validity=True,
        )
        assert {"valid_from", "valid_to"} <= set(out.columns)
        assert out.filter(F.col("fid") == 10).collect()[0]["attr"] == "old"

    def test_attr_name_collision_raises(self, spark):
        import pytest as _pt

        from pyspark_datacol_diff_spark.operators.asof import scd2_join

        fact = self._fact(spark).withColumnRenamed("fid", "attr")
        with _pt.raises(ValueError, match="collide"):
            scd2_join(fact, self._dim(spark), on=["k"], ts_col="ts")
