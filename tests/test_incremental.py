"""Incremental aggregate maintenance: the decomposition invariant
merge(state(A), state(B)) == state(A | B), plus spec validation."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_datacol_diff_spark.operators.incremental import (
    agg_state,
    merge_agg_states,
)

SF = "/root/testdata/sf0.001"

AGGS = {
    "n": ("event_id", "count"),
    "total": ("cents", "sum"),
    "lo": ("cents", "min"),
    "hi": ("cents", "max"),
}


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "cents", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merged_states_equal_direct_aggregate(spark):
    e = _events(spark)
    direct = agg_state(e, ["event_type"], AGGS)
    parts = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    merged = merge_agg_states(
        [agg_state(p, ["event_type"], AGGS) for p in parts],
        ["event_type"],
        AGGS,
    )
    assert _rows(merged) == _rows(direct)


def test_merge_handles_keys_missing_from_some_states(spark):
    e = _events(spark)
    # one state sees only 'click', the other everything else: every key
    # appears in exactly one state and must survive the merge unchanged
    a = agg_state(e.filter(F.col("event_type") == "click"), ["event_type"], AGGS)
    b = agg_state(e.filter(F.col("event_type") != "click"), ["event_type"], AGGS)
    merged = merge_agg_states([a, b], ["event_type"], AGGS)
    assert _rows(merged) == _rows(agg_state(e, ["event_type"], AGGS))


def test_merge_is_reorderable_and_reassociable(spark):
    e = _events(spark)
    parts = [e.filter(F.col("event_id") % 4 == i) for i in range(4)]
    states = [agg_state(p, ["event_type"], AGGS) for p in parts]
    one_shot = merge_agg_states(states, ["event_type"], AGGS)
    # merge of merges, in a different order
    staged = merge_agg_states(
        [
            merge_agg_states([states[3], states[1]], ["event_type"], AGGS),
            merge_agg_states([states[0], states[2]], ["event_type"], AGGS),
        ],
        ["event_type"],
        AGGS,
    )
    assert _rows(staged) == _rows(one_shot)


def test_non_decomposable_aggregate_rejected_with_hll_hint(spark):
    # one error message carries both the contract name and the fix
    with pytest.raises(ValueError, match="decomposable") as e:
        agg_state(_events(spark), ["event_type"], {"d": ("user_id", "count_distinct")})
    assert "hll_distinct" in str(e.value)


def test_empty_state_list_rejected():
    with pytest.raises(ValueError, match="at least one"):
        merge_agg_states([], ["k"], AGGS)


def test_merge_shuffles_state_rows_not_data(spark):
    # the merge plan must aggregate the UNION of grain-sized states:
    # no join, no window, and the union itself adds no exchange
    from pyspark_datacol_diff_spark import plans as P

    e = _events(spark)
    states = [
        agg_state(e.filter(F.col("event_id") % 2 == i), ["event_type"], AGGS)
        for i in range(2)
    ]
    merged = merge_agg_states(states, ["event_type"], AGGS)
    plan = P.physical_plan(merged)
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Union") == 1


def test_hll_distinct_state_merges_within_tolerance(spark):
    e = _events(spark)
    aggs = {"sk": ("user_id", "hll_distinct")}
    parts = [e.filter(F.col("event_id") % 2 == i) for i in range(2)]
    merged = merge_agg_states(
        [agg_state(p, ["event_type"], aggs) for p in parts],
        ["event_type"],
        aggs,
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n")
    )
    rows = (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            F.hll_sketch_estimate("sk").alias("est"),
            "n",
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["est"] - r["n"]) <= max(0.10 * r["n"], 1), r


def test_hll_merged_state_is_remergeable(spark):
    # union output must itself be a valid sketch state (rollup of rollups)
    e = _events(spark)
    aggs = {"sk": ("user_id", "hll_distinct")}
    quarters = [
        agg_state(
            e.filter(F.col("event_id") % 4 == i), ["event_type"], aggs
        )
        for i in range(4)
    ]
    halves = [
        merge_agg_states(quarters[:2], ["event_type"], aggs),
        merge_agg_states(quarters[2:], ["event_type"], aggs),
    ]
    final = merge_agg_states(halves, ["event_type"], aggs)
    n = final.filter(F.hll_sketch_estimate("sk") > 0).count()
    assert n == final.count()


# --- property: ANY partition of the rows merges to the direct state ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from("xyz"),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=40,
    ),
    assignment=st.lists(st.integers(min_value=0, max_value=2), min_size=40, max_size=40),
)
def test_any_partition_merges_to_direct_state(spark, rows, assignment):
    aggs = {
        "n": ("val", "count"),
        "total": ("val", "sum"),
        "lo": ("val", "min"),
        "hi": ("val", "max"),
    }
    df = spark.createDataFrame(rows, "key string, val long")
    direct = agg_state(df, ["key"], aggs)
    parts = [
        [r for i, r in enumerate(rows) if assignment[i] == g] for g in range(3)
    ]
    states = [
        agg_state(spark.createDataFrame(p, "key string, val long"), ["key"], aggs)
        for p in parts
        if p
    ]
    merged = merge_agg_states(states, ["key"], aggs)
    assert _rows(merged) == _rows(direct)


def test_running_total_equals_global_window(spark):
    from pyspark.sql import Window

    from pyspark_datacol_diff_spark.operators.incremental import running_total

    df = spark.createDataFrame(
        [(d, v) for d, v in zip(range(100), [(-1) ** i * i for i in range(100)])],
        "pos long, delta long",
    )
    got = running_total(
        df, "pos", "delta", bucket=(F.col("pos") / 10).cast("long")
    )
    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("running_total", F.sum("delta").over(w))
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_running_total_plan_has_no_single_partition_window(spark):
    from pyspark_datacol_diff_spark import plans as P
    from pyspark_datacol_diff_spark.operators.incremental import running_total

    df = spark.range(50).select(
        F.col("id").alias("pos"), (F.col("id") % 7).alias("delta")
    )
    got = running_total(
        df, "pos", "delta", bucket=(F.col("pos") / 10).cast("long")
    )
    assert not [
        f for f in P.scale_lint(got) if f["code"] == "global_window"
    ]


def test_running_total_ties_use_range_semantics(spark):
    from pyspark_datacol_diff_spark.operators.incremental import running_total

    # SQL-default RANGE frame: tied order keys all carry the cumulative
    # sum INCLUDING every tie — deterministic whatever partition order
    df = spark.createDataFrame(
        [(1, 10), (2, 1), (2, 2), (3, 100)], "pos long, delta long"
    )
    got = {
        (r["pos"], r["delta"]): r["running_total"]
        for r in running_total(
            df, "pos", "delta", bucket=F.lit(0)
        ).collect()
    }
    assert got == {(1, 10): 10, (2, 1): 13, (2, 2): 13, (3, 100): 113}


def test_running_total_rejects_null_bucket_and_reserved_cols(spark):
    from pyspark_datacol_diff_spark.operators.incremental import running_total

    df = spark.createDataFrame([(1, 1), (None, 2)], "pos long, delta long")
    with pytest.raises(ValueError, match="NULL"):
        running_total(df, "pos", "delta", bucket=F.col("pos"))
    bad = df.withColumn("__pb", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        running_total(bad, "pos", "delta", bucket=F.lit(0))


def test_forward_fill_carries_last_observation(spark):
    from pyspark_datacol_diff_spark.operators.incremental import forward_fill

    rows = [
        (1, 1, None), (1, 2, 10), (1, 3, None), (1, 4, None), (1, 5, 20),
        (2, 1, None), (2, 2, None),
    ]
    df = spark.createDataFrame(rows, "u long, s long, x long")
    got = {
        (r["u"], r["s"]): r["x_ffill"]
        for r in forward_fill(df, ["u"], ["s"], ["x"]).collect()
    }
    assert got == {
        (1, 1): None, (1, 2): 10, (1, 3): 10, (1, 4): 10, (1, 5): 20,
        (2, 1): None, (2, 2): None,
    }


def test_forward_fill_multiple_columns_and_suffix(spark):
    from pyspark_datacol_diff_spark.operators.incremental import forward_fill

    df = spark.createDataFrame(
        [(1, 1, 5, "a"), (1, 2, None, None)], "u long, s long, x long, y string"
    )
    out = forward_fill(df, ["u"], ["s"], ["x", "y"], suffix="_f")
    assert {"x_f", "y_f"} <= set(out.columns)
    r = {row["s"]: row for row in out.collect()}
    assert r[2]["x_f"] == 5 and r[2]["y_f"] == "a"


def test_forward_fill_rejects_keyless_and_empty(spark):
    import pytest

    from pyspark_datacol_diff_spark.operators.incremental import forward_fill

    df = spark.createDataFrame([(1, 1, 1)], "u long, s long, x long")
    with pytest.raises(ValueError, match="keys"):
        forward_fill(df, [], ["s"], ["x"])
    with pytest.raises(ValueError, match="non-empty"):
        forward_fill(df, ["u"], [], ["x"])


class TestTimeWeightedAvg:
    """Round-6: exact-integer TWAP with grain-cell splitting."""

    def test_hand_computed_with_hour_split_and_ties(self, spark):
        import datetime as dt

        from pyspark_datacol_diff_spark.operators.incremental import (
            time_weighted_avg,
        )

        b = dt.datetime(2024, 1, 1, 0, 0, 0)

        def t(minutes):
            return b + dt.timedelta(minutes=minutes)

        rows = [
            # u1: 10.0 held 00:00->00:30, 20.0 held 00:30->01:30
            # (crosses the hour), 5.0 terminal (no segment)
            (1, 1, t(0), 10.0),
            (2, 1, t(30), 20.0),
            (3, 1, t(90), 5.0),
            # u2: two simultaneous observations (tie) then one more:
            # the tie segment is zero-length, only the later value holds
            (4, 2, t(0), 100.0),
            (5, 2, t(0), 200.0),
            (6, 2, t(10), 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        got = {
            (r["user_id"], str(r["grain_start"])): (
                r["covered_us"], r["num_e4us"], r["twap_q"]
            )
            for r in time_weighted_avg(
                df, "ts", "value", keys=["user_id"],
                tiebreak_col="event_id",
            ).collect()
        }
        m = 60 * 1_000_000  # minute in micros
        h0, h1 = "2024-01-01 00:00:00", "2024-01-01 01:00:00"
        # u1 hour 0: 10.0 x 30min + 20.0 x 30min -> twap 15.0
        assert got[(1, h0)] == (
            60 * m, 100_000 * 30 * m + 200_000 * 30 * m, 150_000
        )
        # u1 hour 1: 20.0 x 30min alone
        assert got[(1, h1)] == (30 * m, 200_000 * 30 * m, 200_000)
        # u2 hour 0: tie -> only 200.0 holds for 10 min
        assert got[(2, h0)] == (10 * m, 2_000_000 * 10 * m, 2_000_000)
        assert len(got) == 3  # terminal observations extrapolate nowhere

    def test_grain_validation(self, spark):
        import pytest as _pt

        from pyspark_datacol_diff_spark.operators.incremental import (
            time_weighted_avg,
        )

        df = spark.createDataFrame(
            [(1, 1, None, 1.0)],
            "event_id long, user_id long, ts timestamp, value double",
        )
        with _pt.raises(ValueError, match="grain"):
            time_weighted_avg(
                df, "ts", "value", keys=["user_id"],
                tiebreak_col="event_id", grain="minute",
            )

    def test_empty_keys_rejected(self, spark):
        import pytest as _pt

        from pyspark_datacol_diff_spark.operators.incremental import (
            time_weighted_avg,
        )

        df = spark.createDataFrame(
            [(1, 1, None, 1.0)],
            "event_id long, user_id long, ts timestamp, value double",
        )
        with _pt.raises(ValueError, match="keys"):
            time_weighted_avg(
                df, "ts", "value", keys=[], tiebreak_col="event_id"
            )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # user
            st.integers(min_value=0, max_value=10_000), # offset seconds
            st.integers(min_value=0, max_value=99_999), # value cents*100
        ),
        min_size=2,
        max_size=30,
    ),
)
def test_twap_matches_python_integrator(spark, obs):
    """Property: for ANY observation set (duplicate timestamps and
    hour-crossing gaps included), the per-(user, hour) moments equal a
    brute-force Python step-function integration using the same
    total order (ts, event_id)."""
    import datetime as dt

    from pyspark_datacol_diff_spark.operators.incremental import (
        time_weighted_avg,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (eid, u, base + dt.timedelta(seconds=s), c / 10_000.0)
        for eid, (u, s, c) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["grain_start"]): (r["covered_us"], r["num_e4us"])
        for r in time_weighted_avg(
            df, "ts", "value", keys=["user_id"], tiebreak_col="event_id"
        ).collect()
    }
    from decimal import Decimal

    expect: dict = {}
    by_user: dict = {}
    for eid, u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, eid, v))
    for u, lst in by_user.items():
        lst.sort(key=lambda t: (t[0], t[1]))
        for (ts, _, v), (nxt, _, _) in zip(lst, lst[1:]):
            if nxt <= ts:
                continue
            vq = int(Decimal(str(v)).quantize(Decimal("0.0001")) * 10000)
            cur = ts
            while cur < nxt:
                cell = cur.replace(minute=0, second=0, microsecond=0)
                cell_end = cell + dt.timedelta(hours=1)
                seg_end = min(nxt, cell_end)
                us = int((seg_end - cur).total_seconds() * 1_000_000)
                c_us, c_num = expect.get((u, cell), (0, 0))
                expect[(u, cell)] = (c_us + us, c_num + vq * us)
                cur = seg_end
    assert got == expect


class TestDecayedSum:
    """Round-7: exact bit-shift exponential decay (half-life = 1 day)."""

    def test_matches_pure_python(self, spark):
        import datetime as dt

        from pyspark_datacol_diff_spark.operators.incremental import (
            decayed_sum,
        )

        base = dt.datetime(2024, 3, 10, 12, 0, 0)
        rows = [
            (1, base, 10.00),                          # age 0: full
            (1, base - dt.timedelta(days=1), 10.00),   # age 1: half
            (1, base - dt.timedelta(days=2), 10.01),   # age 2: quarter
            (2, base - dt.timedelta(days=70), 8.00),   # clamped to 62
            (2, base, 0.005),                          # bround half-even
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )
        got = {
            r["user_id"]: (r["n_events"], r["decayed_q"])
            for r in decayed_sum(df, ["user_id"], "ts", "value").collect()
        }
        # user 1: 1000 + 1000//2 + 1001//4 = 1000+500+250
        assert got[1] == (3, 1750)
        # user 2: 800 >> 62 = 0; bround(0.5) = 0 (half to even)
        assert got[2] == (2, 0)

    def test_explicit_anchor(self, spark):
        import datetime as dt

        from pyspark_datacol_diff_spark.operators.incremental import (
            decayed_sum,
        )

        rows = [(1, dt.datetime(2024, 3, 9, 6, 0), 4.0)]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )
        r = decayed_sum(
            df, ["user_id"], "ts", "value",
            anchor_sql="DATE'2024-03-11'",
        ).collect()[0]
        assert r["decayed_q"] == 100  # 400 >> 2

    def test_negative_values_floor_not_truncate(self, spark):
        """r08 regression (VERDICT r07 #6): the decay convention on
        NEGATIVE values is pinned to FLOOR (arithmetic shift) — the
        convention Spark shiftright and DuckDB >> share — never
        truncating DIV, which rounds toward zero and diverges on any
        negative odd scaled value (floor(-5/2) = -3, trunc = -2)."""
        import datetime as dt

        from pyspark_datacol_diff_spark.operators.incremental import (
            decayed_sum,
        )

        base = dt.datetime(2024, 3, 10, 12, 0, 0)
        rows = [
            (1, base - dt.timedelta(days=1), -0.05),   # -5 >> 1 = -3
            (2, base - dt.timedelta(days=2), -0.01),   # -1 >> 2 = -1
            (3, base - dt.timedelta(days=1), -0.005),  # bround -> 0
            (4, base, -1.27),                          # age 0: -127
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )
        got = {
            r["user_id"]: r["decayed_q"]
            for r in decayed_sum(
                df, ["user_id"], "ts", "value",
                anchor_sql="DATE'2024-03-10'",
            ).collect()
        }
        assert got == {1: -3, 2: -1, 3: 0, 4: -127}
