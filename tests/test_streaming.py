"""Structured Streaming tests: streaming==batch equivalence for the
windowed aggregate, and hand-computed sessionization via
applyInPandasWithState."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark import sources as SRC
from pyspark_datacol_diff_spark import streaming as ST


def _events_stream(spark, sf_dir="/root/testdata/sf0.001"):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = ST.stage_files(f"{sf_dir}/events.parquet")
    sdf = ST.read_parquet_stream(spark, src, batch.schema)
    return SRC.normalize_event_ts(sdf), SRC.normalize_event_ts(batch)


def test_streaming_hourly_equals_batch(spark):
    sdf, batch = _events_stream(spark)
    got = ST.run_available_now(
        ST.windowed_event_counts(sdf), query_name="t_hourly_mem"
    ).drop("n_users_approx")
    want = ST.windowed_event_counts(batch).drop("n_users_approx")
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert len(g) > 0
    assert g == w


def test_streaming_plan_has_watermark(spark):
    sdf, _ = _events_stream(spark)
    plan = ST.windowed_event_counts(sdf)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def _ts(h, m, s=0):
    return dt.datetime(2026, 1, 1, h, m, s)


def test_sessionize_gap_split(spark, tmp_path):
    rows = [
        # user 1: two sessions split by a > 30 min gap
        (1, _ts(10, 0)), (1, _ts(10, 10)), (1, _ts(10, 25)),
        (1, _ts(11, 30)), (1, _ts(11, 40)),
        # user 2: one session, single event
        (2, _ts(9, 0)),
    ]
    src = str(tmp_path / "sess_events")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)
    batch = spark.read.parquet(src)
    sdf = ST.read_parquet_stream(spark, src, batch.schema)
    out = ST.run_available_now(
        ST.sessionize(sdf, gap_seconds=1800),
        query_name="t_sess_mem",
        output_mode="update",
    ).collect()
    by_key = {
        (r["user_id"], r["session_start"]): r for r in out
    }
    s1 = by_key[(1, _ts(10, 0))]
    assert (s1["session_end"], s1["n_events"], s1["closed"]) == (_ts(10, 25), 3, True)
    s2 = by_key[(1, _ts(11, 30))]
    assert (s2["session_end"], s2["n_events"], s2["closed"]) == (_ts(11, 40), 2, False)
    s3 = by_key[(2, _ts(9, 0))]
    assert (s3["n_events"], s3["closed"]) == (1, False)


def test_sessionize_state_carries_across_batches(spark, tmp_path):
    """Two files + maxFilesPerTrigger=1 -> two micro-batches; the open
    session from batch 1 must extend in batch 2 via GroupState."""
    src = tmp_path / "sess2"
    src.mkdir()
    df1 = spark.createDataFrame(
        [(1, _ts(10, 0)), (1, _ts(10, 5))], "user_id long, ts timestamp"
    )
    df2 = spark.createDataFrame(
        [(1, _ts(10, 20))], "user_id long, ts timestamp"
    )
    df1.coalesce(1).write.parquet(str(src / "f1"))
    df2.coalesce(1).write.parquet(str(src / "f2"))
    batch = spark.read.parquet(str(src / "*"))
    sdf = ST.read_parquet_stream(
        spark, str(src / "*"), batch.schema, max_files_per_trigger=1
    )
    out = ST.run_available_now(
        ST.sessionize(sdf, gap_seconds=1800),
        query_name="t_sess2_mem",
        output_mode="update",
    ).collect()
    # update mode re-emits the session each batch it changes; final state
    # of the (1, 10:00) session must cover all 3 events
    final = sorted(
        (r for r in out if r["user_id"] == 1 and r["session_start"] == _ts(10, 0)),
        key=lambda r: r["n_events"],
    )[-1]
    assert final["session_end"] == _ts(10, 20)
    assert final["n_events"] == 3
    assert not final["closed"]


def test_dedup_stream_drops_replayed_file(spark, tmp_path):
    """Stage the same events file twice (an exactly-once-violating replay);
    the watermarked streaming dedup must emit each event_id once and match
    the batch distinct count."""
    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path / "replay"
    d.mkdir()
    shutil.copy(src, d / "a.parquet")
    shutil.copy(src, d / "b.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(str(d))
    sdf = SRC.normalize_event_ts(
        ST.read_parquet_stream(spark, str(d), batch.schema)
    )
    out = ST.run_available_now(
        ST.dedup_stream(sdf, ["event_id"]),
        query_name="q_dedup_stream",
        output_mode="append",
    )
    n_unique = spark.read.parquet(src).select("event_id").distinct().count()
    assert out.count() == n_unique
    assert out.select("event_id").distinct().count() == n_unique


def _sides(df):
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    views = df.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return clicks, views


def test_interval_join_batch_semantics(spark):
    rows = [
        (1, 100, "click", _ts(12, 0)),
        (1, 200, "view", _ts(11, 30)),   # inside 1h lookback
        (1, 201, "view", _ts(10, 30)),   # outside
        (1, 202, "view", _ts(12, 0)),    # simultaneous: inclusive
        (1, 203, "view", _ts(12, 5)),    # after the click: excluded
        (2, 101, "click", _ts(12, 0)),   # user with no views
        (3, 204, "view", _ts(12, 0)),    # view with no click
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "event_type", "ts"])
    clicks, views = _sides(df)
    got = {
        (r["click_id"], r["view_id"])
        for r in ST.interval_join(
            clicks, views, ["user_id"], "click_ts", "view_ts", lookback="1 hour"
        ).collect()
    }
    assert got == {(100, 200), (100, 202)}


def test_interval_join_stream_equals_batch(spark):
    sdf, batch = _events_stream(spark)
    sc, sv = _sides(sdf)
    bc, bv = _sides(batch)
    got = ST.run_available_now(
        ST.interval_join(sc, sv, ["user_id"], "click_ts", "view_ts").select(
            "user_id", "click_id", "view_id"
        ),
        query_name="t_attrib_mem",
        output_mode="append",
    )
    want = ST.interval_join(bc, bv, ["user_id"], "click_ts", "view_ts").select(
        "user_id", "click_id", "view_id"
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert len(g) > 0
    assert g == w


def test_interval_join_stream_plan_is_stateful(spark):
    sdf, _ = _events_stream(spark)
    sc, sv = _sides(sdf)
    j = ST.interval_join(sc, sv, ["user_id"], "click_ts", "view_ts")
    plan = j._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2  # both sides bounded


def test_parquet_file_sink_exactly_once(spark, tmp_path):
    sdf, batch = _events_stream(spark)
    out = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    q = ST.write_stream_parquet(
        sdf.select("event_id", "user_id", "event_type"), out, ckpt
    )
    q.awaitTermination()
    first = spark.read.parquet(out).count()
    assert first == batch.count()
    # restart against the same checkpoint: no new data -> no new files,
    # and the sink log guarantees the count is unchanged (exactly-once)
    q2 = ST.write_stream_parquet(
        sdf.select("event_id", "user_id", "event_type"), out, ckpt
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == first


def test_interval_join_left_outer_keeps_unmatched(spark):
    rows = [
        (1, 100, "click", _ts(12, 0)),
        (1, 200, "view", _ts(11, 30)),
        (2, 101, "click", _ts(12, 0)),  # no views for user 2
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "event_type", "ts"])
    clicks, views = _sides(df)
    got = {
        r["click_id"]: r["view_id"]
        for r in ST.interval_join(
            clicks, views, ["user_id"], "click_ts", "view_ts",
            lookback="1 hour", how="left_outer",
        ).collect()
    }
    assert got == {100: 200, 101: None}


def test_sliding_windows_stream_equals_batch(spark):
    sdf, batch = _events_stream(spark)
    got = ST.run_available_now(
        ST.windowed_event_counts(sdf, slide="15 minutes"),
        query_name="t_sliding_mem",
    ).drop("n_users_approx")
    want = ST.windowed_event_counts(batch, slide="15 minutes").drop(
        "n_users_approx"
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g and g == w
    # every tumbling hour appears as 4 overlapping hop windows
    assert len(g) > batch.select(
        F.date_trunc("hour", "ts")
    ).distinct().count()


def test_continuous_rollup_merges_across_micro_batches(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = ST.stage_disjoint_splits(batch, "event_id", 3)
    sdf = ST.read_parquet_stream(
        spark, src, batch.schema, max_files_per_trigger=1
    )
    sdf = SRC.normalize_event_ts(sdf).withColumn(
        "cents", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    )
    aggs = {
        "n": ("event_id", "count"),
        "total": ("cents", "sum"),
        "hi": ("cents", "max"),
    }
    got = ST.continuous_rollup(
        sdf, ["event_type"], aggs, query_name="t_rollup"
    )
    from pyspark_datacol_diff_spark.operators.incremental import agg_state

    want = agg_state(
        SRC.normalize_event_ts(batch).withColumn(
            "cents", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        ),
        ["event_type"],
        aggs,
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_continuous_rollup_reexecution_is_idempotent(spark):
    # at-least-once contract: a re-executed batch merges from the newest
    # version with id < batch_id (never its own prior output) and
    # overwrites its version — so replaying the whole stream against the
    # SAME state_root (fresh checkpoint, batch ids restart at 0) must
    # converge to the identical final state, not double-count
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = ST.stage_disjoint_splits(batch, "event_id", 2)
    root = tempfile.mkdtemp(prefix="t_rollup_state_")
    aggs = {"n": ("event_id", "count"), "total": ("cents", "sum")}

    def run(name):
        sdf = ST.read_parquet_stream(
            spark, src, batch.schema, max_files_per_trigger=1
        )
        sdf = SRC.normalize_event_ts(sdf).withColumn(
            "cents", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        )
        return ST.continuous_rollup(
            sdf, ["event_type"], aggs, query_name=name, state_root=root
        )

    first = {tuple(r) for r in run("t_roll_a").collect()}
    second = {tuple(r) for r in run("t_roll_b").collect()}
    assert first and first == second


def test_stage_disjoint_splits_is_a_true_partition(spark, tmp_path):
    # negative and NULL keys must land in some split, not vanish
    df = spark.createDataFrame(
        [(-5, "a"), (-1, "b"), (0, "c"), (7, "d"), (None, "e")],
        "k long, v string",
    )
    src = ST.stage_disjoint_splits(df, "k", 3)
    got = spark.read.schema(df.schema).parquet(src)
    assert got.count() == 5
    assert {r["v"] for r in got.collect()} == {"a", "b", "c", "d", "e"}


def test_continuous_rollup_returns_this_runs_state_not_stale_versions(spark):
    # a reused state_root holding a HIGHER version from an earlier,
    # longer run must not be returned when the current (shorter) replay
    # ran real batches
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    root = tempfile.mkdtemp(prefix="t_rollup_stale_")
    aggs = {"n": ("event_id", "count")}
    # plant a stale v9 with wrong numbers
    spark.createDataFrame(
        [("click", 999999)], "event_type string, n long"
    ).write.parquet(f"{root}/v9")
    src = ST.stage_disjoint_splits(batch, "event_id", 2)
    sdf = SRC.normalize_event_ts(
        ST.read_parquet_stream(spark, src, batch.schema, max_files_per_trigger=1)
    )
    got = ST.continuous_rollup(
        sdf, ["event_type"], aggs, query_name="t_roll_stale", state_root=root
    )
    want = batch.groupBy("event_type").count().withColumnRenamed("count", "n")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_continuous_histogram_merges_across_micro_batches(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = ST.stage_disjoint_splits(batch, "event_id", 3)
    sdf = ST.read_parquet_stream(
        spark, src, batch.schema, max_files_per_trigger=1
    )
    sdf = SRC.normalize_event_ts(sdf).withColumn(
        "cents", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    )
    got = ST.continuous_histogram(
        sdf, "cents", lo=0, width=1000, num_bins=50,
        query_name="t_hist_rollup",
    )
    from pyspark_datacol_diff_spark.operators.histogram import histogram

    want = histogram(
        SRC.normalize_event_ts(batch).withColumn(
            "cents", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        ),
        "cents", lo=0, width=1000, num_bins=50,
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_continuous_heavy_hitters_state_bounded_and_exact(spark):
    """Three micro-batches of documents: the merged MG state stays
    k-bounded, its totals are exact, and the final exact count pass
    equals the single-pass batch heavy_hitters answer."""
    from pyspark_datacol_diff_spark.operators import sketch as SK
    from pyspark_datacol_diff_spark.operators import text as TX

    batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = ST.stage_disjoint_splits(batch, "doc_id", 3)
    grams_of = lambda df: df.select(
        TX.gram_multiset(
            F.filter(TX.tokens(F.lower(F.col("text"))), lambda x: x != ""), 2
        ).alias("grams")
    )
    k = 50
    sdf = ST.read_parquet_stream(
        spark, src, batch.schema, max_files_per_trigger=1
    )
    state = ST.continuous_heavy_hitters(
        grams_of(sdf), "grams", k=k, query_name="t_stream_hh"
    ).collect()
    items = [r for r in state if r["item"] is not None]
    assert len(items) <= k  # mergeable trim keeps the state bounded
    total = sum(r["wt"] for r in state if r["item"] is None)
    n_grams = grams_of(batch).select(
        F.sum(F.size("grams")).alias("n")
    ).first()["n"]
    assert total == n_grams  # totals merge exactly

    got = {
        (r["item"], r["cnt"])
        for r in SK.heavy_hitters_from_summary(
            grams_of(batch), "grams", state, phi_num=1, phi_den=40
        ).collect()
    }
    want = {
        (r["item"], r["cnt"])
        for r in SK.heavy_hitters(
            grams_of(batch), "grams", phi_num=1, phi_den=40
        ).collect()
    }
    assert got == want


class TestContinuousTransitions:
    """r08: the first ORDER-SENSITIVE continuous fold — cross-batch
    sequence stitching via a per-key frontier."""

    def _events(self, spark):
        import datetime as dt

        b = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = []
        eid = 0
        for u, states in [(1, "ABABB"), (2, "AAB"), (3, "B")]:
            for i, s in enumerate(states):
                rows.append((eid, b + dt.timedelta(minutes=eid), u, s))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, state string"
        )

    def _expected(self, spark):
        import collections

        from pyspark_datacol_diff_spark.operators.range_join import (
            transition_counts,
        )

        return {
            (r["from_state"], r["to_state"]): (r["n"], r["p_ppm"])
            for r in transition_counts(
                self._events(spark), ["user_id"], "ts", "state",
                tiebreak_cols=["event_id"],
            ).collect()
        }

    def test_streaming_equals_batch_across_three_batches(self, spark):
        from pyspark_datacol_diff_spark import streaming as STR

        df = self._events(spark)
        src = STR.stage_time_splits(
            df, "ts", 3, tiebreak_cols=["event_id"]
        )
        sdf = STR.read_parquet_stream(
            spark, src, df.schema, max_files_per_trigger=1
        )
        got = {
            (r["from_state"], r["to_state"]): (r["n"], r["p_ppm"])
            for r in STR.continuous_transitions(
                sdf, ["user_id"], "ts", "state",
                tiebreak_cols=["event_id"],
                query_name="t_stream_trans",
            ).collect()
        }
        assert got == self._expected(spark)
        # the batch-boundary steps exist: user 1 has 4 steps total but
        # at most 2 can be intra-batch with 9 events in 3 time splits —
        # equality above already proves the stitch, this pins the shape
        assert sum(n for n, _ in got.values()) == 6

    def test_frontier_survives_idle_batch(self, spark):
        """A key with no events in the middle batch must still stitch
        its batch-1 frontier onto its batch-3 event."""
        import datetime as dt

        from pyspark_datacol_diff_spark import streaming as STR

        b = dt.datetime(2024, 1, 1)
        # user 1: one event in split 1 and one in split 3; user 2 fills
        # the middle split so the splits are non-empty
        rows = [
            (0, b + dt.timedelta(minutes=0), 1, "A"),
            (1, b + dt.timedelta(minutes=10), 2, "X"),
            (2, b + dt.timedelta(minutes=11), 2, "Y"),
            (3, b + dt.timedelta(minutes=20), 1, "B"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, state string"
        )
        src = STR.stage_time_splits(df, "ts", 3, tiebreak_cols=["event_id"])
        got = {
            (r["from_state"], r["to_state"]): r["n"]
            for r in STR.continuous_transitions(
                STR.read_parquet_stream(
                    spark, src, df.schema, max_files_per_trigger=1
                ),
                ["user_id"], "ts", "state",
                tiebreak_cols=["event_id"],
                query_name="t_stream_trans_idle",
            ).collect()
        }
        assert got == {("A", "B"): 1, ("X", "Y"): 1}


class TestContinuousCusum:
    """r09: the second ORDER-SENSITIVE continuous fold — per-key (C, M)
    prefix-state algebra extending cusum across batch boundaries."""

    def _events(self, spark):
        import datetime as dt

        b = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = []
        # user 1 drifts up then spikes; user 2 hovers below drift
        vals = {1: [10, 0, 10, 0, 20, 30], 2: [0, 0, 3, 0]}
        eid = 0
        for u, vs in vals.items():
            for i, v in enumerate(vs):
                rows.append((eid, b + dt.timedelta(minutes=eid), u, v))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, v long"
        )

    def _batch_expected(self, spark, drift=5, thr=4):
        from pyspark.sql import Window

        df = self._events(spark)
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ref = df.withColumn(
            "S", F.sum(F.col("v") - F.lit(drift)).over(w)
        ).withColumn(
            "cusum", F.col("S") - F.least(F.lit(0), F.min("S").over(w))
        )
        return {
            r["user_id"]: (r["n_rows"], r["max_cusum"], r["n_alarms"])
            for r in ref.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.max("cusum").alias("max_cusum"),
                F.sum((F.col("cusum") > thr).cast("long")).alias("n_alarms"),
            )
            .collect()
        }

    def test_streaming_equals_batch_across_batches(self, spark):
        from pyspark_datacol_diff_spark import streaming as STR

        df = self._events(spark)
        for n_batches in (2, 4):
            src = STR.stage_time_splits(
                df, "ts", n_batches, tiebreak_cols=["event_id"]
            )
            sdf = STR.read_parquet_stream(
                spark, src, df.schema, max_files_per_trigger=1
            )
            got = {
                r["user_id"]: (r["n_rows"], r["max_cusum"], r["n_alarms"])
                for r in STR.continuous_cusum(
                    sdf, ["user_id"], "ts", "v", drift=5, threshold=4,
                    tiebreak_cols=["event_id"],
                    query_name=f"t_stream_cusum_{n_batches}",
                ).collect()
            }
            assert got == self._batch_expected(spark), (
                f"batch-boundary prefix restart at n_batches={n_batches}"
            )

    def test_boundary_restart_would_be_caught(self, spark):
        # the failure the state algebra prevents: user 1's running
        # minimum is set in batch 1; a restarted prefix would compute a
        # LOWER max_cusum. Pin the cross-batch number explicitly.
        from pyspark_datacol_diff_spark import streaming as STR

        df = self._events(spark)
        src = STR.stage_time_splits(df, "ts", 3, tiebreak_cols=["event_id"])
        sdf = STR.read_parquet_stream(
            spark, src, df.schema, max_files_per_trigger=1
        )
        got = {
            r["user_id"]: r["max_cusum"]
            for r in STR.continuous_cusum(
                sdf, ["user_id"], "ts", "v", drift=5, threshold=4,
                tiebreak_cols=["event_id"], query_name="t_stream_cusum_pin",
            ).collect()
        }
        # user 1: S = 5,0,5,0,15,40 -> cusum max 40 (min prefix 0)
        assert got[1] == 40
