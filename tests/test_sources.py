"""Source/sink helper tests (reference S1-S3 parity + write conventions)."""

import os

from pyspark.sql import functions as F

from pyspark_datacol_diff_spark import sources as SRC


def test_read_csv_all_string(spark, tmp_path):
    p = tmp_path / "emp.csv"
    p.write_text("id,name,score\n1,alice,9.5\n2,bob,\n")
    df = SRC.read_csv_all_string(spark, str(p))
    assert [f.dataType.typeName() for f in df.schema.fields] == ["string"] * 3
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["score"] == "9.5"
    assert rows["2"]["score"] is None  # empty CSV field -> null, as in Spark


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "emp.csv"
    p.write_text("id,name,score\n1,alice,9.5\n")
    df = SRC.read_csv_with_schema(spark, str(p), "id int, name string, score double")
    r = df.collect()[0]
    assert (r["id"], r["score"]) == (1, 9.5)


def test_read_parquet_table_events_ts(spark):
    df = SRC.read_parquet_table(spark, "/root/testdata/sf0.001", "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.count() > 0


def test_show_diff_renders_json(spark, capsys):
    df = spark.createDataFrame(
        [(1, [{"col_name": "a", "s1_value": "x", "s2_value": "y"}], "")],
        "id long, CompColArr array<struct<col_name:string,s1_value:string,s2_value:string>>, Flag string",
    )
    SRC.show_diff(df, 5)
    out = capsys.readouterr().out
    assert '"col_name":"a"' in out


def test_summary_table(spark):
    df = spark.createDataFrame([("a", 3), ("b", 1)], "ColName string, Count long")
    s = SRC.summary_table(df.orderBy(F.desc("Count")))
    assert "ColName" in s and "a" in s


def test_write_parquet_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "en"), (2, "fr"), (3, "en")], "id long, lang string"
    )
    out = str(tmp_path / "parts")
    SRC.write_parquet(df, out, partition_by=["lang"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    ) == ["lang=en", "lang=fr"]
    back = spark.read.parquet(out)
    assert back.count() == 3
    # partition pruning: only the en directory is scanned
    plan = back.filter(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_write_bucketed_table_avoids_exchange(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    SRC.write_bucketed_table(
        df, "t_bucketed_src", bucket_cols=["k"], num_buckets=4, mode="overwrite"
    )
    t = spark.table("t_bucketed_src")
    agg_plan = (
        t.groupBy("k").count()._jdf.queryExecution().executedPlan().toString()
    )
    # bucketed layout satisfies the agg's distribution: no shuffle exchange
    assert "Exchange hashpartitioning" not in agg_plan
    spark.sql("DROP TABLE t_bucketed_src")


def test_bucketed_diff_shuffles_nothing(spark):
    """The 100 TB repeated-diff pattern: land both snapshots bucketed by
    the primary key and the full-outer SMJ reads bucket-local data — the
    plan has ZERO shuffle exchanges, so diff cost is scan + merge."""
    from pyspark_datacol_diff_spark import plans as P
    from pyspark_datacol_diff_spark.operators.diff import diff

    base = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 13).cast("string").alias("v"),
    )
    mutated = base.withColumn(
        "v", F.when(F.col("k") % 17 == 0, F.lit("CHANGED")).otherwise(F.col("v"))
    )
    for name, df in (("t_diff_s1", base), ("t_diff_s2", mutated)):
        SRC.write_bucketed_table(
            df, name, bucket_cols=["k"], num_buckets=4, mode="overwrite"
        )
    try:
        d = diff(spark.table("t_diff_s1"), spark.table("t_diff_s2"), ["k"])
        assert P.shuffle_count(d) == 0
        assert P.count_op(d, "SortMergeJoin") == 1
        assert d.filter(F.col("Flag") == "").count() == 1000 // 17 + 1
    finally:
        spark.sql("DROP TABLE t_diff_s1")
        spark.sql("DROP TABLE t_diff_s2")


def test_jsonl_roundtrip(spark, tmp_path):
    from pyspark_datacol_diff_spark import sources as SRC

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None)], ["id", "name", "score"]
    )
    path = str(tmp_path / "out_jsonl")
    SRC.write_jsonl(df, path, compression=None)
    back = SRC.read_jsonl(spark, path, "id BIGINT, name STRING, score DOUBLE")
    got = {r["id"]: (r["name"], r["score"]) for r in back.collect()}
    assert got == {1: ("alpha", 1.5), 2: ("beta", None)}


def test_jsonl_schema_prunes_parse(spark, tmp_path):
    from pyspark_datacol_diff_spark import sources as SRC

    df = spark.createDataFrame([(1, "x", "drop-me")], ["id", "name", "extra"])
    path = str(tmp_path / "pruned_jsonl")
    SRC.write_jsonl(df, path, compression=None)
    back = SRC.read_jsonl(spark, path, "id BIGINT, name STRING")
    assert back.columns == ["id", "name"]
    assert back.collect()[0]["name"] == "x"


def test_no_pushdown_keeps_filter_above_exchange(spark):
    from pyspark.sql import functions as F

    from pyspark_datacol_diff_spark import sources as SRC

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    cond = (F.col("k") % 7 == 0)
    plain = df.repartition(8).filter(cond)
    guarded = df.repartition(8).filter(SRC.no_pushdown(cond))
    # same rows either way
    assert plain.count() == guarded.count() == 143

    def cond_below_exchange(q):
        # track the CONDITION itself, not just any Filter node: a split
        # conjunction leaves the guard above the exchange while the real
        # predicate sinks below — exactly the regression this test pins
        plan = q._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        ei = next(i for i, l in enumerate(lines) if "Exchange RoundRobin" in l)
        return any("% 7" in l for l in lines[ei:])

    assert cond_below_exchange(plain)  # Catalyst pushes it down
    assert not cond_below_exchange(guarded)  # guard pins it above


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    df = spark.range(100).withColumn("k", F.col("id") % 10)
    p = str(tmp_path / "orc_rt")
    SRC.write_orc(df, p, partition_by=["k"])
    back = SRC.read_orc(spark, p).filter(F.col("k") == 3)
    assert back.count() == 10
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # partition pruning reaches the scan


def test_csv_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    p = str(tmp_path / "csv_out")
    SRC.write_csv(df, p)
    back = SRC.read_csv_all_string(spark, p)
    assert {(r["id"], r["v"]) for r in back.collect()} == {("1", "a"), ("2", "b")}


def test_write_clustered_parquet_prunes_row_groups(spark, tmp_path):
    df = spark.range(10000).select(
        F.col("id").alias("ts_key"), (F.col("id") % 50).alias("payload")
    )
    p = str(tmp_path / "clustered")
    SRC.write_clustered_parquet(df, p, ["ts_key"], num_files=8)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 8  # one sorted key range per file
    back = spark.read.parquet(p).filter(
        (F.col("ts_key") >= 100) & (F.col("ts_key") < 200)
    )
    assert back.count() == 100
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts_key), GreaterThanOrEqual(ts_key,100)" in plan


def _py_morton(a, b):
    def spread(x):
        x &= 0x7FFFFFFF
        for shift, mask in SRC._MORTON_MASKS:
            x = (x | (x << shift)) & mask
        return x

    return spread(a) | (spread(b) << 1)


def test_morton_key_matches_reference_bits(spark):
    rows = [(i, i * 37 % 1000, i * 91 % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", SRC.morton_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for i, a, b in rows:
        assert got[i] == _py_morton(a, b)


def test_zordered_layout_skips_files_on_both_dims(spark, tmp_path):
    """The point of Z-ordering: one layout serves predicates on EITHER
    dimension. Per-file min/max footers must localize dim_b even though
    a one-dimensional cluster on dim_a would spread it everywhere."""
    import pyarrow.parquet as pq

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    zpath = str(tmp_path / "zordered")
    apath = str(tmp_path / "a_clustered")
    SRC.write_zordered_parquet(df, zpath, "a", "b", num_files=8)
    SRC.write_clustered_parquet(df, apath, ["a"], num_files=8)

    def overlapping_files(path, col, value):
        import glob

        def col_stats(md, rg):
            j = next(
                j for j in range(md.num_columns)
                if md.row_group(rg).column(j).path_in_schema == col
            )
            return md.row_group(rg).column(j).statistics

        hits = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(col_stats(md, i).min for i in range(md.num_row_groups))
            hi = max(col_stats(md, i).max for i in range(md.num_row_groups))
            if lo <= value <= hi:
                hits += 1
        return hits

    # a point predicate on b: the a-clustered layout cannot skip any
    # file; the z-ordered layout must skip most
    assert overlapping_files(apath, "b", 5) == 8
    assert overlapping_files(zpath, "b", 5) <= 4
    # and the z layout still skips on a too
    assert overlapping_files(zpath, "a", 5) <= 4
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == n


def test_read_parquet_evolving_unions_and_conforms(spark, tmp_path):
    from pyspark.sql import types as T

    from pyspark_datacol_diff_spark.sources import read_parquet_evolving

    d = str(tmp_path / "land")
    # generation 1: (id, a) — generation 2 adds column b
    spark.createDataFrame([(1, "x")], "id long, a string").write.parquet(
        f"{d}/g1"
    )
    spark.createDataFrame(
        [(2, "y", 10)], "id long, a string, b long"
    ).write.parquet(f"{d}/g2")
    merged = read_parquet_evolving(spark, f"{d}/*")
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r["id"]: r["b"] for r in merged.collect()}
    assert rows == {1: None, 2: 10}
    # catalog form: contract pins (id, b, c) — a dropped, c typed-NULL
    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("c", T.StringType()),
        ]
    )
    pinned = read_parquet_evolving(spark, f"{d}/*", target_schema=contract)
    assert pinned.columns == ["id", "b", "c"]
    rows = {r["id"]: (r["b"], r["c"]) for r in pinned.collect()}
    assert rows == {1: (None, None), 2: (10, None)}


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from pyspark_datacol_diff_spark.sources import compact_parquet

    src = str(tmp_path / "frag")
    # 20 tiny files
    spark.range(2000).repartition(20).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 20
    dst = str(tmp_path / "compact")
    n_files = compact_parquet(spark, src, dst, target_mb=128)
    assert n_files == 1
    got = spark.read.parquet(dst)
    assert got.count() == 2000
    assert got.agg({"id": "sum"}).collect()[0][0] == sum(range(2000))


def test_compact_parquet_handles_spaces_and_rejects_bad_target(spark, tmp_path):
    import pytest as _pytest

    from pyspark_datacol_diff_spark.sources import compact_parquet

    src = str(tmp_path / "fr ag%dir")
    spark.range(100).repartition(4).write.parquet(src)
    dst = str(tmp_path / "out")
    assert compact_parquet(spark, src, dst) == 1
    assert spark.read.parquet(dst).count() == 100
    with _pytest.raises(ValueError, match="target_mb"):
        compact_parquet(spark, src, str(tmp_path / "out2"), target_mb=0)


def test_compact_parquet_append_accumulates_documented(spark, tmp_path):
    from pyspark_datacol_diff_spark.sources import compact_parquet

    src = str(tmp_path / "src")
    spark.range(500).repartition(5).write.parquet(src)
    dst = str(tmp_path / "dst")
    first = compact_parquet(spark, src, dst, target_mb=64)
    second = compact_parquet(spark, src, dst, target_mb=64, mode="append")
    # return counts files PRESENT at dst (docstring contract): append
    # accumulates, rows double
    assert second == 2 * first
    assert spark.read.parquet(dst).count() == 1000


def test_free_persistent_rdds_sees_checkpoint_blocks(spark):
    """free_persistent_rdds must release localCheckpoint block sets —
    the storage clearCache cannot see (the round-4 smoke leak)."""
    from pyspark_datacol_diff_spark import free_persistent_rdds

    free_persistent_rdds(spark)
    df = spark.range(100).localCheckpoint(eager=True)
    assert df.count() == 100
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert len(jmap) >= 1
    # clearCache does NOT release checkpoint storage...
    spark.catalog.clearCache()
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) >= 1
    # ...free_persistent_rdds does
    n = free_persistent_rdds(spark)
    assert n >= 1
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_synth_partsupp_pk_and_small_supplier_guard(spark):
    """Round-6: synthesized partsupp — (ps_partkey, ps_suppkey) is a
    primary key (4 distinct suppliers per part) and a supplier table
    too small to guarantee it fails loudly, not silently."""
    import pytest

    from pyspark_datacol_diff_spark.sources import synth_partsupp

    part = spark.createDataFrame([(i,) for i in range(8)], "p_partkey long")
    supp = spark.createDataFrame([(i,) for i in range(5)], "s_suppkey long")
    ps = synth_partsupp(part, supp).collect()
    assert len(ps) == 32
    assert len({(r["ps_partkey"], r["ps_suppkey"]) for r in ps}) == 32
    assert all(0 <= r["ps_suppkey"] < 5 for r in ps)
    assert all(1 <= r["ps_availqty"] <= 9999 for r in ps)
    assert all(90000 <= r["ps_supplycost_cents"] < 182000 for r in ps)
    tiny = spark.createDataFrame([(0,), (1,), (2,)], "s_suppkey long")
    with pytest.raises(Exception, match="synth_partsupp needs"):
        synth_partsupp(part, tiny).collect()
