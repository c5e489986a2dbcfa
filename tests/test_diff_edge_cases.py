"""Edge-case semantics pinned by SURVEY.md §4.4: null/blank equivalence,
null primary keys, duplicate-key fan-out, composite keys, mixed-case
schemas, typed (non-string) comparison, float tolerance."""

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from pyspark_datacol_diff_spark import diff, flag_counts, column_mismatch_counts


def _flags(d):
    return {r["Flag"]: r["cnt"] for r in flag_counts(d).collect()}


def _cols(d):
    return {r["ColName"]: r["Count"] for r in column_mismatch_counts(d).collect()}


def _pair(spark, rows1, rows2, schema):
    return (
        spark.createDataFrame(rows1, schema),
        spark.createDataFrame(rows2, schema),
    )


def test_null_equals_blank_default(spark):
    """Reference parity: fillna('') makes null == '' for strings."""
    schema = "id string, v string"
    s1, s2 = _pair(spark, [("1", None), ("2", "x")], [("1", ""), ("2", None)], schema)
    d = diff(s1, s2, ["id"])
    assert _flags(d) == {"NODIFF": 1, "": 1}  # (null,'') no diff; ('x',null) diff
    assert _cols(d) == {"v": 1}


def test_strict_nulls_mode(spark):
    schema = "id string, v string"
    s1, s2 = _pair(spark, [("1", None)], [("1", "")], schema)
    d = diff(s1, s2, ["id"], null_equals_blank=False)
    assert _flags(d) == {"": 1}
    assert _cols(d) == {"v": 1}


def test_null_pk_rows_never_match(spark):
    schema = "id string, v string"
    s1, s2 = _pair(
        spark,
        [(None, "a"), ("1", "b")],
        [(None, "a"), ("1", "b")],
        schema,
    )
    d = diff(s1, s2, ["id"])
    f = _flags(d)
    # null-key rows never equi-join; reference's when-order labels BOTH
    # sides' null-key rows 'S1_ONLY' (concat(s2_keys) null checked first,
    # and a null s2-side key also trips it) — preserved quirk.
    assert f.get("NODIFF") == 1
    assert f.get("S1_ONLY", 0) == 2
    assert _cols(d) == {}  # null-key rows excluded from per-column counts


def test_duplicate_keys_fan_out(spark):
    schema = "id string, v string"
    s1, s2 = _pair(
        spark,
        [("1", "a"), ("1", "b")],
        [("1", "a")],
        schema,
    )
    d = diff(s1, s2, ["id"])
    assert d.count() == 2  # 2x1 fan-out, reference behavior
    f = _flags(d)
    assert f.get("NODIFF") == 1 and f.get("") == 1


def test_composite_key(spark):
    schema = "k1 string, k2 string, v string"
    s1, s2 = _pair(
        spark,
        [("a", "x", "1"), ("a", "y", "2"), ("b", "x", "3")],
        [("a", "x", "1"), ("a", "y", "9"), ("c", "x", "3")],
        schema,
    )
    d = diff(s1, s2, ["k1", "k2"])
    assert d.columns == ["k1_s1", "k2_s1", "k1_s2", "k2_s2", "CompColArr", "Flag"]
    f = _flags(d)
    assert f == {"NODIFF": 1, "": 1, "S1_ONLY": 1, "S2_ONLY": 1}
    assert _cols(d) == {"v": 1}


def test_mixed_case_column_names(spark):
    s1 = spark.createDataFrame([("1", "a")], ["Id", "Val"])
    s2 = spark.createDataFrame([("1", "b")], ["id", "val"])
    d = diff(s1, s2, ["Id"])
    assert _flags(d) == {"": 1}
    assert _cols(d) == {"Val": 1}


def test_typed_columns_compare_natively(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    import datetime as dt

    t1 = dt.datetime(2024, 1, 1, 12, 0, 0)
    t2 = dt.datetime(2024, 1, 1, 12, 0, 1)
    s1 = spark.createDataFrame([(1, 1.5, t1), (2, 2.0, t1), (3, None, t1)], schema)
    s2 = spark.createDataFrame([(1, 1.5, t1), (2, 2.5, t2), (3, None, t1)], schema)
    d = diff(s1, s2, ["id"])
    assert _flags(d) == {"NODIFF": 2, "": 1}
    assert _cols(d) == {"amount": 1, "ts": 1}
    # output values are stringified native values
    e = (
        d.filter(F.col("id_s1") == 2)
        .select(F.explode("CompColArr").alias("e"))
        .filter(F.col("e.col_name") == "amount")
        .collect()[0]["e"]
    )
    assert e["s1_value"] == "2.0" and e["s2_value"] == "2.5"


def test_float_tolerance(spark):
    schema = "id bigint, x double"
    s1, s2 = _pair(spark, [(1, 1.0), (2, 1.0)], [(1, 1.0000001), (2, 1.1)], schema)
    strict = diff(s1, s2, ["id"])
    assert _flags(strict) == {"": 2}
    tol = diff(s1, s2, ["id"], float_tol=1e-6)
    assert _flags(tol) == {"NODIFF": 1, "": 1}


def test_no_compare_columns_pk_only_table(spark):
    """Table that is ALL key: every matched row is NODIFF."""
    schema = "id string, gender string"
    s1, s2 = _pair(spark, [("1", "F"), ("2", "M")], [("1", "F"), ("3", "M")], schema)
    d = diff(s1, s2, ["id", "gender"])
    f = _flags(d)
    assert f == {"NODIFF": 1, "S1_ONLY": 1, "S2_ONLY": 1}


def test_empty_s2_all_s1_only(spark):
    s1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    s2 = spark.createDataFrame([], "id long, v string")
    d = diff(s1, s2, ["id"])
    flags = {r["Flag"]: r["cnt"] for r in flag_counts(d).collect()}
    assert flags == {"S1_ONLY": 2}
    # per-column counts: unmatched rows contribute nothing
    assert column_mismatch_counts(d).count() == 0


def test_both_empty(spark):
    s1 = spark.createDataFrame([], "id long, v string")
    d = diff(s1, s1, ["id"])
    assert d.count() == 0
