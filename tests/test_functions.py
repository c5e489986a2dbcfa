"""The functions module is the public expression vocabulary: every
re-export must resolve and compose inside one projection."""

from pyspark.sql import functions as F

import pyspark_datacol_diff_spark.functions as FN


def test_all_exports_resolve():
    assert sorted(FN.__all__) == sorted(set(FN.__all__))
    for name in FN.__all__:
        assert callable(getattr(FN, name)), name


def test_vocabulary_composes_in_one_select(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", [3.0, 4.0])],
        ["id", "text", "vec"],
    )
    row = df.select(
        FN.token_count("text").alias("toks"),
        FN.doc_fingerprint("text").alias("fp"),
        FN.hash_bucket("id").alias("bucket"),
        FN.lang_id("text").alias("lang"),
        FN.norm(F.col("vec")).alias("n"),
        FN.dot(F.col("vec"), F.col("vec")).alias("d"),
    ).collect()[0]
    assert row["toks"] == 9
    assert len(row["fp"]) == 32
    assert 0 <= row["bucket"] < 10_000
    assert row["lang"] == "en"
    assert row["n"] == 5.0
    assert row["d"] == 25.0
