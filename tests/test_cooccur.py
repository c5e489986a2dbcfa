"""Co-occurrence sufficient statistics (operators/cooccur.py)."""

from pyspark_datacol_diff_spark.operators.cooccur import cooccurrence_stats


def test_hand_counts_and_presence_dedup(spark):
    # user 1: a,a,a,b (a's repeats must collapse); user 2: a,b,c; user 3: c
    rows = [
        (1, "a"), (1, "a"), (1, "a"), (1, "b"),
        (2, "a"), (2, "b"), (2, "c"),
        (3, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["n_groups"])
        for r in cooccurrence_stats(df, "user_id", "item").collect()
    }
    assert got == {
        ("a", "b"): (2, 2, 2, 3),
        ("a", "c"): (1, 2, 2, 3),
        ("b", "c"): (1, 2, 2, 3),
    }


def test_single_item_groups_emit_no_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id long, item string"
    )
    assert cooccurrence_stats(df, "user_id", "item").count() == 0


def test_marginals_broadcast_in_plan(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], "user_id long, item string"
    )
    plan = (
        cooccurrence_stats(df, "user_id", "item")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
