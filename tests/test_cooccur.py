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


class TestBasketPairs:
    """r08: the promoted public face of the co-purchase substrate
    (VERDICT r07 #8 — the registry's seven graph queries delegate)."""

    def _df(self, spark):
        rows = [
            (1, 10), (1, 20), (1, 30), (1, 20),  # dup item collapses
            (2, 10), (2, 20),
            (3, 10), (3, 30),
            (4, 40),
        ]
        return spark.createDataFrame(rows, "oid long, item long")

    def test_hand_counts(self, spark):
        from pyspark_datacol_diff_spark.operators.cooccur import basket_pairs

        got = {
            (r["p1"], r["p2"]): r["n_groups"]
            for r in basket_pairs(
                self._df(spark), "oid", "item", min_count=1
            ).collect()
        }
        assert got == {(10, 20): 2, (10, 30): 2, (20, 30): 1}

    def test_min_count_filters(self, spark):
        from pyspark_datacol_diff_spark.operators.cooccur import basket_pairs

        got = {
            (r["p1"], r["p2"])
            for r in basket_pairs(self._df(spark), "oid", "item").collect()
        }
        assert got == {(10, 20), (10, 30)}

    def test_cap_bias_contract(self, spark):
        """Only each basket's cap SMALLEST items enter the expansion:
        pairs wholly beyond the cap vanish deterministically."""
        from pyspark_datacol_diff_spark.operators.cooccur import basket_pairs

        rows = [(1, i) for i in (5, 4, 3, 2, 1)]
        df = spark.createDataFrame(rows, "oid long, item long")
        got = {
            (r["p1"], r["p2"])
            for r in basket_pairs(
                df, "oid", "item", min_count=1, cap=3
            ).collect()
        }
        assert got == {(1, 2), (1, 3), (2, 3)}

    def test_validation(self, spark):
        import pytest

        from pyspark_datacol_diff_spark.operators.cooccur import (
            basket_pairs,
            basket_triples,
        )

        df = self._df(spark)
        with pytest.raises(ValueError, match="min_count"):
            basket_pairs(df, "oid", "item", min_count=0)
        with pytest.raises(ValueError, match="cap"):
            basket_pairs(df, "oid", "item", cap=1)
        with pytest.raises(ValueError, match="cap"):
            basket_triples(df, "oid", "item", cap=2)

    def test_triples_hand_counts(self, spark):
        from pyspark_datacol_diff_spark.operators.cooccur import (
            basket_triples,
        )

        rows = [
            (1, 10), (1, 20), (1, 30),
            (2, 10), (2, 20), (2, 30), (2, 40),
        ]
        df = spark.createDataFrame(rows, "oid long, item long")
        got = {
            (r["p1"], r["p2"], r["p3"]): r["n_groups"]
            for r in basket_triples(
                df, "oid", "item", min_count=1
            ).collect()
        }
        assert got[(10, 20, 30)] == 2
        assert got[(10, 20, 40)] == 1
        assert len(got) == 4

    def test_triples_cap_bounds_enumeration(self, spark):
        from pyspark_datacol_diff_spark.operators.cooccur import (
            basket_triples,
        )

        rows = [(1, i) for i in range(10)]
        df = spark.createDataFrame(rows, "oid long, item long")
        got = basket_triples(df, "oid", "item", min_count=1, cap=4).collect()
        # C(4,3) = 4 triples, all from items {0,1,2,3}
        assert len(got) == 4
        assert all(r["p3"] <= 3 for r in got)

    def test_symmetric_edges(self, spark):
        from pyspark_datacol_diff_spark.operators.cooccur import (
            basket_pairs,
            symmetric_edges,
        )

        pairs = basket_pairs(self._df(spark), "oid", "item")
        got = {
            (r["src"], r["dst"], r["n_groups"])
            for r in symmetric_edges(
                pairs, weight_cols=["n_groups"]
            ).collect()
        }
        assert got == {
            (10, 20, 2), (20, 10, 2), (10, 30, 2), (30, 10, 2),
        }


class TestAssociationRules:
    """r08: exact-integer confidence/lift over basket_pairs."""

    def test_hand_rules(self, spark):
        from pyspark_datacol_diff_spark.operators.cooccur import (
            association_rules,
        )

        rows = [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"),
            (4, "c"),
        ]
        df = spark.createDataFrame(rows, "oid long, item string")
        got = {
            (r["antecedent"], r["consequent"]): (
                r["n_ab"], r["n_ante"], r["n_cons"],
                r["confidence_ppm"], r["lift_ppm"],
            )
            for r in association_rules(df, "oid", "item").collect()
        }
        # n_ab(a,b)=2, n_a=3, n_b=2, N=4
        # conf(a->b) = 2e6 DIV 3 = 666666; lift = 2*4e6 DIV 6 = 1333333
        assert got[("a", "b")] == (2, 3, 2, 666_666, 1_333_333)
        assert got[("b", "a")] == (2, 2, 3, 1_000_000, 1_333_333)
        assert len(got) == 2
