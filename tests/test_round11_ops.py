"""Round-11 operator units: Mann-Whitney U, autocorrelation, Cohen's
kappa, total-variation distance, KMV distinct sketch — hand-computed
exact values plus the typed-error contracts."""

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators.corpus import tv_distance_vs_rest
from pyspark_datacol_diff_spark.operators.quality import (
    autocorr_ppm,
    cohens_kappa_ppm,
    mann_whitney_u2,
)
from pyspark_datacol_diff_spark.operators.sketch import kmv_distinct


class TestMannWhitney:
    def test_hand_computed_with_ties(self, spark):
        # a=[1,2,3], b=[2,3,4]: midranks 1, 2.5, 2.5, 4.5, 4.5, 6
        # R_a = 8 -> U_a = 2 -> u2_a = 4, u2_b = 2*9-4 = 14
        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("b", 4)],
            ["g", "v"],
        )
        r = mann_whitney_u2(df, "g", "v", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"], r["u2_a"], r["u2_b"]) == (3, 3, 4, 14)
        # AUC = U_a/(na*nb) = 2/9 -> 222222 ppm (truncated)
        assert r["auc_ppm"] == 222222

    def test_identity_u2a_plus_u2b(self, spark):
        df = spark.createDataFrame(
            [("a", i * 7 % 13) for i in range(20)]
            + [("b", i * 5 % 11) for i in range(30)],
            ["g", "v"],
        )
        r = mann_whitney_u2(df, "g", "v", "a", "b").collect()[0]
        assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]

    def test_empty_side_raises(self, spark):
        df = spark.createDataFrame([("a", 1), ("a", 2)], ["g", "v"])
        with pytest.raises(ValueError, match="non-empty samples"):
            mann_whitney_u2(df, "g", "v", "a", "b")

    def test_null_bucket_raises(self, spark):
        # under ANSI (the session default) the CAST itself errors; the
        # guard covers non-ANSI sessions, where the cast yields NULL
        # (same contract as ks_statistic — test_round9_ops.py)
        df = spark.createDataFrame(
            [("a", "1"), ("a", "x"), ("b", "2")], ["g", "v"]
        )
        prev = spark.conf.get("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", "false")
        try:
            with pytest.raises(ValueError, match="NULL bucket"):
                mann_whitney_u2(df, "g", "v", "a", "b")
        finally:
            spark.conf.set("spark.sql.ansi.enabled", prev)


class TestAutocorr:
    def test_hand_positive(self, spark):
        # x = 1..4 ordered: acf1 = 1.25/5 = 0.25 -> 250000
        df = spark.createDataFrame(
            [(1, "k", 1), (2, "k", 2), (3, "k", 3), (4, "k", 4)],
            ["t", "g", "x"],
        )
        r = autocorr_ppm(
            df, ["g"], "x", "t", lag=1, tiebreak_cols=["t"]
        ).collect()[0]
        assert (r["n"], r["n_pairs"], r["acf_ppm"]) == (4, 3, 250000)

    def test_hand_negative_truncates_toward_zero(self, spark):
        # alternating 1,3,1,3: num=-48, den=64 -> -750000 exactly
        df = spark.createDataFrame(
            [(1, "k", 1), (2, "k", 3), (3, "k", 1), (4, "k", 3)],
            ["t", "g", "x"],
        )
        r = autocorr_ppm(
            df, ["g"], "x", "t", lag=1, tiebreak_cols=["t"]
        ).collect()[0]
        assert r["acf_ppm"] == -750000

    def test_degenerate_groups_dropped(self, spark):
        # "zv" has zero variance (den=0); "sh" has n <= lag
        df = spark.createDataFrame(
            [(1, "zv", 5), (2, "zv", 5), (3, "zv", 5), (1, "sh", 1),
             (1, "ok", 1), (2, "ok", 2), (3, "ok", 1)],
            ["t", "g", "x"],
        )
        out = autocorr_ppm(
            df, ["g"], "x", "t", lag=1, tiebreak_cols=["t"]
        ).collect()
        assert {r["g"] for r in out} == {"ok"}

    def test_lag_and_tiebreak_validation(self, spark):
        df = spark.createDataFrame([(1, "k", 1)], ["t", "g", "x"])
        with pytest.raises(ValueError, match="lag"):
            autocorr_ppm(df, ["g"], "x", "t", lag=0, tiebreak_cols=["t"])
        with pytest.raises(ValueError, match="tiebreak"):
            autocorr_ppm(df, ["g"], "x", "t", lag=1, tiebreak_cols=[])


class TestCohensKappa:
    def test_hand_computed(self, spark):
        # 2x2: diag 35/50, pe terms 1250 -> kappa = 0.4
        rows = (
            [("x", "x")] * 20 + [("x", "y")] * 5
            + [("y", "x")] * 10 + [("y", "y")] * 15
        )
        df = spark.createDataFrame(rows, ["ra", "rb"])
        r = cohens_kappa_ppm(df, "ra", "rb").collect()[0]
        assert (r["n"], r["n_cats_a"], r["n_cats_b"], r["kappa_ppm"]) == (
            50, 2, 2, 400000,
        )

    def test_null_is_a_category_and_diag_null_safe(self, spark):
        # cells (x,x)=3, (NULL,NULL)=2, (x,y)=1: n=6 diag=5 mm=16
        # kappa = (30-16)/(36-16) = 0.7
        rows = [("x", "x")] * 3 + [(None, None)] * 2 + [("x", "y")]
        df = spark.createDataFrame(rows, "ra string, rb string")
        r = cohens_kappa_ppm(df, "ra", "rb").collect()[0]
        assert (r["n"], r["n_cats_a"], r["n_cats_b"], r["kappa_ppm"]) == (
            6, 2, 3, 700000,
        )

    def test_negative_kappa_truncates_toward_zero(self, spark):
        # perfect disagreement on a balanced 2x2: kappa = -1
        rows = [("x", "y")] * 5 + [("y", "x")] * 5
        df = spark.createDataFrame(rows, ["ra", "rb"])
        r = cohens_kappa_ppm(df, "ra", "rb").collect()[0]
        assert r["kappa_ppm"] == -1000000

    def test_constant_raters_raise(self, spark):
        df = spark.createDataFrame([("x", "x")] * 4, ["ra", "rb"])
        with pytest.raises(Exception, match="kappa is.*undefined|undefined"):
            cohens_kappa_ppm(df, "ra", "rb").collect()


class TestTvDistance:
    def test_two_source_symmetric(self, spark):
        # A={x:2,y:1}, B={x:1,z:2}: TV = 2/3 both directions
        df = spark.createDataFrame(
            [("A", "x x y"), ("B", "x z z")], ["source", "text"]
        )
        out = {
            r["source"]: (r["n_tokens"], r["tv_ppm"])
            for r in tv_distance_vs_rest(df, "source").collect()
        }
        assert out == {"A": (3, 666666), "B": (3, 666666)}

    def test_identical_distributions_zero(self, spark):
        df = spark.createDataFrame(
            [("A", "x y"), ("B", "x y")], ["source", "text"]
        )
        out = tv_distance_vs_rest(df, "source").collect()
        assert all(r["tv_ppm"] == 0 for r in out)

    def test_single_source_dropped(self, spark):
        df = spark.createDataFrame([("A", "x y z")], ["source", "text"])
        assert tv_distance_vs_rest(df, "source").count() == 0

    def test_null_group_is_real(self, spark):
        df = spark.createDataFrame(
            [("A", "x x"), (None, "y y")], "source string, text string"
        )
        out = {
            r["source"]: r["tv_ppm"]
            for r in tv_distance_vs_rest(df, "source").collect()
        }
        # disjoint vocabularies: TV = 1 exactly, for both groups
        assert out == {"A": 1000000, None: 1000000}


class TestKmvDistinct:
    def test_below_k_is_exact(self, spark):
        df = spark.createDataFrame(
            [("A", "a b c a"), ("B", "d e")], ["source", "text"]
        )
        out = {
            r["source"]: (r["n_kept"], r["kmv_distinct"])
            for r in kmv_distinct(df, ["source"], k=8).collect()
        }
        assert out == {"A": (3, 3), "B": (2, 2)}

    def test_estimate_within_tolerance(self, spark):
        # 500 distinct tokens, k=64: se ~ 1/sqrt(62) ~ 12.7%; assert 3 se
        rows = [
            ("A", " ".join(f"tok{i}" for i in range(j * 50, (j + 1) * 50)))
            for j in range(10)
        ]
        df = spark.createDataFrame(rows, ["source", "text"])
        r = kmv_distinct(df, ["source"], k=64).collect()[0]
        assert r["n_kept"] == 64
        assert 310 <= r["kmv_distinct"] <= 690

    def test_k_validation(self, spark):
        df = spark.createDataFrame([("A", "a")], ["source", "text"])
        with pytest.raises(ValueError, match="k must be >= 2"):
            kmv_distinct(df, ["source"], k=1)

    def test_dedup_on_hash_not_token_case(self, spark):
        # lowercasing folds "Tok" and "tok" to one type
        df = spark.createDataFrame([("A", "Tok tok TOK")], ["source", "text"])
        r = kmv_distinct(df, ["source"], k=8).collect()[0]
        assert (r["n_kept"], r["kmv_distinct"]) == (1, 1)


class TestPettitt:
    def test_clean_step_localized(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            pettitt_changepoint,
        )

        d = spark.createDataFrame(
            [(i + 1, "g", 1 if i < 3 else 5) for i in range(6)],
            ["t", "g", "v"],
        )
        r = pettitt_changepoint(
            d, ["g"], "v", "t", tiebreak_cols=["t"]
        ).collect()[0]
        # K = max|U_t| = 9 (the classic sgn-sum over the 3x3 split),
        # changepoint after position 3
        assert (r["n"], r["k_stat"], r["t_change"]) == (6, 9, 3)

    def test_tie_prefers_smallest_t(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            pettitt_changepoint,
        )

        # constant series: every |U_t| = 0 -> argmax tie, smallest t wins
        d = spark.createDataFrame(
            [(i + 1, "g", 7) for i in range(4)], ["t", "g", "v"]
        )
        r = pettitt_changepoint(
            d, ["g"], "v", "t", tiebreak_cols=["t"]
        ).collect()[0]
        assert (r["k_stat"], r["t_change"]) == (0, 1)

    def test_single_row_group_dropped(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            pettitt_changepoint,
        )

        d = spark.createDataFrame(
            [(1, "solo", 1), (1, "ok", 1), (2, "ok", 9)], ["t", "g", "v"]
        )
        out = {r["g"] for r in pettitt_changepoint(
            d, ["g"], "v", "t", tiebreak_cols=["t"]
        ).collect()}
        assert out == {"ok"}

    def test_null_group_is_real(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            pettitt_changepoint,
        )

        d = spark.createDataFrame(
            [(1, None, 1), (2, None, 5), (1, "g", 2), (2, "g", 2)],
            "t int, g string, v int",
        )
        out = {r["g"]: r["k_stat"] for r in pettitt_changepoint(
            d, ["g"], "v", "t", tiebreak_cols=["t"]
        ).collect()}
        assert None in out and out[None] == 1  # |U_1| = |2 - 3| = 1


class TestGiniConcentration:
    def test_perfect_equality_zero(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            gini_concentration_ppm,
        )

        d = spark.createDataFrame(
            [("g", 5, i) for i in range(4)], ["g", "v", "t"]
        )
        r = gini_concentration_ppm(
            d, ["g"], "v", tiebreak_cols=["t"]
        ).collect()[0]
        assert r["gini_ppm"] == 0

    def test_single_owner(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            gini_concentration_ppm,
        )

        # one row owns all mass: G = (n-1)/n = 0.75
        d = spark.createDataFrame(
            [("g", 0, 1), ("g", 0, 2), ("g", 0, 3), ("g", 4, 4)],
            ["g", "v", "t"],
        )
        r = gini_concentration_ppm(
            d, ["g"], "v", tiebreak_cols=["t"]
        ).collect()[0]
        assert (r["n"], r["sum_value"], r["gini_ppm"]) == (4, 4, 750000)

    def test_negative_raises(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            gini_concentration_ppm,
        )

        d = spark.createDataFrame([("g", -1, 1)], ["g", "v", "t"])
        with pytest.raises(Exception, match="negative value"):
            gini_concentration_ppm(
                d, ["g"], "v", tiebreak_cols=["t"]
            ).collect()

    def test_all_zero_group_dropped(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            gini_concentration_ppm,
        )

        d = spark.createDataFrame(
            [("z", 0, 1), ("z", 0, 2), ("g", 1, 1)], ["g", "v", "t"]
        )
        out = {r["g"] for r in gini_concentration_ppm(
            d, ["g"], "v", tiebreak_cols=["t"]
        ).collect()}
        assert out == {"g"}


class TestFanoFactor:
    def test_poisson_like_and_regular(self, spark):
        import datetime as dt

        from pyspark_datacol_diff_spark.operators.quality import (
            fano_factor_ppm,
        )

        b = dt.datetime(2024, 1, 1, 10, 0)
        # counts [3, 1]: mean 2, pop var 1 -> F = 0.5
        rows = [("g", b)] * 3 + [("g", b + dt.timedelta(hours=1))]
        # metronome: one event per hour -> F = 0
        rows += [("m", b + dt.timedelta(hours=i)) for i in range(4)]
        d = spark.createDataFrame(rows, ["g", "ts"])
        out = {
            r["g"]: (r["n_buckets"], r["n_events"], r["fano_ppm"])
            for r in fano_factor_ppm(d, ["g"], "ts").collect()
        }
        assert out["g"] == (2, 4, 500000)
        assert out["m"] == (4, 4, 0)
