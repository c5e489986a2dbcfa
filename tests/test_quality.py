"""Declarative data-quality checks: one-pass semantics, NULL-as-
violation, empty-table vacuous pass, name validation, plan shape."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_datacol_diff_spark.operators.quality import check_rules


def _df(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, None), (-3, "c"), (None, "d")], "x long, s string"
    )


def test_counts_and_null_is_violation(spark):
    rows = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in check_rules(
            _df(spark),
            {
                "x_positive": F.col("x") > 0,  # -3 fails, NULL x fails
                "s_not_null": F.col("s").isNotNull(),
                "always": F.lit(True),
            },
        ).collect()
    }
    assert rows == {
        "x_positive": (4, 2, False),
        "s_not_null": (4, 1, False),
        "always": (4, 0, True),
    }


def test_empty_table_passes_vacuously(spark):
    rows = check_rules(
        spark.createDataFrame([], "x long"), {"pos": F.col("x") > 0}
    ).collect()
    assert [(r["n_rows"], r["n_violations"], r["passed"]) for r in rows] == [
        (0, 0, True)
    ]


def test_rejects_empty_rules_and_reserved_name(spark):
    with pytest.raises(ValueError, match="at least one"):
        check_rules(_df(spark), {})
    with pytest.raises(ValueError, match="reserved"):
        check_rules(_df(spark), {"__n": F.lit(True)})


def test_arbitrary_rule_names_including_quotes(spark):
    # names are column aliases, never SQL text — apostrophes work
    rows = check_rules(
        _df(spark), {"customer's id present": F.col("x").isNotNull()}
    ).collect()
    assert rows[0]["rule"] == "customer's id present"
    assert rows[0]["n_violations"] == 1


def test_single_scan_whatever_the_rule_count(spark):
    from pyspark_datacol_diff_spark import plans as P

    df = _df(spark)
    out = check_rules(
        df, {f"r{i}": F.col("x") > i for i in range(12)}
    )
    plan = P.physical_plan(out)
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") <= 1
    assert "Join" not in plan


def test_grouped_rules_report_per_group(spark):
    from pyspark_datacol_diff_spark.operators.quality import check_rules_by

    df = spark.createDataFrame(
        [("a", 1), ("a", -1), ("b", 2), ("b", 3)], "src string, x long"
    )
    rows = {
        (r["src"], r["rule"]): (r["n_rows"], r["n_violations"], r["passed"])
        for r in check_rules_by(
            df, ["src"], {"x_pos": F.col("x") > 0}
        ).collect()
    }
    assert rows == {
        ("a", "x_pos"): (2, 1, False),
        ("b", "x_pos"): (2, 0, True),
    }


def test_grouped_rules_reject_key_clash(spark):
    from pyspark_datacol_diff_spark.operators.quality import check_rules_by

    with pytest.raises(ValueError, match="clash"):
        check_rules_by(_df(spark), ["s"], {"s": F.lit(True)})


def test_winsorize_hand_computed(spark):
    """20 values 1..20 in one group: p10/p90 discrete fences on 1..20
    are the 2nd and 18th values -> clamp to [2, 18]; nulls stay null;
    all rows and columns pass through."""
    from pyspark_datacol_diff_spark.operators.quality import winsorize

    rows = [("a", i, f"x{i}") for i in range(1, 21)] + [("a", None, "xn")]
    df = spark.createDataFrame(rows, "g string, v long, tag string")
    out = winsorize(df, "v", keys=["g"], lower=0.10, upper=0.90)
    got = {r["tag"]: r["v_winsorized"] for r in out.collect()}
    assert len(got) == 21
    assert got["xn"] is None
    assert got["x1"] == 2 and got["x2"] == 2
    assert got["x19"] == 18 and got["x20"] == 18
    assert all(got[f"x{i}"] == i for i in range(3, 18))
    # type preserved (percentile_disc's double widened back)
    assert dict(out.dtypes)["v_winsorized"] == "bigint"


def test_winsorize_keyless_and_per_group_fences_differ(spark):
    from pyspark_datacol_diff_spark.operators.quality import winsorize

    rows = [("lo", v) for v in range(0, 10)] + [
        ("hi", v) for v in range(100, 110)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    per_g = winsorize(df, "v", keys=["g"], lower=0.2, upper=0.8)
    # each group clamps within its own range: no cross-contamination
    vals = {(r["g"], r["v"]): r["v_winsorized"] for r in per_g.collect()}
    # p20 on 10 values selects the 2nd smallest; p80 the 8th
    assert vals[("lo", 0)] == 1 and vals[("hi", 100)] == 101
    assert vals[("lo", 9)] == 7 and vals[("hi", 109)] == 107
    glob = winsorize(df, "v", lower=0.2, upper=0.8)
    gv = {(r["g"], r["v"]): r["v_winsorized"] for r in glob.collect()}
    # global fences pull the two clusters toward each other
    assert gv[("lo", 0)] == gv[("lo", 3)]  # lo tail clamped up
    assert gv[("hi", 109)] == gv[("hi", 106)]  # hi tail clamped down


def test_winsorize_validation(spark):
    import pytest as _pytest

    from pyspark_datacol_diff_spark.operators.quality import winsorize

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with _pytest.raises(ValueError, match="lower"):
        winsorize(df, "v", lower=0.5, upper=0.5)
    with _pytest.raises(ValueError, match="already exists"):
        winsorize(df.withColumn("v_winsorized", df.v), "v")


def test_winsorize_reserved_fence_names(spark):
    import pytest as _pytest

    from pyspark_datacol_diff_spark.operators.quality import winsorize

    df = spark.createDataFrame([(1, 2)], "v long, __lo long")
    with _pytest.raises(ValueError, match="reserved"):
        winsorize(df, "v")


def test_winsorize_null_group_key_gets_its_own_fences(spark):
    """Rows whose group key is NULL form a group: the null-safe fence
    join must clamp them like any other group."""
    from pyspark_datacol_diff_spark.operators.quality import winsorize

    rows = [(None, v) for v in range(0, 10)] + [("g", v) for v in (5, 6, 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        (r["g"], r["v"]): r["v_winsorized"]
        for r in winsorize(df, "v", keys=["g"], lower=0.2, upper=0.8).collect()
    }
    assert out[(None, 0)] == 1 and out[(None, 9)] == 7  # clamped
    assert out[("g", 5)] == 5 and out[("g", 7)] == 7


def test_winsorize_nonidentifier_column_name(spark):
    from pyspark_datacol_diff_spark.operators.quality import winsorize

    df = spark.createDataFrame(
        [("a", 1), ("a", 100)], ["g", "event value"]
    )
    out = winsorize(df, "event value", keys=["g"], lower=0.0, upper=0.5)
    vals = sorted(r["event value_winsorized"] for r in out.collect())
    assert vals == [1, 1]


class TestBenfordFirstDigit:
    """Round-6: exact-integer first-significant-digit audit."""

    def test_matches_pure_python(self, spark):
        from decimal import Decimal

        from pyspark_datacol_diff_spark.operators.quality import (
            benford_first_digit,
        )

        vals = [
            ("a", 185.22), ("a", 9.64), ("a", 0.07), ("a", 106.03),
            ("a", 1.0), ("b", 23.5), ("b", 2999.99), ("b", 0.0001),
            ("b", 250.0), ("b", 25.0), ("b", None), ("b", -5.0),
            ("b", 0.0),
        ]
        df = spark.createDataFrame(vals, "g string, v double")
        got = {
            (r["g"], r["digit"]): (r["n"], r["ppm"])
            for r in benford_first_digit(df, "v", group_by=["g"]).collect()
        }
        from collections import Counter

        cnt: Counter = Counter()
        for g, v in vals:
            if v is None:
                continue
            e = int(Decimal(str(v)).quantize(Decimal("0.0001")) * 10000)
            if e > 0:
                cnt[(g, int(str(e)[0]))] += 1
        tot = Counter()
        for (g, _), n in cnt.items():
            tot[g] += n
        expect = {
            k: (n, n * 1_000_000 // tot[k[0]]) for k, n in cnt.items()
        }
        assert got == expect
        # ppm shares per group sum to <= 1e6 (truncation) and > 9e5
        for g in ("a", "b"):
            s = sum(p for (gg, _), (_, p) in got.items() if gg == g)
            assert 900_000 < s <= 1_000_000

    def test_ungrouped_and_all_nonpositive(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import (
            benford_first_digit,
        )

        df = spark.createDataFrame(
            [(1.0,), (19.0,), (950.0,)], "v double"
        )
        got = {
            r["digit"]: (r["n"], r["ppm"])
            for r in benford_first_digit(df, "v").collect()
        }
        assert got == {1: (2, 666666), 9: (1, 333333)}
        empty = benford_first_digit(
            spark.createDataFrame([(-1.0,), (0.0,)], "v double"), "v"
        )
        assert empty.count() == 0


class TestGiniImpurity:
    """Round-6: exact-rational diversity score."""

    def test_matches_pure_python_and_edges(self, spark):
        from collections import Counter

        from pyspark_datacol_diff_spark.operators.quality import (
            gini_impurity,
        )

        rows = [
            ("u1", "click"), ("u1", "click"), ("u1", "view"),
            ("u2", "click"),                       # pure -> gini 0
            ("u3", "a"), ("u3", "b"), ("u3", "c"), # max spread
            ("u4", None), ("u4", None), ("u4", "x"),  # NULL is a class
        ]
        df = spark.createDataFrame(rows, "user string, etype string")
        got = {
            r["user"]: (r["n"], r["sum_sq"], r["gini_ppm"])
            for r in gini_impurity(df, ["user"], "etype").collect()
        }
        for u in ("u1", "u2", "u3", "u4"):
            cnt = Counter(e for uu, e in rows if uu == u)
            t = sum(cnt.values())
            ss = sum(c * c for c in cnt.values())
            assert got[u] == (t, ss, (t * t - ss) * 1_000_000 // (t * t))
        assert got["u2"][2] == 0
        assert got["u3"][2] == 666666


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


class TestCusum:
    """Round-6: one-sided CUSUM via the running-sum/running-min
    closed form."""

    def test_matches_recursion_and_resets(self, spark):
        from pyspark_datacol_diff_spark.operators.quality import cusum

        series = {
            "a": [5, 5, 9, 9, 2, 2, 2, 30, 1, 1],
            "b": [0, 0, 0, 0, 0],
        }
        rows = [
            (k, i, v) for k, vs in series.items() for i, v in enumerate(vs)
        ]
        df = spark.createDataFrame(rows, "k string, t long, x long")
        got = {
            (r["k"], r["t"]): (r["cusum"], r["alarm"])
            for r in cusum(
                df, ["k"], "t", "x", drift=4, threshold=10
            ).collect()
        }
        for k, vs in series.items():
            s = 0
            for i, v in enumerate(vs):
                s = max(0, s + v - 4)
                assert got[(k, i)] == (s, s > 10), (k, i)

    def test_empty_keys_rejected(self, spark):
        import pytest as _pt

        from pyspark_datacol_diff_spark.operators.quality import cusum

        df = spark.createDataFrame([(1, 1)], "t long, x long")
        with _pt.raises(ValueError, match="keys"):
            cusum(df, [], "t", "x", drift=0, threshold=1)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    ),
    drift=st.integers(min_value=-5, max_value=5),
)
def test_cusum_closed_form_equals_recursion(spark, vals, drift):
    from pyspark_datacol_diff_spark.operators.quality import cusum

    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, t long, x long"
    )
    got = [
        r["cusum"]
        for r in cusum(df, ["k"], "t", "x", drift=drift, threshold=0)
        .orderBy("t")
        .collect()
    ]
    s, exp = 0, []
    for v in vals:
        s = max(0, s + v - drift)
        exp.append(s)
    assert got == exp
