"""Property-based diff tests (SURVEY.md §5 item b): random perturbation
pairs where every expected count is known by construction.

Hypothesis draws which ids are s1-only / s2-only / modified per column;
the test builds the two sides from that plan and asserts the engine's
flag and per-column counts equal the plan's. Spark jobs are slow per
example, so examples are few but each covers four disposition classes
at once.
"""

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_datacol_diff_spark import compute_dataframe_diff
from pyspark_datacol_diff_spark.operators.diff import diff, flag_counts


@st.composite
def perturbation_plan(draw):
    n = draw(st.integers(min_value=10, max_value=60))
    ids = list(range(n))
    s1_only = set(draw(st.lists(st.sampled_from(ids), unique=True, max_size=5)))
    rest = [i for i in ids if i not in s1_only]
    s2_only = set(
        draw(st.lists(st.sampled_from(rest or [0]), unique=True, max_size=5))
    ) - s1_only if rest else set()
    common = [i for i in ids if i not in s1_only and i not in s2_only]
    diff_a = set(
        draw(st.lists(st.sampled_from(common or [0]), unique=True, max_size=8))
    ) & set(common)
    diff_b = set(
        draw(st.lists(st.sampled_from(common or [0]), unique=True, max_size=8))
    ) & set(common)
    return ids, s1_only, s2_only, diff_a, diff_b


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=perturbation_plan())
def test_counts_match_construction(spark, plan):
    ids, s1_only, s2_only, diff_a, diff_b = plan

    def row(i, side):
        a = f"a{i}x" if (side == 2 and i in diff_a) else f"a{i}"
        b = i + 1000 if (side == 2 and i in diff_b) else i
        return (i, a, b)

    s1 = spark.createDataFrame(
        [row(i, 1) for i in ids if i not in s2_only], "id long, a string, b long"
    )
    s2 = spark.createDataFrame(
        [row(i, 2) for i in ids if i not in s1_only], "id long, a string, b long"
    )
    d = diff(s1, s2, ["id"])
    flags = {r["Flag"]: r["cnt"] for r in flag_counts(d).collect()}

    n_common = len(ids) - len(s1_only) - len(s2_only)
    n_diff_rows = len(diff_a | diff_b)
    assert flags.get("S1_ONLY", 0) == len(s1_only)
    assert flags.get("S2_ONLY", 0) == len(s2_only)
    assert flags.get("", 0) == n_diff_rows
    assert flags.get("NODIFF", 0) == n_common - n_diff_rows

    _, stats = compute_dataframe_diff(s1, s2, ["id"])
    counts = dict(zip(stats["ColName"], stats["Count"]))
    assert counts.get("a", 0) == len(diff_a)
    assert counts.get("b", 0) == len(diff_b)
