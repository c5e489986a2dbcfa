"""Parity against the reference's OWN golden fixture: run this engine on
the original employee100/employee101 CSVs (read-only from
/root/reference/tests/datasets/) and assert the exact per-column mismatch
counts the reference's test suite pins
(reference tests/test_output_level_details.py:28-30) plus the row
dispositions SURVEY.md §5 re-derived by hand (103 common ids, 6 S1_ONLY,
9 S2_ONLY, 20 matched-no-diff).
"""

import os

import pytest

from pyspark_datacol_diff_spark import compute_dataframe_diff
from pyspark_datacol_diff_spark.operators.diff import diff, flag_counts
from pyspark_datacol_diff_spark.sources import read_csv_all_string

DATASETS = "/root/reference/tests/datasets"

GOLDEN_COUNTS = {
    "first_name": 83,
    "last_name": 81,
    "email": 81,
    "ip_address": 81,
    "emp_join_date": 81,
    "emp_country": 77,
    "gender": 49,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATASETS), reason="reference datasets not present"
)


@pytest.fixture(scope="module")
def employee_diff(spark):
    s1 = read_csv_all_string(spark, f"{DATASETS}/employee100.csv")
    s2 = read_csv_all_string(spark, f"{DATASETS}/employee101.csv")
    return compute_dataframe_diff(s1, s2, ["id"])


def test_reference_golden_column_counts(employee_diff):
    _, stats = employee_diff
    got = dict(zip(stats["ColName"], stats["Count"]))
    assert got == GOLDEN_COUNTS


def test_reference_golden_flags(employee_diff):
    diff_df, _ = employee_diff
    flags = {r["Flag"]: r["cnt"] for r in flag_counts(diff_df).collect()}
    assert flags["S1_ONLY"] == 6
    assert flags["S2_ONLY"] == 9
    assert flags["NODIFF"] == 20
    assert flags[""] == 103 - 20  # matched rows with at least one diff


# --- 1000-row fixture: employee1000with2Fail.csv ---------------------------
# Checked into the reference (tests/datasets/) but referenced by no
# reference test. Diffed here against employee101.csv as a wider parity
# pin. Expected values derived INDEPENDENTLY of Spark with pandas
# (string dtypes, null->"" fill, per-column equality over the 112
# common ids): 888 ids only in the 1000-row file, 0 only in
# employee101, 0 matched rows without diffs.

GOLDEN_1000_COUNTS = {
    "first_name": 112,
    "last_name": 112,
    "email": 112,
    "ip_address": 112,
    "emp_join_date": 112,
    "emp_country": 104,
    "gender": 49,
}


@pytest.fixture(scope="module")
def employee1000_diff(spark):
    s1 = read_csv_all_string(spark, f"{DATASETS}/employee1000with2Fail.csv")
    s2 = read_csv_all_string(spark, f"{DATASETS}/employee101.csv")
    return compute_dataframe_diff(s1, s2, ["id"])


def test_reference_1000_column_counts(employee1000_diff):
    _, stats = employee1000_diff
    got = dict(zip(stats["ColName"], stats["Count"]))
    assert got == GOLDEN_1000_COUNTS


def test_reference_1000_flags(employee1000_diff):
    diff_df, _ = employee1000_diff
    flags = {r["Flag"]: r["cnt"] for r in flag_counts(diff_df).collect()}
    assert flags["S1_ONLY"] == 888
    assert flags.get("S2_ONLY", 0) == 0
    assert flags.get("NODIFF", 0) == 0
    assert flags[""] == 112
