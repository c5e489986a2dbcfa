import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pyspark_datacol_diff_spark-tests")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="dcd_wh_"))
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # plan-assertion tests parse scan metadata (PushedFilters /
        # ReadSchema) out of the plan string; the 100-char default
        # truncates wide scans mid-token and breaks the regexes
        .config("spark.sql.maxMetadataStringLength", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


def make_employee_pair(spark):
    """Synthetic analogue of the reference's employee100/101 golden fixture
    (FIXTURES.md §1) with counts known by construction.

    Base ids 1..120, string columns. s1 keeps ids 1..110, s2 keeps ids
    11..120 with deterministic per-column mutations on matched ids:

      - first_name mutated when id % 3 == 0
      - email      mutated when id % 5 == 0
      - country    mutated when id % 7 == 0
      - gender     never mutated

    Matched ids are 11..110 (100 ids). Expected per-column mismatch
    counts over matched ids: first_name = |{12..110 step 3}|,
    email = |{15..110 step 5}|, country = |{14..110 step 7}|.
    """
    def base_row(i):
        return {
            "id": str(i),
            "first_name": f"name{i}",
            "email": f"user{i}@example.com",
            "gender": "F" if i % 2 == 0 else "M",
            "country": f"country{i % 10}",
        }

    s1_rows = [base_row(i) for i in range(1, 111)]
    s2_rows = []
    for i in range(11, 121):
        r = base_row(i)
        if i % 3 == 0:
            r["first_name"] = f"NAME{i}"
        if i % 5 == 0:
            r["email"] = f"other{i}@example.com"
        if i % 7 == 0:
            r["country"] = "elsewhere"
        s2_rows.append(r)

    matched = range(11, 111)
    expected = {
        "first_name": sum(1 for i in matched if i % 3 == 0),
        "email": sum(1 for i in matched if i % 5 == 0),
        "country": sum(1 for i in matched if i % 7 == 0),
        "gender": 0,
        "s1_only": 10,   # ids 1..10
        "s2_only": 10,   # ids 111..120
        "matched": 100,
    }
    cols = ["id", "first_name", "email", "gender", "country"]
    s1 = spark.createDataFrame([[r[c] for c in cols] for r in s1_rows], cols)
    s2 = spark.createDataFrame([[r[c] for c in cols] for r in s2_rows], cols)
    return s1, s2, expected


@pytest.fixture(scope="session")
def employee_pair(spark):
    return make_employee_pair(spark)
