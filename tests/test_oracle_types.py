"""Oracle output-type compatibility gate (VERDICT r3 demand #3/#8).

The driver's value hash is TYPE-sensitive: DuckDB HUGEINT (what
``sum(BIGINT)`` returns, plain or windowed) converts to pandas float64,
so ``123`` hashes as ``123.0`` and an otherwise-correct oracle fails on
the driver while the stringifying local parity passes. This test makes
the local suite as strict as the driver: every ``oracle_sql()`` entry is
DESCRIBEd by DuckDB (type inference, no execution) and compared against
the Spark query's lazy schema — HUGEINT anywhere, or a float/int family
split on any emitted column, fails here before the driver ever sees it.

Regression provenance: agg_event_stats (red r1 -> green r2 via
CAST(... AS BIGINT)); two_stage_agg_events, incremental_rollup_events,
streaming_incremental_rollup, embed_centroid_lang, pack_sequences_docs
(red r3, same root cause, fixed round 4).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

import __spark_entry__ as ENTRY
from oracle_type_lint import lint_one, make_duck

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE = ENTRY.oracle_sql()
QUERIES = ENTRY.queries()


@pytest.fixture(scope="module")
def duck():
    con = make_duck(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_types_driver_compatible(spark, duck, name):
    rec = lint_one(duck, spark, SF_DIR, name, ORACLE[name], QUERIES[name])
    assert not rec["errors"], "\n".join(rec["errors"])


def test_lint_detects_hugeint(duck, spark):
    """The gate itself must fail on the known-bad pattern (a bare
    sum(BIGINT) emitted uncast) — guards against the lint silently
    weakening."""

    class _F:
        def __init__(self, n, t):
            self.name = n
            self.dataType = type("D", (), {"simpleString": lambda s: t})()

    class _DF:
        def __init__(self, fields):
            self.schema = type("S", (), {"fields": fields})()

    rec = lint_one(
        duck,
        None,
        "",
        "neg",
        "SELECT o_orderstatus k, sum(o_custkey) s FROM orders GROUP BY 1",
        lambda sp, sf: _DF([_F("k", "string"), _F("s", "bigint")]),
    )
    assert any("hugeint" in e for e in rec["errors"])
