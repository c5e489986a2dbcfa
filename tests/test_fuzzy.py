"""Blocked fuzzy join: match semantics, band pruning, blocking recall
caveat, and the no-cross-product plan shape."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_datacol_diff_spark.operators.fuzzy import fuzzy_join


def _sides(spark):
    left = spark.createDataFrame(
        [("acme corp",), ("zenith ltd",), ("nadir inc",)], "name string"
    )
    right = spark.createDataFrame(
        [
            ("acme c0rp",),   # 1 substitution -> match at max_dist 1
            ("acme corporat",),  # 4 longer -> band-pruned
            ("zenith ltd",),  # exact -> dist 0
            ("xenith ltd",),  # typo in the BLOCK prefix -> missed (documented)
        ],
        "cand string",
    )
    return left, right


def test_matches_within_distance_and_band(spark):
    left, right = _sides(spark)
    got = {
        (r["name"], r["cand"], r["edit_dist"])
        for r in fuzzy_join(left, right, "name", "cand", max_dist=1).collect()
    }
    assert got == {
        ("acme corp", "acme c0rp", 1),
        ("zenith ltd", "zenith ltd", 0),
    }


def test_prefix_typo_escapes_block_the_documented_recall_caveat(spark):
    left, right = _sides(spark)
    # 'xenith ltd' is within distance 1 of 'zenith ltd' but its block
    # key differs -> not matched by a single prefix pass; a custom
    # block function that ignores the first character recovers it
    got = fuzzy_join(left, right, "name", "cand", max_dist=1)
    assert got.filter(F.col("cand") == "xenith ltd").count() == 0
    recovered = fuzzy_join(
        left,
        right,
        "name",
        "cand",
        max_dist=1,
        block=lambda c: F.substring(c, 2, 4),
    )
    assert recovered.filter(F.col("cand") == "xenith ltd").count() == 1


def test_no_cross_product_in_plan(spark):
    from pyspark_datacol_diff_spark import plans as P

    left, right = _sides(spark)
    plan = P.physical_plan(fuzzy_join(left, right, "name", "cand"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_negative_max_dist_rejected(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(left, right, "name", "cand", max_dist=-1)


# --- property: blocked join == brute force within the block contract ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abcd", min_size=4, max_size=7)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(_WORD, min_size=1, max_size=8, unique=True),
    rights=st.lists(_WORD, min_size=1, max_size=8, unique=True),
    max_dist=st.integers(min_value=0, max_value=2),
)
def test_equals_brute_force_restricted_to_blocks(spark, lefts, rights, max_dist):
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for a, b in itertools.product(lefts, rights)
        if a[:4] == b[:4] and lev(a, b) <= max_dist
    }
    l = spark.createDataFrame([(x,) for x in lefts], "name string")
    r = spark.createDataFrame([(x,) for x in rights], "cand string")
    got = {
        (row["name"], row["cand"], row["edit_dist"])
        for row in fuzzy_join(
            l, r, "name", "cand", max_dist=max_dist, block_len=4
        ).collect()
    }
    assert got == want


def test_reserved_blocking_column_rejected(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="__dcd_fuzzy_blk"):
        fuzzy_join(
            left.withColumn("__dcd_fuzzy_blk", F.lit(1)),
            right,
            "name",
            "cand",
        )


def test_multi_pass_recovers_prefix_typo(spark):
    from pyspark_datacol_diff_spark.operators.fuzzy import fuzzy_join_multi

    left, right = _sides(spark)
    # single-pass prefix blocking misses 'xenith ltd'; the default
    # prefix+suffix multi-pass recovers it via the suffix key
    got = {
        (r["name"], r["cand"])
        for r in fuzzy_join_multi(left, right, "name", "cand", max_dist=1).collect()
    }
    assert ("zenith ltd", "xenith ltd") in got
    # and pairs found by BOTH passes emit exactly once
    rows = fuzzy_join_multi(left, right, "name", "cand", max_dist=0).collect()
    assert len(rows) == len({tuple(r) for r in rows}) == 1  # zenith exact


def test_multi_pass_empty_blocks_rejected(spark):
    from pyspark_datacol_diff_spark.operators.fuzzy import fuzzy_join_multi

    left, right = _sides(spark)
    with pytest.raises(ValueError, match="blocks"):
        fuzzy_join_multi(left, right, "name", "cand", blocks=[])


def test_multi_pass_handles_map_columns(spark):
    from pyspark_datacol_diff_spark.operators.fuzzy import fuzzy_join_multi

    left = spark.createDataFrame(
        [("acme corp", {"tier": "gold"})], "name string, attrs map<string,string>"
    )
    right = spark.createDataFrame([("acme c0rp",)], "cand string")
    rows = fuzzy_join_multi(left, right, "name", "cand", max_dist=1).collect()
    assert len(rows) == 1
    assert rows[0]["attrs"] == {"tier": "gold"}


def test_multi_pass_distinct_matches_differing_only_in_map_survive(spark):
    """Round-4 review fix: dedup keys on non-map columns PLUS to_json of
    map columns, so two legitimate distinct matches that differ only in
    a map attribute both survive (single-pass semantics), while the
    same source pair surfaced by several blocking passes still emits
    once."""
    from pyspark_datacol_diff_spark.operators.fuzzy import fuzzy_join_multi

    # two left rows identical in every non-map column, distinct map
    left = spark.createDataFrame(
        [("acme corp", {"tier": "gold"}), ("acme corp", {"tier": "bronze"})],
        "name string, attrs map<string,string>",
    )
    right = spark.createDataFrame([("acme c0rp",)], "cand string")
    rows = fuzzy_join_multi(left, right, "name", "cand", max_dist=1).collect()
    tiers = sorted(r["attrs"]["tier"] for r in rows)
    assert tiers == ["bronze", "gold"], rows
    # and the multi-pass duplicate of ONE source pair still collapses:
    # prefix and suffix blocks both find the exact pair below
    left1 = spark.createDataFrame(
        [("acme corp", {"tier": "gold"})], "name string, attrs map<string,string>"
    )
    right1 = spark.createDataFrame([("acme corp",)], "cand string")
    rows1 = fuzzy_join_multi(left1, right1, "name", "cand", max_dist=1).collect()
    assert len(rows1) == 1


class TestSortedNeighborhood:
    """Round-6: sorted-neighborhood ER candidate generation."""

    def test_pairs_match_brute_force_window(self, spark):
        from pyspark_datacol_diff_spark.operators.fuzzy import (
            sorted_neighborhood_pairs,
        )

        rows = [
            (1, "apple"), (2, "appla"), (3, "apricot"), (4, "avocado"),
            (5, "banana"), (6, "bananna"), (7, "berry"),
            (8, "apple"),  # duplicate key: id tiebreak decides order
        ]
        df = spark.createDataFrame(rows, "rid long, name string")
        got = {
            (r["id_a"], r["id_b"])
            for r in sorted_neighborhood_pairs(
                df, "rid", "name", window=2
            ).collect()
        }
        # brute force: per block (first char), sort by (key, id), pair
        # each row with its next 2 neighbors
        from collections import defaultdict

        blocks = defaultdict(list)
        for rid, name in rows:
            blocks[name[0]].append((name, rid))
        expect = set()
        for b in blocks.values():
            b.sort()
            for i, (_, ra) in enumerate(b):
                for o in (1, 2):
                    if i + o < len(b):
                        expect.add((ra, b[i + o][1]))
        assert got == expect
        # dist filter keeps only true near-matches
        close = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in sorted_neighborhood_pairs(
                df, "rid", "name", window=2, max_dist=1
            ).collect()
        }
        assert close[(2, 1)] == 1 and close[(1, 8)] == 0
        assert all(d <= 1 for d in close.values())

    def test_window_validation(self, spark):
        import pytest as _pt

        from pyspark_datacol_diff_spark.operators.fuzzy import (
            sorted_neighborhood_pairs,
        )

        df = spark.createDataFrame([(1, "a")], "rid long, name string")
        with _pt.raises(ValueError, match="window"):
            sorted_neighborhood_pairs(df, "rid", "name", window=0)
