"""Round-8 additions: edge structural similarity (SCAN-style Jaccard),
bipartite HITS, skip-gram PMI, phrase search, hour-of-week seasonality
lift — hand-computed micro-fixtures plus the contract guards."""

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators.cluster import (
    edge_structural_similarity,
    hits_bipartite,
)
from pyspark_datacol_diff_spark.operators.corpus import (
    phrase_match_stats,
    skipgram_pairs,
)
from pyspark_datacol_diff_spark.operators.range_join import seasonality_lift


def _rows(df):
    return [r.asDict() for r in df.collect()]


class TestEdgeStructuralSimilarity:
    def test_triangle_plus_bridge(self, spark):
        # triangle 1-2-3, bridge 3-4. Edge (1,2): common={3},
        # deg1=deg2=2 -> j = 1e6 DIV (2+2-1) = 333333.
        # Edge (3,4): common={} (4's only neighbor is 3), deg3=3,
        # deg4=1 -> jaccard 0 but the edge MUST still be emitted.
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
        )
        got = {
            (r["p1"], r["p2"]): (
                r["common_cnt"], r["deg1"], r["deg2"], r["jaccard_ppm"]
            )
            for r in edge_structural_similarity(e).collect()
        }
        assert got == {
            (1, 2): (1, 2, 2, 333333),
            (1, 3): (1, 2, 3, 250000),
            (2, 3): (1, 2, 3, 250000),
            (3, 4): (0, 3, 1, 0),
        }

    def test_cap_undercounts_deterministically(self, spark):
        # star center 0 with leaves 1..4, plus edge (1,2). With
        # max_degree=2 node 0's list slices to [1,2], so edge (1,2)
        # still sees common neighbor 0 via the leaves' own lists --
        # but 0's wedge expansion only pairs (1,2). Degrees stay FULL.
        e = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)], ["src", "dst"]
        )
        got = {
            (r["p1"], r["p2"]): (r["common_cnt"], r["deg1"], r["deg2"])
            for r in edge_structural_similarity(e, max_degree=2).collect()
        }
        # edge (0,3): 3's sliced list [0] has no pairs; 0's sliced
        # list [1,2] excludes 3 -> common 0 under the cap (true: 0)
        assert got[(0, 1)] == (1, 4, 2)
        assert got[(0, 3)] == (0, 4, 1)
        assert got[(1, 2)] == (1, 2, 2)

    def test_max_degree_guard(self, spark):
        e = spark.createDataFrame([(1, 2)], ["src", "dst"])
        with pytest.raises(ValueError, match="max_degree"):
            edge_structural_similarity(e, max_degree=1)


class TestHitsBipartite:
    def test_hand_computed_two_iterations(self, spark):
        # hubs c1 -> {p1, p2}, c2 -> {p2}.
        # a1: p1=1, p2=2. h1: c1=1+2=3, c2=2.
        # a2: p1=h1(c1)=3, p2=h1(c1)+h1(c2)=5.
        inc = spark.createDataFrame(
            [("c1", "p1"), ("c1", "p2"), ("c2", "p2")], ["hub", "auth"]
        )
        got = {
            r["auth"]: int(r["score"])
            for r in hits_bipartite(inc, iterations=2).collect()
        }
        assert got == {"p1": 3, "p2": 5}

    def test_one_iteration_is_in_degree(self, spark):
        inc = spark.createDataFrame(
            [("c1", "p1"), ("c2", "p1"), ("c1", "p2"), ("c1", "p2")],
            ["hub", "auth"],
        )
        got = {
            r["auth"]: int(r["score"])
            for r in hits_bipartite(inc, iterations=1).collect()
        }
        # duplicate incidence rows deduplicate first
        assert got == {"p1": 2, "p2": 1}

    def test_iterations_guard(self, spark):
        inc = spark.createDataFrame([("c", "p")], ["hub", "auth"])
        with pytest.raises(ValueError, match="iterations"):
            hits_bipartite(inc, iterations=0)


class TestSkipgramPairs:
    def test_hand_computed_window_and_lift(self, spark):
        # doc "x y x": window=2 ordered pairs (x,y) (x,x) (y,x)
        d = spark.createDataFrame([("x y x",)], ["text"])
        got = {
            (r["a"], r["b"]): (r["n_ab"], r["n_a"], r["n_b"], r["lift_ppm"])
            for r in skipgram_pairs(d, "text", window=2, min_count=1).collect()
        }
        # D=3; source marginal of x is 2, target marginal of x is 2
        # (targets: (x,x) and (y,x)); (x,y): 1*3e6 DIV (2*1)=1500000;
        # (x,x): 1*3e6 DIV (2*2)=750000; (y,x): 1*3e6 DIV (1*2)
        assert got == {
            ("x", "y"): (1, 2, 1, 1500000),
            ("x", "x"): (1, 2, 2, 750000),
            ("y", "x"): (1, 1, 2, 1500000),
        }

    def test_window_one_is_adjacent_bigrams(self, spark):
        d = spark.createDataFrame([("a b c",)], ["text"])
        got = {
            (r["a"], r["b"])
            for r in skipgram_pairs(d, "text", window=1, min_count=1).collect()
        }
        assert got == {("a", "b"), ("b", "c")}

    def test_min_count_prunes_after_marginals(self, spark):
        # (a,b) x2 and (a,c) x1: with min_count=2 only (a,b) survives
        # but its n_a marginal must still count the pruned (a,c) pair.
        d = spark.createDataFrame([("a b",), ("a b",), ("a c",)], ["text"])
        rows = _rows(skipgram_pairs(d, "text", window=1, min_count=2))
        assert len(rows) == 1
        r = rows[0]
        assert (r["a"], r["b"], r["n_ab"], r["n_a"]) == ("a", "b", 2, 3)

    def test_guards(self, spark):
        d = spark.createDataFrame([("a b",)], ["text"])
        with pytest.raises(ValueError, match="window"):
            skipgram_pairs(d, "text", window=0)
        with pytest.raises(ValueError, match="min_count"):
            skipgram_pairs(d, "text", min_count=0)


class TestPhraseMatchStats:
    def test_overlapping_matches_count(self, spark):
        d = spark.createDataFrame(
            [(1, "a a a a"), (2, "b a a b"), (3, "a b a b")],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_match_stats(d, "doc_id", "text", ["a", "a"]).collect()
        }
        # doc 1: alignments 0,1,2; doc 2: one at pos 1; doc 3: none
        assert got == {1: (3, 0), 2: (1, 1)}

    def test_case_folding_and_whitespace(self, spark):
        d = spark.createDataFrame(
            [(1, "  Table   SCAN  now")], ["doc_id", "text"]
        )
        rows = _rows(phrase_match_stats(d, "doc_id", "text", ["table", "scan"]))
        assert rows == [{"doc_id": 1, "n_matches": 1, "first_pos": 0}]

    def test_short_docs_excluded(self, spark):
        d = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        assert (
            phrase_match_stats(d, "doc_id", "text", ["a", "a"]).count() == 0
        )

    def test_guards(self, spark):
        d = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="at least one"):
            phrase_match_stats(d, "doc_id", "text", [])
        with pytest.raises(ValueError, match="space-free"):
            phrase_match_stats(d, "doc_id", "text", ["a b"])

    def test_quote_tokens_rejected(self, spark):
        d = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="quotes"):
            phrase_match_stats(d, "doc_id", "text", ["a'b"])


class TestSeasonalityLift:
    def test_hand_computed_lift(self, spark):
        # 2024-01-07 is a Sunday -> how = 0*24 + hour
        d = spark.createDataFrame(
            [
                ("click", "2024-01-07 10:00:00"),
                ("click", "2024-01-07 10:30:00"),
                ("click", "2024-01-07 11:00:00"),
                ("buy", "2024-01-07 11:15:00"),
            ],
            ["event_type", "ts"],
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            (r["type"], r["how"]): (r["n"], r["lift_ppm"])
            for r in seasonality_lift(d, "ts", "event_type").collect()
        }
        # N=4. (click,10): 2*4e6 DIV (3*2) = 1333333
        # (click,11): 1*4e6 DIV (3*2) = 666666
        # (buy,11):   1*4e6 DIV (1*2) = 2000000
        assert got == {
            ("click", 10): (2, 1333333),
            ("click", 11): (1, 666666),
            ("buy", 11): (1, 2000000),
        }

    def test_sunday_midnight_anchor(self, spark):
        d = spark.createDataFrame(
            [("x", "2024-01-07 00:00:00"), ("x", "2024-01-08 01:00:00")],
            ["event_type", "ts"],
        ).withColumn("ts", F.to_timestamp("ts"))
        hows = {
            r["how"] for r in seasonality_lift(d, "ts", "event_type").collect()
        }
        # Sunday 00:00 -> 0; Monday 01:00 -> 25
        assert hows == {0, 25}


from pyspark_datacol_diff_spark.operators.histogram import quantile_rank
from pyspark_datacol_diff_spark.operators.corpus import vocab_growth
from pyspark_datacol_diff_spark.operators.quality import ks_statistic


class TestQuantileRank:
    def test_percent_rank_with_min_rank_ties(self, spark):
        # group g: values 10, 20, 20, 30 -> percent_rank 0, 1/3, 1/3, 1
        d = spark.createDataFrame(
            [("g", 10), ("g", 20), ("g", 20), ("g", 30)], ["k", "v"]
        )
        got = sorted(
            (r["v"], r["pr_ppm"])
            for r in quantile_rank(d, ["k"], "v").collect()
        )
        assert got == [(10, 0), (20, 333333), (20, 333333), (30, 1000000)]

    def test_single_row_group_is_zero(self, spark):
        d = spark.createDataFrame([("g", 42)], ["k", "v"])
        assert quantile_rank(d, ["k"], "v").collect()[0]["pr_ppm"] == 0

    def test_nulls_dropped_and_columns_kept(self, spark):
        d = spark.createDataFrame(
            [("g", 1, "x"), ("g", None, "y")], ["k", "v", "extra"]
        )
        rows = quantile_rank(d, ["k"], "v").collect()
        assert len(rows) == 1 and rows[0]["extra"] == "x"


class TestVocabGrowth:
    def test_first_appearance_charging(self, spark):
        # 2 buckets over ids 0..3: docs 0,1 -> bucket 0; 2,3 -> bucket 1
        d = spark.createDataFrame(
            [(0, "a b"), (1, "a c"), (2, "a d"), (3, "c d")],
            ["doc_id", "text"],
        )
        got = {
            r["bucket"]: (r["n_tokens"], r["new_types"], r["cum_types"])
            for r in vocab_growth(d, "doc_id", "text", n_buckets=2).collect()
        }
        # bucket 0: tokens a,b,a,c (4), new types a,b,c (3)
        # bucket 1: tokens a,d,c,d (4), new types d (1), cum 4
        assert got == {0: (4, 3, 3), 1: (4, 1, 4)}

    def test_empty_bucket_zero_new_types(self, spark):
        d = spark.createDataFrame(
            [(0, "a"), (1, "a")], ["doc_id", "text"]
        )
        got = {
            r["bucket"]: r["new_types"]
            for r in vocab_growth(d, "doc_id", "text", n_buckets=2).collect()
        }
        assert got == {0: 1, 1: 0}

    def test_guard(self, spark):
        d = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="n_buckets"):
            vocab_growth(d, "doc_id", "text", n_buckets=0)


class TestKsStatistic:
    def test_identical_distributions_zero(self, spark):
        d = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 1), ("b", 2)], ["g", "v"]
        )
        r = ks_statistic(d, "g", "v", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"], r["ks_ppm"]) == (2, 2, 0)

    def test_disjoint_distributions_one(self, spark):
        d = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3), ("b", 4)], ["g", "v"]
        )
        r = ks_statistic(d, "g", "v", "a", "b").collect()[0]
        assert r["ks_ppm"] == 1000000

    def test_hand_computed_mid_value(self, spark):
        # a: {1, 3}; b: {2, 3}. At v=1: |1*2 - 0*2|/4 = 0.5
        d = spark.createDataFrame(
            [("a", 1), ("a", 3), ("b", 2), ("b", 3)], ["g", "v"]
        )
        r = ks_statistic(d, "g", "v", "a", "b").collect()[0]
        assert r["ks_ppm"] == 500000

    def test_other_groups_ignored(self, spark):
        d = spark.createDataFrame(
            [("a", 1), ("b", 1), ("z", 99)], ["g", "v"]
        )
        r = ks_statistic(d, "g", "v", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"], r["ks_ppm"]) == (1, 1, 0)


from pyspark_datacol_diff_spark.operators.range_join import (
    interval_overlap_join,
)


class TestIntervalOverlapJoin:
    def _mk(self, spark, rows, cols):
        df = spark.createDataFrame(rows, cols)
        for c in cols:
            if c.endswith("s") or c.endswith("e"):
                df = df.withColumn(c, F.to_timestamp(c))
        return df

    def test_overlap_touching_and_containment(self, spark):
        left = self._mk(
            spark,
            [
                (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
                (2, "2024-01-01 12:00:00", "2024-01-01 13:00:00"),
            ],
            ["lid", "ls", "le"],
        )
        right = self._mk(
            spark,
            [
                ("a", "2024-01-01 10:30:00", "2024-01-01 10:45:00"),  # inside 1
                ("b", "2024-01-01 11:00:00", "2024-01-01 11:30:00"),  # touches 1
                ("c", "2024-01-01 12:30:00", "2024-01-01 14:00:00"),  # spans 2's tail
            ],
            ["rid", "rs", "re"],
        )
        got = {
            (r["lid"], r["rid"]): r["overlap_us"]
            for r in interval_overlap_join(
                left, right,
                left_start="ls", left_end="le",
                right_start="rs", right_end="re",
                right_cols=["rid"], suffix="",
                bucket_seconds=3600,
            ).collect()
        }
        # touching endpoints (b) excluded; containment 15 min; tail 30 min
        assert got == {(1, "a"): 15 * 60 * 1_000_000, (2, "c"): 30 * 60 * 1_000_000}

    def test_multi_bucket_pair_counted_once(self, spark):
        # both intervals span 3 hour-buckets; with bucket_seconds=3600
        # the pair joins in multiple buckets and must dedup to ONE row
        left = self._mk(
            spark, [(1, "2024-01-01 10:00:00", "2024-01-01 13:00:00")],
            ["lid", "ls", "le"],
        )
        right = self._mk(
            spark, [("r", "2024-01-01 09:30:00", "2024-01-01 12:30:00")],
            ["rid", "rs", "re"],
        )
        rows = interval_overlap_join(
            left, right,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            right_cols=["rid"], suffix="",
            bucket_seconds=3600,
        ).collect()
        assert len(rows) == 1
        assert rows[0]["overlap_us"] == int(2.5 * 3600) * 1_000_000

    def test_point_interval_inside(self, spark):
        left = self._mk(
            spark, [(1, "2024-01-01 10:30:00", "2024-01-01 10:30:00")],
            ["lid", "ls", "le"],
        )
        right = self._mk(
            spark, [("r", "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
            ["rid", "rs", "re"],
        )
        rows = interval_overlap_join(
            left, right,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            right_cols=["rid"], suffix="",
            bucket_seconds=3600,
        ).collect()
        assert len(rows) == 1 and rows[0]["overlap_us"] == 0

    def test_keyed_join_restricts_pairs(self, spark):
        left = self._mk(
            spark,
            [("u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
             ("u2", "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
            ["k", "ls", "le"],
        )
        right = self._mk(
            spark, [("u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
            ["k", "rs", "re"],
        )
        rows = interval_overlap_join(
            left, right,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            right_cols=["rs"], on=["k"],
            bucket_seconds=3600,
        ).collect()
        assert len(rows) == 1 and rows[0]["k"] == "u1"

    def test_guard(self, spark):
        d = self._mk(spark, [(1, "2024-01-01 10:00:00", "2024-01-01 11:00:00")], ["i", "ls", "le"])
        with pytest.raises(ValueError, match="bucket_seconds"):
            interval_overlap_join(
                d, d, left_start="ls", left_end="le",
                right_start="ls", right_end="le",
                right_cols=["i"], bucket_seconds=0,
            )

    def test_inverted_intervals_dropped(self, spark):
        left = self._mk(
            spark, [(1, "2024-01-01 11:00:00", "2024-01-01 10:00:00")],
            ["lid", "ls", "le"],
        )
        right = self._mk(
            spark, [("r", "2024-01-01 10:00:00", "2024-01-01 12:00:00")],
            ["rid", "rs", "re"],
        )
        assert interval_overlap_join(
            left, right,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            right_cols=["rid"], suffix="",
            bucket_seconds=3600,
        ).count() == 0
