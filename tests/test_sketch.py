"""Heavy-hitter sketch tests: the Misra-Gries superset guarantee under
eviction pressure and adversarial partitioning, exactness of the final
answer vs brute force, and the bounded-output contract."""

import random
from collections import Counter

import pytest

from pyspark_datacol_diff_spark.operators.sketch import (
    heavy_hitters,
    misra_gries_sketch,
)


def _rows(tokens, seed):
    """Pack a flat token stream into random-length array rows (plus a
    few nulls/empties) so batching and null handling are exercised."""
    rnd = random.Random(seed)
    rows, i = [], 0
    while i < len(tokens):
        ln = rnd.randint(0, 9)
        rows.append((tokens[i : i + ln],))
        i += max(ln, 1)
    rows.insert(0, (None,))
    rows.append(([],))
    return rows


def test_heavy_hitters_exact_vs_brute_force(spark):
    """Zipf-ish stream, k far below the distinct count (eviction fires
    constantly), 13 partitions: result == exact brute-force thresholds,
    counts exact."""
    rnd = random.Random(3)
    weights = [1.0 / (i + 1) for i in range(150)]
    toks = [
        f"t{rnd.choices(range(150), weights=weights)[0]}"
        for _ in range(12000)
    ]
    rows = _rows(toks, 5)
    df = spark.createDataFrame(rows, "items array<string>").repartition(13)
    flat = [t for (arr,) in rows if arr for t in arr]
    n = len(flat)
    cnt = Counter(flat)
    for num, den in [(1, 50), (1, 100), (3, 200)]:
        exact = {t: c for t, c in cnt.items() if c * den >= num * n}
        got = {
            r["item"]: r["cnt"]
            for r in heavy_hitters(
                df, "items", phi_num=num, phi_den=den
            ).collect()
        }
        assert got == exact, (num, den)


def test_heavy_hitters_partitioning_invariance(spark):
    """The candidate SET may differ across partitionings; the ANSWER
    must not (the sketch only bounds the second pass's key space)."""
    rnd = random.Random(9)
    toks = [f"w{rnd.randint(0, 80)}" for _ in range(5000)]
    base = spark.createDataFrame(_rows(toks, 1), "items array<string>")
    a = heavy_hitters(base.repartition(2), "items", phi_num=1, phi_den=60)
    b = heavy_hitters(base.repartition(17), "items", phi_num=1, phi_den=60)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_misra_gries_superset_and_bounded_output(spark):
    """Per the MG guarantee every item above N/(k+1) globally must be
    among the candidates, and each partition emits <= k+1 rows."""
    rnd = random.Random(17)
    toks = ["hot"] * 3000 + ["warm"] * 800 + [
        f"c{rnd.randint(0, 500)}" for _ in range(4000)
    ]
    rnd.shuffle(toks)
    k = 10
    nparts = 7
    packed = _rows(toks, 2)
    df = spark.createDataFrame(
        packed, "items array<string>"
    ).repartition(nparts)
    rows = misra_gries_sketch(df, "items", k=k).collect()
    assert len(rows) <= nparts * (k + 1)
    flat = [t for (arr,) in packed if arr for t in arr]
    totals = [r["wt"] for r in rows if r["item"] is None]
    assert sum(totals) == len(flat)
    cands = {r["item"] for r in rows if r["item"] is not None}
    n = len(flat)
    cnt = Counter(flat)
    for t, c in cnt.items():
        if c * (k + 1) > n:  # global count > N/(k+1)
            assert t in cands, t
    assert "hot" in cands and "warm" in cands


def test_heavy_hitters_empty_and_validation(spark):
    empty = spark.createDataFrame([], "items array<string>")
    assert heavy_hitters(empty, "items", phi_num=1, phi_den=10).count() == 0
    nulls = spark.createDataFrame([(None,), ([],)], "items array<string>")
    assert heavy_hitters(nulls, "items", phi_num=1, phi_den=10).count() == 0
    df = spark.createDataFrame([(["a"],)], "items array<string>")
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "items", phi_num=0, phi_den=10)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "items", phi_num=10, phi_den=10)
    with pytest.raises(ValueError, match="superset"):
        heavy_hitters(df, "items", phi_num=1, phi_den=100, k=5)
    with pytest.raises(ValueError, match="k must be"):
        misra_gries_sketch(df, "items", k=0)


def test_heavy_hitters_single_dominant_item(spark):
    """Degenerate stream: one item is the whole corpus — it must be the
    single hitter with its exact count, at any phi."""
    df = spark.createDataFrame(
        [(["x"] * 100,), (["x"] * 50,)], "items array<string>"
    ).repartition(3)
    got = heavy_hitters(df, "items", phi_num=99, phi_den=100).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [("x", 150)]


def test_heavy_hitters_by_exact_vs_brute_force(spark):
    """Two groups with different hot items and different sizes: result
    == per-group exact thresholds; groups never contaminate each
    other's counters."""
    rnd = random.Random(23)
    rows = []
    for g, hot, size in (("a", "HOT_A", 4000), ("b", "HOT_B", 900)):
        toks = [hot] * (size // 5) + [
            f"{g}{rnd.randint(0, 120)}" for _ in range(size)
        ]
        rnd.shuffle(toks)
        i = 0
        while i < len(toks):
            ln = rnd.randint(1, 8)
            rows.append((g, toks[i : i + ln]))
            i += ln
    from pyspark_datacol_diff_spark.operators.sketch import heavy_hitters_by

    df = spark.createDataFrame(
        rows, "g string, items array<string>"
    ).repartition(9)
    flat = {}
    for g, arr in rows:
        flat.setdefault(g, []).extend(arr)
    for num, den in [(1, 25), (1, 60)]:
        want = set()
        for g, toks in flat.items():
            n = len(toks)
            for t, c in Counter(toks).items():
                if c * den >= num * n:
                    want.add((g, t, c))
        got = {
            (r["g"], r["item"], r["cnt"])
            for r in heavy_hitters_by(
                df, "items", ["g"], phi_num=num, phi_den=den
            ).collect()
        }
        assert got == want, (num, den)


def test_heavy_hitters_by_bounded_sketch_and_validation(spark):
    from pyspark_datacol_diff_spark.operators.sketch import (
        heavy_hitters_by,
        misra_gries_sketch_by,
    )

    df = spark.createDataFrame(
        [("a", ["x", "y", "x"]), ("b", ["z"]), ("a", None)],
        "g string, items array<string>",
    ).repartition(3)
    rows = misra_gries_sketch_by(df, "items", ["g"], k=2).collect()
    assert len(rows) <= 3 * 2 * 3  # partitions * keys * (k+1)
    tot = {}
    for r in rows:
        if r["item"] is None:
            tot[r["g"]] = tot.get(r["g"], 0) + r["wt"]
    assert tot == {"a": 3, "b": 1}
    with pytest.raises(ValueError, match="keys"):
        misra_gries_sketch_by(df, "items", [], k=2)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters_by(df, "items", ["g"], phi_num=3, phi_den=2)
    empty = spark.createDataFrame([], "g string, items array<string>")
    assert (
        heavy_hitters_by(empty, "items", ["g"], phi_num=1, phi_den=4).count()
        == 0
    )


def test_heavy_hitters_by_reserved_key_names(spark):
    from pyspark_datacol_diff_spark.operators.sketch import heavy_hitters_by

    df = spark.createDataFrame(
        [("a", ["x"])], "item string, items array<string>"
    )
    with pytest.raises(ValueError, match="reserved"):
        heavy_hitters_by(df, "items", ["item"], phi_num=1, phi_den=4)


def test_null_items_are_not_occurrences(spark):
    """Null array ELEMENTS must be skipped (not counted into N, never a
    candidate) — a null item would otherwise collide with the sketch's
    item-IS-NULL total sentinel and inflate N."""
    from pyspark_datacol_diff_spark.operators.sketch import (
        heavy_hitters,
        misra_gries_sketch,
    )

    df = spark.createDataFrame(
        [(["a", None, "a", None],), (["b", None],), ([None],)],
        "items array<string>",
    ).coalesce(1)
    rows = misra_gries_sketch(df, "items", k=5).collect()
    totals = [r["wt"] for r in rows if r["item"] is None]
    assert totals == [3]  # one sentinel row, nulls excluded from N
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(df, "items", phi_num=1, phi_den=3).collect()
    }
    assert got == {"a": 2, "b": 1}  # thresholds against N=3, not 7


def test_heavy_hitters_by_null_group_key(spark):
    """A NULL group key is a legitimate group: null-safe joins must
    report its hitters against its own total, not drop or crash."""
    from pyspark_datacol_diff_spark.operators.sketch import heavy_hitters_by

    df = spark.createDataFrame(
        [
            ("a", ["x", "x", "y"]),
            (None, ["z", "z", "z", "w"]),
            (None, ["z"]),
        ],
        "g string, items array<string>",
    ).repartition(3)
    got = {
        (r["g"], r["item"]): r["cnt"]
        for r in heavy_hitters_by(
            df, "items", ["g"], phi_num=1, phi_den=2
        ).collect()
    }
    assert got == {("a", "x"): 2, (None, "z"): 4}


def test_merge_mg_summaries_guarantee_and_trim(spark):
    """Split a stream into 3 parts, sketch each, merge with trim: the
    merged summary stays k-bounded, totals are exact, and feeding it to
    the count pass returns exactly the brute-force heavy hitters."""
    from pyspark_datacol_diff_spark.operators.sketch import (
        heavy_hitters_from_summary,
        merge_mg_summaries,
        misra_gries_sketch,
    )

    rnd = random.Random(31)
    weights = [1.0 / (i + 1) for i in range(200)]
    toks = [
        f"m{rnd.choices(range(200), weights=weights)[0]}"
        for _ in range(9000)
    ]
    parts = [toks[i::3] for i in range(3)]
    k = 60
    dfs = [
        spark.createDataFrame(_rows(p, 7 + i), "items array<string>")
        for i, p in enumerate(parts)
    ]
    merged = merge_mg_summaries(
        [misra_gries_sketch(d, "items", k=k) for d in dfs], k=k
    )
    rows = merged.collect()
    assert sum(1 for r in rows if r["item"] is not None) <= k
    flat = []
    for d_rows in ([_rows(p, 7 + i) for i, p in enumerate(parts)]):
        flat += [t for (arr,) in d_rows if arr for t in arr]
    assert sum(r["wt"] for r in rows if r["item"] is None) == len(flat)

    full = spark.createDataFrame(
        [(flat,)], "items array<string>"
    )
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters_from_summary(
            full, "items", rows, phi_num=1, phi_den=50
        ).collect()
    }
    n = len(flat)
    cnt = Counter(flat)
    want = {(t, c) for t, c in cnt.items() if c * 50 >= n}
    assert got == want


def test_merge_mg_summaries_validation(spark):
    from pyspark_datacol_diff_spark.operators.sketch import merge_mg_summaries

    with pytest.raises(ValueError, match="k must be"):
        merge_mg_summaries([], k=0)
    with pytest.raises(ValueError, match="at least one"):
        merge_mg_summaries([], k=3)


def test_grouped_sketch_preserves_big_int_keys_with_nulls(spark):
    """Round-5 advice: a NULLABLE bigint group key arrived as float64
    via Arrow->pandas and lost exactness above 2^53. The mapInArrow
    path must round-trip exact ints and None."""
    from pyspark_datacol_diff_spark.operators.sketch import (
        heavy_hitters_by,
        misra_gries_sketch_by,
    )

    big = 2**53 + 1  # not representable as float64
    df = spark.createDataFrame(
        [(big, ["x", "x", "y"]), (None, ["z", "z"]), (big + 2, ["w"])],
        "g bigint, items array<string>",
    )
    rows = misra_gries_sketch_by(df, "items", ["g"], k=4).collect()
    keys = {r["g"] for r in rows}
    assert keys == {big, None, big + 2}
    assert all(r["g"] is None or isinstance(r["g"], int) for r in rows)
    got = {
        (r["g"], r["item"], r["cnt"])
        for r in heavy_hitters_by(
            df, "items", ["g"], phi_num=1, phi_den=2
        ).collect()
    }
    assert (big, "x", 2) in got
    assert (None, "z", 2) in got
