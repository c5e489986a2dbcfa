"""Blocked fuzzy join: approximate string matching at join scale.

The entity-resolution primitive: match rows whose string keys differ by
a bounded edit distance (typos, OCR noise, re-keyed vendor names). The
naive form is an O(n*m) cross join with ``levenshtein`` — unrunnable at
scale. This operator makes the standard scalable shape explicit:

1. **Block** — both sides key on a cheap deterministic blocking key (a
   character prefix here) and EQUI-join on it, so candidate pairs exist
   only within a block. The join is an ordinary hash/sort-merge equi
   join: shuffle on the block key, no cross product anywhere.
2. **Length band** — inside a block, rows whose lengths differ by more
   than ``max_dist`` cannot be within distance ``max_dist``; the band
   predicate prunes before the expensive metric.
3. **Verify** — ``levenshtein`` (JVM codegen, no UDF) on the surviving
   pairs only.

Recall caveat, stated rather than hidden: an edit inside the first
``block_len`` characters moves the row to a different block and the
pair is missed. Production systems run MULTIPLE blocking passes
(prefix, suffix, phonetic key, sorted-token key) and union the
candidates — each pass is this same operator with a different
``block_col``; the default prefix block is one pass, not the whole
recipe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    max_dist: int = 2,
    block_len: int = 4,
    block: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Equi-blocked edit-distance join: all ``left`` x ``right`` pairs
    with ``levenshtein(left_col, right_col) <= max_dist`` whose strings
    share a blocking key — by default the first ``block_len``
    characters; pass ``block`` (a Column -> Column function applied to
    each side's own string) for a custom key such as a phonetic code
    or sorted-token signature.

    Returns left's columns + right's columns + ``edit_dist``. Name
    collisions between the sides are the caller's to resolve (alias
    before joining), same as a plain ``join``; an input already
    carrying the internal blocking column name is rejected rather than
    silently clobbered and dropped.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    blk = "__dcd_fuzzy_blk"
    for side_name, df in (("left", left), ("right", right)):
        if blk in df.columns:
            raise ValueError(
                f"{side_name} input already has a column named {blk!r}; "
                "rename it before fuzzy_join"
            )
    bl = block if block is not None else (lambda c: F.substring(c, 1, block_len))
    l = left.withColumn(blk, bl(F.col(left_col)))
    r = right.withColumn(blk, bl(F.col(right_col)))
    pairs = l.join(r, blk).where(
        F.abs(F.length(left_col) - F.length(right_col)) <= max_dist
    )
    return (
        pairs.withColumn(
            "edit_dist", F.levenshtein(F.col(left_col), F.col(right_col))
        )
        .where(F.col("edit_dist") <= max_dist)
        .drop(blk)
    )


def fuzzy_join_multi(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    max_dist: int = 2,
    blocks: list | None = None,
) -> DataFrame:
    """Multi-pass blocked fuzzy join — the full recipe the single-pass
    recall caveat points at: run :func:`fuzzy_join` once per blocking
    key in ``blocks`` (Column -> Column functions) and union-distinct
    the passes. Each pass is an independent equi-blocked join — still
    no cross product; total cost is passes x the single-pass cost, and
    recall grows as the keys' blind spots stop overlapping. The default
    prefix + suffix pair catches every single edit on strings longer
    than 8 chars (one edit cannot change both the first and last 4);
    shorter strings with middle edits need a third pass whose key
    stays selective — a phonetic code or sorted-token signature, NOT a
    length bucket (length buckets collapse to a handful of giant
    blocks at scale, re-creating the cross product blocking exists to
    avoid). A pair found by several passes emits once: the dedup key is
    every non-map output column plus ``to_json`` of every MapType
    column (Spark set operations reject MapType, but the serialized
    form is a stable identity — the duplicate rows to collapse are the
    SAME source row pair surfaced by different passes, so their map
    values serialize identically). Two legitimate distinct matches
    that differ only in a map attribute therefore both survive,
    matching single-pass fuzzy_join semantics (round-3 review
    finding).
    """
    if blocks is None:
        blocks = [
            lambda c: F.substring(c, 1, 4),
            lambda c: F.substring(c, -4, 4),
        ]
    if not blocks:
        raise ValueError("blocks must name at least one blocking key")
    out = None
    for bl in blocks:
        p = fuzzy_join(
            left, right, left_col, right_col, max_dist=max_dist, block=bl
        )
        out = p if out is None else out.unionByName(p)
    from pyspark.sql import types as T

    dedup_cols = [
        f.name
        for f in out.schema.fields
        if not isinstance(f.dataType, T.MapType)
    ]
    map_cols = [
        f.name for f in out.schema.fields if isinstance(f.dataType, T.MapType)
    ]
    if not map_cols:
        return out.dropDuplicates(dedup_cols)
    key_cols = [f"__mapkey_{i}" for i in range(len(map_cols))]
    keyed = out
    for kc, mc in zip(key_cols, map_cols):
        keyed = keyed.withColumn(kc, F.to_json(F.col(mc)))
    return keyed.dropDuplicates(dedup_cols + key_cols).drop(*key_cols)


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    *,
    block_fn=None,
    window: int = 3,
    max_dist: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation — the OTHER classic
    entity-resolution blocking (Hernandez & Stolfo, SIGMOD'95): sort
    records by a key and pair each with its next ``window`` neighbors
    in that order. Where equality blocking (:func:`fuzzy_join`) misses
    pairs whose blocking keys differ, the sorted order catches
    near-keys that sort adjacently (shared prefixes, transposed
    suffixes); production systems union both candidate sets.

    Distributed shape: the textbook method's GLOBAL sort is its known
    scale flaw, so the sort is scoped INSIDE a ``block_fn`` partition
    (default: the key's first character) — one keyed window per block
    (never SinglePartition), with candidates generated by ``lead(id,
    o)`` for o in 1..window: a projection over the one sorted
    exchange, no self-join at all. Pairs whose keys sort more than
    ``window`` apart within a block — or into different blocks — are
    missed BY CONTRACT (the recall/cost dial every ER blocking has).

    The within-block order is ``(key, id)`` — the unique id tiebreak
    makes candidate sets deterministic under duplicate keys. With
    ``max_dist`` set, surviving pairs are verified by ``levenshtein``
    (JVM codegen) and the distance is emitted; otherwise every
    neighborhood pair returns with distance NULL.

    Returns ``(id_a, id_b, key_a, key_b, dist)`` with ``id_a`` the
    earlier row in sort order.
    """
    from pyspark.sql import Window

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if block_fn is None:
        block_fn = lambda c: F.substring(c, 1, 1)
    base = df.select(
        F.col(id_col).alias("id_a"),
        F.col(key_col).alias("key_a"),
    ).withColumn("__blk", block_fn(F.col("key_a")))
    # window expressions must sit at the top of a Project — stage the
    # per-offset leads as columns (one shared sort: every lead uses the
    # same window spec), then array+explode them into candidate pairs
    w = Window.partitionBy("__blk").orderBy("key_a", "id_a")
    staged = base.select(
        "id_a",
        "key_a",
        *[
            c
            for o in range(1, window + 1)
            for c in (
                F.lead("id_a", o).over(w).alias(f"__ib{o}"),
                F.lead("key_a", o).over(w).alias(f"__kb{o}"),
            )
        ],
    )
    partners = F.array(
        *[
            F.struct(
                F.col(f"__ib{o}").alias("id_b"),
                F.col(f"__kb{o}").alias("key_b"),
            )
            for o in range(1, window + 1)
        ]
    )
    pairs = (
        staged.withColumn("__p", F.explode(partners))
        .filter(F.col("__p.id_b").isNotNull())
        .select(
            "id_a",
            F.col("__p.id_b").alias("id_b"),
            "key_a",
            F.col("__p.key_b").alias("key_b"),
        )
    )
    if max_dist is None:
        return pairs.withColumn("dist", F.lit(None).cast("int"))
    return pairs.withColumn(
        "dist", F.levenshtein("key_a", "key_b")
    ).filter(F.col("dist") <= max_dist)
