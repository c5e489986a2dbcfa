"""Co-occurrence statistics: which items appear together inside a group
— the feature-engineering primitive behind PMI scores, item2vec-style
shifted-PMI matrices, market-basket lift, and tag-affinity features.

Reference scope note: the reference library computes no aggregate
beyond its diff summary (``/root/reference/find_datacol_diff.py``);
this is a north-star extension in the training-pipeline family, sibling
to the basket-explode co-purchase miner.

The engine emits EXACT INTEGER sufficient statistics
``(n_ab, n_a, n_b, n_groups)`` and leaves the floating ratio to the
caller: ``pmi = ln(n_ab * N / (n_a * n_b))``, ``lift``, ``jaccard``,
and the word2vec-equivalent shifted PPMI are all derivable, and the
integers replay bit-identically in any engine (the same
exact-moments-first discipline as the trend/Gram operators).

Scale notes (100 TB):

- presence is deduplicated FIRST (``distinct`` on (group, item)) so a
  group contributing an item a million times still contributes one
  presence row — the pair join's per-group work is bounded by the
  distinct-item count squared, not event counts;
- the pair generation is a self equi-join on the group key with an
  item-order predicate (each unordered pair once) — no cross product;
  a group with k distinct items yields k(k-1)/2 pairs, so callers
  should cap or filter pathological groups upstream (the same
  ``max_df``-style guard the n-gram pair miner exposes);
- marginals are item-grain and BROADCAST onto the pair aggregate —
  deliberately not a window (a hot item's pairs would funnel into one
  partition) and not a re-join against presence rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_stats(
    df: DataFrame,
    group_col: str,
    item_col: str,
) -> DataFrame:
    """Exact co-occurrence counts for every unordered item pair that
    shares at least one group. Returns
    ``(item_a, item_b, n_ab, n_a, n_b, n_groups)`` with
    ``item_a < item_b``; ``n_a``/``n_b`` are the items' group
    frequencies and ``n_groups`` the total distinct-group count —
    everything a PMI/lift/affinity score needs, all integers.
    """
    pres = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    a = pres.select("g", F.col("item").alias("item_a"))
    b = pres.select("g", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    marg = pres.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    totals = pres.select(
        F.count_distinct(F.col("g")).alias("n_groups")
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
        .select("item_a", "item_b", "n_ab", "n_a", "n_b", "n_groups")
    )
