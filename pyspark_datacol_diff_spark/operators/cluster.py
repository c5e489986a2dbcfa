"""Connected-components clustering — turn near-dup PAIRS into near-dup
GROUPS with a deterministic survivor per group.

Reference scope note: the reference library has no graph/clustering
operator of any kind (its one join is the diff's full-outer equi-join,
``/root/reference/find_datacol_diff.py:96``); this is a north-star
extension. Every pair-producing dedup operator in this engine
(``ngram_jaccard_pairs``, ``minhash_near_dup_pairs``,
``simhash_near_dups``, ``lsh_near_dup_pairs``, ``cosine_pairs``) emits
edges of a similarity graph; an actual dedup must then KEEP ONE document
per connected component. This module is that final step.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, each node takes the min label over itself and
its neighbors; fixpoint = every node labeled with the min node id of its
component. Convergence needs O(diameter) rounds — near-duplicate graphs
are dense clusters of mutually-similar documents, so the diameter is
small (2-4) and the loop runs a handful of rounds. For adversarially
long path graphs, the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014) converges in O(log n) rounds; propagation is the right default
for the dedup workload and keeps every round to two shuffles.

Scale notes (100 TB):

- each round is one join (edges x labels, shuffled on node id) plus one
  min-aggregate — both AQE-planned; a hot component (one label seen by
  millions of edges) is a skewed join key and AQE's skew-join split
  handles it;
- the label frame is one row per node (ids only, bytes per row), NOT
  per document — the document payload is joined back exactly once at
  the end (``drop_near_dups``);
- iterative DataFrame loops grow the logical plan each round;
  ``localCheckpoint`` truncates lineage so round k+1 plans against a
  materialized RDD instead of a k-round plan tree (driver OOM / planner
  blowup otherwise — the classic iterative-Spark pitfall);
- the per-round convergence probe is a single tiny aggregate: min-label
  propagation is monotone (labels only decrease), so ``sum(comp)``
  strictly decreases until the fixpoint and one scalar comparison
  detects it — no expensive frame-vs-frame anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the min
    node id reachable from it. Returns ``(node, comp)`` — one row per
    node that appears in at least one edge (singletons, by definition,
    never appear in a pair list and are trivially their own component).

    Raises ``RuntimeError`` if the fixpoint isn't reached in
    ``max_iter`` rounds (diameter > max_iter — see module docstring for
    the large-star/small-star alternative).
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = e.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("comp").cast("decimal(38,0)")).collect()[0][0]

    for _ in range(max_iter):
        prop = e.join(labels, e["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        new_sum = new_labels.agg(F.sum("comp").cast("decimal(38,0)")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def near_dup_victims(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Ids to DROP from a corpus given near-dup pairs: every member of a
    connected component except its min-id survivor. Returns ``(node)``."""
    comps = connected_components(pairs, src, dst)
    return comps.filter(F.col("node") != F.col("comp")).select("node")


def drop_near_dups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Deduplicated corpus: keep every row except non-survivor members
    of near-dup components (survivor = min id per component — the same
    deterministic-survivor rule as ``drop_exact_dups``).

    The victim list is tiny relative to the corpus (ids only), so the
    anti-join broadcasts; the corpus itself never shuffles.
    """
    victims = near_dup_victims(pairs, src, dst)
    return df.join(
        F.broadcast(victims),
        df[id_col] == victims["node"],
        "left_anti",
    )
