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
    stats: dict | None = None,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the min
    node id reachable from it. Returns ``(node, comp)`` — one row per
    node that appears in at least one edge (singletons, by definition,
    never appear in a pair list and are trivially their own component).

    Job economy (the round-4 re-profile): exactly ONE Spark job per
    propagation round. The per-round convergence digest doubles as the
    checkpoint materializer — ``localCheckpoint(eager=False)`` marks
    the label frame for persist-on-first-use, and the digest aggregate
    IS that first use, so one action both truncates lineage and probes
    the fixpoint (the previous eager + separate-collect shape ran two
    jobs per round). The identity-label round is fused into
    initialization: labels start at each node's neighborhood min (what
    round 1 used to compute from identity labels), saving one full
    join + aggregate + materialization round.

    Pass ``stats={}`` to receive ``stats["rounds"]`` — the number of
    propagation JOINs executed (pinned by tests/test_cluster.py; at
    100 TB each round is a cluster-wide shuffle, so the count is a
    first-class performance contract).

    Raises ``RuntimeError`` if the fixpoint isn't reached in
    ``max_iter`` rounds (diameter > max_iter — see module docstring for
    the large-star/small-star alternative).
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # init = one propagation step from identity labels: every node's
    # label is min(self, direct neighbors). Every node appears as `s`
    # in the doubled edge list, so the node set is preserved.
    labels = e.groupBy("s").agg(
        F.least(F.min("d"), F.first("s")).alias("comp")
    ).select(F.col("s").alias("node"), "comp").localCheckpoint(eager=False)
    # accumulate the witness in decimal: a long sum over huge ids can
    # overflow (ANSI mode raises instead of wrapping). This collect is
    # also what materializes `e` and `labels`.
    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    for rounds in range(1, max_iter + 1):
        prop = e.join(labels, e["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        new_sum = new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            if stats is not None:
                stats["rounds"] = rounds
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (lo, hi) form, self-loops
    dropped, deduped."""
    lo, hi = F.least("s", "d"), F.greatest("s", "d")
    return (
        e.select(lo.alias("s"), hi.alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )


def _star_round(e: DataFrame, *, large: bool) -> DataFrame:
    """One large-star or small-star rewrite (Kiveris et al., SoCC'14).

    Gather each node's neighborhood over both edge directions, compute
    ``m = min(neighborhood + self)``, then reconnect:

    - large-star: every STRICTLY LARGER neighbor v > u attaches to m
      (keeps every (v>u, m) edge — shrinks long tails toward minima);
    - small-star: every v <= u neighbor (and u itself) attaches to m —
      collapses local stars onto their centers.

    Both preserve connectivity; alternating them converges to stars
    centered at each component's min in O(log n) rounds.
    """
    nbrs = e.select("s", "d").union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    mins = nbrs.groupBy("s").agg(
        F.least(F.min("d"), F.first("s")).alias("m")
    )
    j = nbrs.join(mins, "s")
    if large:
        out = j.filter(F.col("d") > F.col("s")).select(
            F.col("d").alias("s"), F.col("m").alias("d")
        )
    else:
        out = j.filter(F.col("d") <= F.col("s")).select(
            F.col("d").alias("s"), F.col("m").alias("d")
        ).union(j.select("s", "m").distinct())
    return _canonical(out)


def _edge_digest(e: DataFrame) -> tuple[int, int]:
    """(count, hash-sum) of a canonical edge set — one tiny aggregate
    as the convergence witness (collision-improbable). The hash sum
    accumulates in decimal: signed xxhash64 values summed as longs can
    overflow (ANSI mode raises)."""
    row = e.agg(
        F.count(F.lit(1)),
        F.coalesce(
            F.sum(F.xxhash64("s", "d").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ),
    ).collect()[0]
    return int(row[0]), int(row[1])


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — O(log n) rounds regardless of graph diameter, where
    :func:`connected_components`' label propagation needs O(diameter)
    rounds. Use this for path-/mesh-like graphs; propagation remains
    the cheaper default for the near-dup workload (dense low-diameter
    clusters, 2 shuffles per round vs the star rounds' 3).

    Same output contract as :func:`connected_components`:
    ``(node, comp)`` for every node appearing in an edge.
    """
    # eager=False throughout: the per-round _edge_digest aggregate is
    # the first action on each checkpoint-marked frame, so it both
    # materializes the round's edge set and probes convergence in ONE
    # job (same round-4 economy as connected_components).
    e = _canonical(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    ).localCheckpoint(eager=False)
    # keep the full node set: star rounds contract edges, and an
    # already-settled satellite can drop out of the edge list entirely
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    digest = _edge_digest(e)
    for _ in range(max_iter):
        e = _star_round(_star_round(e, large=True), large=False).localCheckpoint(
            eager=False
        )
        new_digest = _edge_digest(e)
        if new_digest == digest:
            break
        digest = new_digest
    else:
        raise RuntimeError(
            f"star rounds did not converge in {max_iter} iterations"
        )
    # converged edge set is a union of stars (min, member): every
    # non-center node has exactly one neighbor, its component min
    membership = e.select(
        F.col("d").alias("node"), F.col("s").alias("comp")
    ).union(e.select(F.col("s").alias("node"), F.col("s").alias("comp")))
    return (
        nodes.join(membership, "node", "left")
        .groupBy("node")
        .agg(F.coalesce(F.min("comp"), F.first("node")).alias("comp"))
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
    priority_col: str | None = None,
) -> DataFrame:
    """Deduplicated corpus: keep every row except non-survivor members
    of near-dup components. Default survivor = min id per component
    (the same deterministic-survivor rule as ``drop_exact_dups``); with
    ``priority_col`` the survivor is the component member with the
    HIGHEST priority (ties -> smallest id) — the keep-best policy
    (keep the longest / highest-quality copy, not an arbitrary one).

    The victim list is tiny relative to the corpus (ids only), so the
    anti-join broadcasts; the corpus itself never shuffles. The
    priority variant additionally joins the component relation (node
    grain, pair-graph-sized — far smaller than the corpus) against the
    corpus's (id, priority) projection to elect survivors with one
    ``max_by`` aggregate per component.
    """
    if priority_col is None:
        victims = near_dup_victims(pairs, src, dst)
    else:
        comps = connected_components(pairs, src, dst)
        pri = df.select(
            F.col(id_col).alias("node"), F.col(priority_col).alias("__p")
        )
        m = comps.join(pri, "node")
        # survivor = max (priority, -id): highest priority, min-id ties;
        # ids are not assumed positive, so negate inside a struct
        surv = m.groupBy("comp").agg(
            F.max_by("node", F.struct(F.col("__p"), -F.col("node"))).alias(
                "__keep"
            )
        )
        victims = (
            m.join(surv, "comp")
            .filter(F.col("node") != F.col("__keep"))
            .select("node")
        )
    return df.join(
        F.broadcast(victims),
        df[id_col] == victims["node"],
        "left_anti",
    )


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the
    authority score for link graphs (document citation/link dedup
    prioritization, crawl frontier ordering). Deterministic by
    construction: a fixed iteration count (no float-tolerance
    convergence test) and per-node aggregation make the result stable
    across partitionings up to float summation order.

    Each round is the canonical two-shuffle dataflow: ranks join edges
    on src (contribution = rank/out_degree routed to dst), then a
    dst-keyed sum. Dangling nodes (no out-edges) keep receiving mass
    but their own mass is DISCARDED each round — the classic
    simplified Spark PageRank, not the mass-conserving formulation
    that redistributes the dangling sum uniformly. Total mass is not
    conserved, scores differ from true PageRank, and rank ORDER is not
    in general preserved either (nodes fed mainly by dangling
    neighbors are under-weighted relative to the full variant). The
    trade buys one fewer global aggregate + broadcast per round; use a
    mass-conserving implementation when fidelity to true PageRank
    matters rather than a cheap authority ordering.
    Lineage is truncated per round (localCheckpoint) like the
    components loop — same iterative-Spark pitfall, same fix.

    Returns ``(node, rank)`` — one row per node appearing anywhere in
    the edge list.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    # node set and degree-annotated edges are reused EVERY round:
    # persist both, and unpersist in a finally so a failed iteration
    # (executor loss, skew OOM) doesn't leave them pinned for the
    # session's lifetime
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ew = e.join(out_deg, "src").persist()
    try:
        ranks = nodes.withColumn("rank", F.lit(1.0))
        for _ in range(iterations):
            contribs = ew.join(
                ranks, ew["src"] == ranks["node"]
            ).select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
            ranks = (
                nodes.join(summed, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(1.0 - damping)
                        + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        ew.unpersist()
        nodes.unpersist()
    return ranks


def triangle_counts(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (a node in many triangles sits in a tight
    near-dup/community cluster; triangle-free nodes are chain noise).
    Returns ``(node, n_tri)`` for every node in at least one triangle.

    Scale shape — degree-ordered orientation (the standard MapReduce
    triangle algorithm, Suri & Vassilvitskii WWW'11 "Counting triangles
    and the curse of the last reducer"): every undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher one,
    which makes the orientation acyclic AND bounds every node's
    out-degree by O(sqrt(m)). Wedges are generated by self-joining
    oriented edges on their source (per-node work = out_deg^2, so the
    sqrt(m) cap kills the "last reducer" hub blow-up a raw
    neighbor-join suffers), and each wedge closes into a triangle iff
    the oriented edge between its two endpoints exists — one further
    equi-join against the (compact, reused) oriented edge list. Every
    triangle is emitted exactly once (its vertices are totally ordered
    by (degree, id)). Three shuffles total on top of the degree
    computation; no cartesian anywhere.

    The canonical edge set and the oriented edge list are both consumed
    by multiple downstream joins, so each is lineage-truncated
    (``localCheckpoint(eager=False)``, materialized by its first use) —
    without it the upstream pair-mining pipeline would re-execute once
    per reference (measured 3x wall time on the n-gram pair graph).
    """
    e = _canonical(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    ).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("s").alias("n"))
        .union(e.select(F.col("d").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wd = (
        e.join(deg.select(F.col("n").alias("s"), F.col("deg").alias("ds")), "s")
        .join(deg.select(F.col("n").alias("d"), F.col("deg").alias("dd")), "d")
    )
    lt = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("s") < F.col("d"))
    )
    # oriented edge (u -> v) with v's (degree, id) kept for wedge ordering
    o = wd.select(
        F.when(lt, F.col("s")).otherwise(F.col("d")).alias("u"),
        F.when(lt, F.col("d")).otherwise(F.col("s")).alias("v"),
        F.when(lt, F.col("dd")).otherwise(F.col("ds")).alias("dv"),
    ).localCheckpoint(eager=False)
    x, y = o.alias("x"), o.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u"))
        & (
            (F.col("x.dv") < F.col("y.dv"))
            | ((F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v")))
        ),
    ).select(
        F.col("x.u").alias("a"), F.col("x.v").alias("b"), F.col("y.v").alias("c")
    )
    z = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = wedges.join(z, ["b", "c"])
    members = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return members.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
