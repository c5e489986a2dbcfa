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
- iterative DataFrame loops must TRUNCATE LINEAGE each round
  (``localCheckpoint``), not merely ``persist``: a persisted round-k
  frame is re-planned inside round k+1's join, where self-join
  attribute deduplication rewrites the embedded subtree so it no
  longer matches the cache entry — measured: per-round time DOUBLES
  every round (full-chain recompute) under persist chaining, with or
  without unpersist, while checkpointed rounds stay flat;
- checkpointed round state must also be RELEASED: localCheckpoint
  blocks are invisible to ``spark.catalog.clearCache()`` and have no
  DataFrame-level handle, so a long session (or a multi-query
  harness) otherwise accumulates every round of every run — exactly
  the storage leak the round-4 10x smoke measured (33 s co-run vs
  14.5 s isolated for the same plan). Each round therefore frees the
  previous round's checkpoint RDD through its JVM handle
  (:func:`_free_ckpt`) the moment the new round is materialized, and
  the edge frame is freed on convergence — peak executor storage is
  2 label frames + 1 edge frame regardless of round count;
- the per-round convergence probe is a single tiny aggregate — a
  hash-sum digest of the labeling that changes (w.h.p.) whenever any
  label moves — so one scalar comparison detects the fixpoint with no
  expensive frame-vs-frame anti-join, for any orderable id type
  (string ids included).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _free_ckpt(df: DataFrame) -> None:
    """Release the block set behind a ``localCheckpoint``-ed frame.

    The checkpointed frame's analyzed plan is a ``LogicalRDD`` leaf;
    its underlying RDD is the persisted block set, reachable only
    through the JVM handle (no DataFrame-level API, and
    ``clearCache`` does not see checkpoint storage). Unpersisting is
    safe ONLY for frames that will never be read again — a local
    checkpoint has no lineage to recompute from — which is exactly
    the retired-round case in the iterative loops below. Best-effort:
    a non-classic session (Connect) or an unexpected plan shape
    degrades to the old leak-until-context-death behavior, never to
    an error."""
    try:
        _squelch_ckpt_warns(df.sparkSession)
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


_ckpt_warns_squelched = False


def _squelch_ckpt_warns(spark) -> None:
    """Silence the per-release 'RDD was locally checkpointed ... cannot
    be recomputed after unpersisting' WARN: for retired rounds that is
    the INTENDED contract, and the loops below would otherwise emit it
    once per round per run. One-time, best-effort, scoped to the
    CONCRETE RDD classes that emit that message (a checkpointed
    DataFrame's internal RDD is a MapPartitionsRDD / shuffle-row RDD) —
    deliberately NOT the whole org.apache.spark.rdd or storage
    categories, so memory-pressure and cache-eviction warnings from
    MemoryStore/BlockManager stay visible."""
    global _ckpt_warns_squelched
    if _ckpt_warns_squelched:
        return
    try:
        jvm = spark.sparkContext._jvm
        for logger in (
            "org.apache.spark.rdd.MapPartitionsRDD",
            "org.apache.spark.sql.execution.ShuffledRowRDD",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                logger, jvm.org.apache.logging.log4j.Level.ERROR
            )
        _ckpt_warns_squelched = True
    except Exception:
        pass


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

    Job economy (round-4 re-profile, tightened in round 12): exactly
    ONE Spark job per propagation round and NO init job. Each round's
    aggregate carries the node's PREVIOUS label alongside the new one —
    the self-loop row (s == d) in every node's group holds exactly
    label(d) — so the convergence witness is a deterministic
    count-of-changed-labels computed in the round's own job (the same
    collect that materializes the round's ``localCheckpoint``), and
    the separate init-digest job the cross-round hash-compare needed
    (one extra job per call, plus a full hash pass over the label
    frame) is gone. The identity-label round is fused into
    initialization: labels start at each node's neighborhood min (what
    round 1 used to compute from identity labels), saving one full
    join + aggregate + materialization round.

    Storage economy (the round-5 fix): the previous round's checkpoint
    blocks are released (:func:`_free_ckpt`) the moment the new round
    is materialized, and the edge blocks on convergence — peak
    executor storage is 2 label frames + 1 edge frame, independent of
    round count. The RETURNED frame's blocks stay live (a local
    checkpoint cannot be recomputed); they are one (node, comp) id
    pair per node — release via ``_free_ckpt`` after the last read if
    the session is long-lived.

    Pass ``stats={}`` to receive ``stats["rounds"]`` — the number of
    propagation JOINs executed (pinned by tests/test_cluster.py; at
    100 TB each round is a cluster-wide shuffle, so the count is a
    first-class performance contract).

    Raises ``RuntimeError`` if the fixpoint isn't reached in
    ``max_iter`` rounds (diameter > max_iter — see module docstring for
    the large-star/small-star alternative).
    """
    # doubled edge set WITH self-loops: N+(v) = N(v) ∪ {v}. The
    # self-loops make each round a single join→groupBy that reads the
    # label frame exactly once — new_label(v) = min over u∈N+(v) of
    # label(u) — instead of the labels.union(prop) formulation's two
    # scans of the label leaf per round.
    pe = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        pe.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("s"), F.col("b").alias("d")),
                    F.struct(F.col("b").alias("s"), F.col("a").alias("d")),
                    F.struct(F.col("a").alias("s"), F.col("a").alias("d")),
                    F.struct(F.col("b").alias("s"), F.col("b").alias("d")),
                )
            ).alias("x")
        )
        .select("x.s", "x.d")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # init = one propagation step from identity labels: every node's
    # label is min(self, direct neighbors) — the self-loop supplies
    # "self". Every node appears as `s` in e, so the node set is
    # preserved.
    # NOT checkpointed: the init frame is consumed exactly once (round
    # 1's join inlines it), so a checkpoint would only persist blocks
    # that are retired the moment round 1 materializes. The `e`
    # checkpoint above is what truncates the expensive upstream.
    labels = (
        e.groupBy("s")
        .agg(F.min("d").alias("comp"))
        .select(F.col("s").alias("node"), "comp")
    )
    try:
        # Convergence witness, computed INSIDE each round's job: the
        # self-loop row (s == d) in node d's group carries d's previous
        # label, so `comp != __old` is an exact per-node changed flag —
        # deterministic (no hash-collision caveat), type-agnostic, and
        # free of the init-digest job the cross-round hash-compare
        # needed. A NULL node id never matches the equi-join (its
        # self-loop row is dropped, so its __old is NULL every round);
        # such a group is excluded from the changed count and watched
        # through a hash of its label instead, compared across rounds —
        # one extra confirming round for NULL-id graphs only, identical
        # round counts everywhere else.
        changed_cnt = F.count(
            F.when(
                F.col("node").isNotNull()
                & ~F.col("comp").eqNullSafe(F.col("__old")),
                True,
            )
        )
        null_grp_dig = F.max(
            F.when(F.col("node").isNull(), F.xxhash64("comp"))
        )
        prev_null_dig = object()  # sentinel: no prior round observed

        for rounds in range(1, max_iter + 1):
            new_labels = (
                e.join(labels, e["s"] == labels["node"])
                .groupBy(e["d"])
                .agg(
                    F.min("comp").alias("comp"),
                    F.min(
                        F.when(e["s"] == e["d"], F.col("comp"))
                    ).alias("__old"),
                )
                .select(F.col("d").alias("node"), "comp", "__old")
                .localCheckpoint(eager=False)
            )
            # this collect materializes the round's checkpoint (and, in
            # round 1, `e` and the init labels) — still one job/round
            row = new_labels.agg(changed_cnt, null_grp_dig).collect()[0]
            _free_ckpt(labels)  # retired round: never read again
            labels = new_labels
            if row[0] == 0 and (row[1] is None or row[1] == prev_null_dig):
                if stats is not None:
                    stats["rounds"] = rounds
                return labels.select("node", "comp")
            prev_null_dig = row[1]
        _free_ckpt(labels)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter)"
        )
    finally:
        _free_ckpt(e)


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (lo, hi) form, self-loops
    dropped, deduped."""
    lo, hi = F.least("s", "d"), F.greatest("s", "d")
    return (
        e.select(lo.alias("s"), hi.alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )


def _star_round(e: DataFrame, *, large: bool, dedup: bool = True) -> DataFrame:
    """One large-star or small-star rewrite (Kiveris et al., SoCC'14).

    ``dedup=False`` skips the output canonical ``distinct`` — correct
    when the consumer is the NEXT star round: its neighborhood-min
    window is duplicate-insensitive, so only the final round of an
    iteration needs the dedup to bound edge-set growth. Fusing the two
    rounds this way removes one full shuffle per iteration (measured on
    the 260-edge near-dup graph where per-round fixed cost dominates).

    Gather each node's neighborhood over both edge directions, compute
    ``m = min(neighborhood + self)``, then reconnect:

    - large-star: every STRICTLY LARGER neighbor v > u attaches to m
      (keeps every (v>u, m) edge — shrinks long tails toward minima);
    - small-star: every v <= u neighbor (and u itself) attaches to m —
      collapses local stars onto their centers.

    Both preserve connectivity; alternating them converges to stars
    centered at each component's min in O(log n) rounds.

    Plan shape: the input edge frame is referenced exactly ONCE —
    direction-doubling is an explode, the neighborhood min is a window
    aggregate (one shuffle, no self-join), and the small-star's dual
    emission is a second explode — so the logical plan across the
    iteration loop grows linearly with round count instead of
    multiplying per round (the union/join formulation referenced its
    inputs twice per round: exponential tree growth, planner OOM on
    high-diameter graphs once lineage is no longer checkpoint-
    truncated).
    """
    from pyspark.sql.window import Window

    nbrs = e.select(
        F.explode(
            F.array(
                F.struct(F.col("s"), F.col("d")),
                F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
            )
        ).alias("x")
    ).select("x.s", "x.d")
    j = nbrs.withColumn(
        "m",
        F.least(F.min("d").over(Window.partitionBy("s")), F.col("s")),
    )
    if large:
        out = j.filter(F.col("d") > F.col("s")).select(
            F.col("d").alias("s"), F.col("m").alias("d")
        )
    else:
        # per row: always (s, m); additionally (d, m) when d <= s —
        # array_compact drops the null arm, one explode, input
        # referenced once
        emit = F.array_compact(
            F.array(
                F.struct(F.col("s").alias("p"), F.col("m").alias("q")),
                F.when(
                    F.col("d") <= F.col("s"),
                    F.struct(F.col("d").alias("p"), F.col("m").alias("q")),
                ),
            )
        )
        out = (
            j.select(F.explode(emit).alias("x"))
            .select(F.col("x.p").alias("s"), F.col("x.q").alias("d"))
        )
    if not dedup:
        # intermediate round: duplicates and self-loops are harmless to
        # the next round's min window (self is already in `least`), and
        # orientation is erased by its direction-doubling explode
        return out
    return _canonical(out)


def _is_min_star_forest(e: DataFrame) -> bool:
    """Convergence witness for the star alternation, decidable on a
    SINGLE round's output (the digest-compare it replaces needed one
    extra full iteration just to observe "nothing changed"): a
    canonical edge set (s < d, distinct, loop-free) is a fixpoint of
    large/small alternation iff it is a star forest — no satellite
    attaches to two centers and no node is both center and satellite.
    Both violations are visible node-locally, so ONE node-keyed
    aggregate over the edge endpoints decides it; `limit(1)` stops the
    scan at the first counterexample. (A non-forest set is never
    stable: e.g. (a,x),(b,x) re-wires x's star to (b,a) next round —
    exactly the witness's multi-center case.)"""
    stat = e.select(
        F.col("s").alias("node"),
        F.lit(1).alias("ns"),
        F.lit(0).alias("nd"),
    ).unionAll(
        e.select(
            F.col("d").alias("node"),
            F.lit(0).alias("ns"),
            F.lit(1).alias("nd"),
        )
    )
    bad = (
        stat.groupBy("node")
        .agg(F.sum("ns").alias("ns"), F.sum("nd").alias("nd"))
        .filter(
            (F.col("nd") > 1) | ((F.col("ns") > 0) & (F.col("nd") > 0))
        )
    )
    return len(bad.limit(1).collect()) == 0


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
    ``(node, comp)`` for every node appearing in an edge. The result
    plan reads the converged star edge set and the INITIAL canonical
    edge set (both checkpointed and edge-list-sized; the node set is
    derived from the latter inside the caller's action — round 12, one
    job and one checkpoint fewer per call); their blocks stay live
    after the caller's action — ``_free_ckpt`` them in long-lived
    sessions (the bench/smoke harnesses do, via ``quiesce_session``).
    """
    # localCheckpoint per round (lineage truncation — see the module
    # docstring for why persist chaining recomputes the whole chain),
    # with the retired round's blocks freed as soon as the new round
    # is materialized by its _edge_digest (still ONE job per round).
    e0 = _canonical(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    ).localCheckpoint(eager=False)
    # the full node set: star rounds contract edges, and an already-
    # settled satellite can drop out of the edge list entirely. Derived
    # LAZILY from the initial checkpointed edge set and computed inside
    # the caller's final action (round 12 — it previously ran as its
    # own eager count job plus a checkpoint of its own); the initial
    # `e0` blocks therefore stay live through the loop (edge-list-
    # sized, one extra frame of peak storage) instead of being freed
    # after round 1.
    nodes = (
        e0.select(F.col("s").alias("node"))
        .union(e0.select(F.col("d").alias("node")))
        .distinct()
    )
    # the witness job doubles as the checkpoint materializer (the role
    # _edge_digest used to play); an already-star-forest input skips
    # the loop entirely, and each round stops the moment ITS OWN output
    # is a forest — one fewer full iteration than digest-compare, which
    # is a whole round of shuffles on the near-dup graphs (measured:
    # their edge set settles in round 1 and digest-compare paid round 2
    # purely to see it).
    e = e0
    done = _is_min_star_forest(e)
    if not done:
        for _ in range(max_iter):
            new_e = _star_round(
                _star_round(e, large=True, dedup=False), large=False
            ).localCheckpoint(eager=False)
            done = _is_min_star_forest(new_e)
            if e is not e0:  # e0 feeds the node set until the caller acts
                _free_ckpt(e)
            e = new_e
            if done:
                break
        else:
            if e is not e0:
                _free_ckpt(e)
            _free_ckpt(e0)
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


def _components(pairs: DataFrame, src: str, dst: str, variant: str) -> DataFrame:
    """Dispatch between the two CC algorithms: ``propagation`` (the
    dedup default — O(diameter) rounds, 2 shuffles each, right for
    dense low-diameter near-dup clusters) and ``star`` (O(log n)
    rounds regardless of diameter — right for chain-like pair graphs,
    e.g. weak-threshold LSH candidates whose transitive chains exceed
    propagation's max_iter)."""
    if variant == "star":
        return connected_components_star(pairs, src, dst)
    if variant == "propagation":
        return connected_components(pairs, src, dst)
    raise ValueError(f"cc_variant must be propagation|star, got {variant!r}")


def near_dup_victims(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    cc_variant: str = "propagation",
) -> DataFrame:
    """Ids to DROP from a corpus given near-dup pairs: every member of a
    connected component except its min-id survivor. Returns ``(node)``."""
    comps = _components(pairs, src, dst, cc_variant)
    return comps.filter(F.col("node") != F.col("comp")).select("node")


def drop_near_dups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    priority_col: str | None = None,
    cc_variant: str = "propagation",
) -> DataFrame:
    """Deduplicated corpus: keep every row except non-survivor members
    of near-dup components. Default survivor = min id per component
    (the same deterministic-survivor rule as ``drop_exact_dups``); with
    ``priority_col`` the survivor is the component member with the
    HIGHEST priority (ties -> smallest id) — the keep-best policy
    (keep the longest / highest-quality copy, not an arbitrary one).

    The victim anti-join is NOT hint-forced to broadcast: victims are
    id-only rows but their COUNT scales with the corpus's duplication
    rate (a 30-50%-duplicated web crawl has a data-sized victim list),
    so AQE picks broadcast from the measured size when the list is
    small and a shuffled anti-join otherwise. The
    priority variant additionally joins the component relation (node
    grain, pair-graph-sized — far smaller than the corpus) against the
    corpus's (id, priority) projection to elect survivors with one
    ``max_by`` aggregate per component.
    """
    if priority_col is None:
        victims = near_dup_victims(pairs, src, dst, cc_variant=cc_variant)
    else:
        comps = _components(pairs, src, dst, cc_variant)
        pri = df.select(
            F.col(id_col).alias("node"), F.col(priority_col).alias("__p")
        )
        m = comps.join(pri, "node")
        # survivor = highest priority, min-id ties — elected in two
        # steps (max priority per component, then min node at that
        # priority) rather than max_by over struct(__p, -node): node
        # negation restricted ids to numeric types, while min/max
        # order any orderable id type (strings included). eqNullSafe
        # keeps a survivor even when every member's priority is null.
        best = m.groupBy("comp").agg(F.max("__p").alias("__bp"))
        surv = (
            m.join(best, "comp")
            .filter(F.col("__p").eqNullSafe(F.col("__bp")))
            .groupBy("comp")
            .agg(F.min("node").alias("__keep"))
        )
        victims = (
            m.join(surv, "comp")
            .filter(F.col("node") != F.col("__keep"))
            .select("node")
        )
    return df.join(
        victims,
        df[id_col] == victims["node"],
        "left_anti",
    )


def _pagerank_frames(
    edges: DataFrame, src_col: str, dst_col: str, deg_via_window: bool,
    weight_col: str | None = None, symmetric: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared PageRank setup: persisted ``(e, nodes, ew)`` frames.

    The edge list is scanned several times before the loop even starts
    (node set reads src and dst, degree attachment) — persist it so an
    expensive upstream (pair mining feeds this in the dedup pipelines)
    runs once, not once per derivation. nodes/ew are additionally
    persisted in their own right: they are reused EVERY round, and the
    callers unpersist everything in a ``finally`` so a failed
    iteration (executor loss, skew OOM) doesn't leave blocks pinned
    for the session's lifetime.

    Degree attachment, two physical strategies. The round-7 src
    repartition (below) changed which one wins: with ``e`` already
    hash-partitioned on src, both paths read co-located input, and the
    aggregate+join formulation is the NEW DEFAULT.

    - ``deg_via_window=False`` (default): map-side-combined
      ``groupBy(src).count()`` joined back — both sides read the
      src-partitioned persisted ``e`` with no further exchange, and
      every stage over the big side stays AQE-splittable (a mega-hub
      never has to fit one window task). Measured 4.6 -> 2.9 s on the
      sf0.1 co-purchase graph (iters=3) vs the window path once the
      src repartition landed.
    - ``deg_via_window=True``: ``count() over partitionBy(src)`` —
      the round-6 winner when the window's exchange doubled as the
      only src partitioning; kept for graphs where the single extra
      join materially hurts, with the documented trade that a
      mega-hub's out-edges must co-locate in one window task.
    """
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        # a non-positive, NULL, or fractional weight breaks the
        # rank-division semantics silently — fail loudly, plan-side
        # (the kmeans null-vector convention). The guard validates the
        # POST-cast value AND integrality: a weight in (0, 1) passes a
        # pre-cast `> 0` check yet truncates to 0, giving deg=0 and a
        # DIVIDE_BY_ZERO (ANSI) or silently dropped contributions.
        w_long = F.col(weight_col).cast("long")
        cols.append(
            F.when(
                (w_long >= 1)
                & (
                    w_long.cast("double")
                    == F.col(weight_col).cast("double")
                ),
                w_long,
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "pagerank weights must be positive integers, got "
                        ),
                        F.col(weight_col).cast("string"),
                    )
                )
            )
            .alias("w")
        )
    # hash-repartition by src BEFORE persisting: (a) the degree window
    # and every round's ranks-x-edges join need src partitioning — this
    # shuffle is the one they would each have paid anyway, paid once;
    # (b) upstream unions/explodes CONCATENATE partition lists (a
    # doubled co-purchase edge list arrived as 128 partitions of a
    # 7k-edge graph), and persist/localCheckpoint pin that count for
    # every round's stages — measured ~400 tasks/round of pure
    # scheduling. AQE can still coalesce this repartition's output
    # (REPARTITION_BY_COL allows coalescing), so tiny graphs collapse
    # to a handful of tasks while huge ones keep full width.
    e = edges.select(*cols).repartition("src").persist()
    agg = (
        F.sum("w") if weight_col is not None else F.count(F.lit(1))
    )
    if symmetric:
        # caller asserts every edge appears in both directions (the
        # symmetrized co-purchase graphs), so distinct sources ARE the
        # node set — half the scan, one union branch fewer
        nodes = e.select(F.col("src").alias("node")).distinct().persist()
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
    if deg_via_window:
        ew = e.withColumn(
            "deg", agg.over(Window.partitionBy("src"))
        ).persist()
    else:
        out_deg = e.groupBy("src").agg(agg.alias("deg"))
        ew = e.join(out_deg, "src").persist()
    return e, nodes, ew


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_interval: int = 1,
    deg_via_window: bool = False,
    symmetric: bool = False,
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
    Rank frames are checkpointed every ``checkpoint_interval`` rounds
    (lineage truncation — see the module docstring) and the previous
    checkpoint's blocks are freed, like the components loop — same
    iterative-Spark pitfall (exponential re-evaluation / unbounded
    storage growth), same fix. The FINAL round always checkpoints
    eagerly (the ``finally`` unpersists the shared edge/node frames,
    so the returned frame must already be materialized). An eager
    checkpoint is a full job, so for SHORT fixed iteration counts a
    larger interval collapses the loop into one job over a few chained
    shuffles — measured 6.1 -> 4.7 s for 3 rounds on the sf0.1
    co-purchase graph with interval >= iterations (and 4.7 -> 4.0 s
    with the default windowed degree attachment — see
    :func:`_pagerank_frames` for that trade); the default interval of
    1 stays right for long runs, where unbounded lineage is the
    bigger enemy.

    Returns ``(node, rank)`` — one row per node appearing anywhere in
    the edge list.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if checkpoint_interval < 1:
        raise ValueError(
            f"checkpoint_interval must be >= 1, got {checkpoint_interval}"
        )
    e, nodes, ew = _pagerank_frames(
        edges, src_col, dst_col, deg_via_window, symmetric=symmetric
    )
    try:
        ranks = nodes.withColumn("rank", F.lit(1.0))
        prev = None
        for i in range(iterations):
            contribs = ew.join(
                ranks, ew["src"] == ranks["node"]
            ).select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
            ranks = nodes.join(summed, "node", "left").select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                ).alias("rank"),
            )
            if i == iterations - 1 or (i + 1) % checkpoint_interval == 0:
                ranks = ranks.localCheckpoint(eager=True)
                if prev is not None:
                    _free_ckpt(prev)  # retired round: never read again
                prev = ranks
    finally:
        ew.unpersist()
        nodes.unpersist()
        e.unpersist()
    return ranks


def pagerank_exact(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    checkpoint_interval: int = 1,
    deg_via_window: bool = False,
    seed_pred=None,
    weight_col: str | None = None,
    symmetric: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank in SCALED INTEGER arithmetic — the
    oracle-replayable variant of :func:`pagerank`. Ranks are longs in
    units of ``1/scale``; each round every node sends
    ``rank div out_degree`` (integer division) to each out-neighbor
    and receives ``(scale * (damping_den - damping_num)) div
    damping_den + (damping_num * incoming_sum) div damping_den``.

    ``seed_pred`` (a callable ``node Column -> boolean Column``) turns
    this into PERSONALIZED PageRank: initial mass and the per-round
    reset land ONLY on nodes satisfying the predicate (NULL counts as
    non-seed), so ranks measure proximity to the seed set — the
    seed-relevance ordering (crawl frontiers, seed-document expansion
    in a training-data pipeline) rather than global authority. Same
    dataflow, same exact-integer replayability; the predicate itself
    must be engine-portable for the oracle to unroll it.

    ``weight_col`` makes the walk EDGE-WEIGHTED: each edge receives
    ``(rank * w) div W_out`` instead of ``rank div out_degree`` (W_out
    = the source's total outgoing weight) — co-occurrence counts,
    similarity scores (pre-quantized to ints), link multiplicities.
    Weights must be POSITIVE integers (a plan-side guard raises on
    NULL/non-positive); overflow bound tightens to ``max_rank *
    max_weight < 2^63`` — at default scale, weights into the tens of
    thousands on million-node graphs.

    Why a second variant exists: the float formulation's per-node sums
    run in nondeterministic partition order, so its low bits vary
    run-to-run — fine for ranking, unusable for a hash-exact oracle or
    a bit-for-bit incremental replay. Integer addition is exact and
    associative, and both divisions here have non-negative operands
    (trunc == floor), so this variant is deterministic bit-for-bit
    across partitionings and engines: the same unrolled iterations in
    ANSI SQL reproduce it hash-exactly. The cost is quantization —
    each hop truncates up to ``out_degree - 1 + damping_den - 1``
    rank units, so with the default ``scale`` of 1e6 the result
    tracks the same simplified (dangling-mass-discarding, see
    :func:`pagerank`) float recursion to ~1e-6 relative error per
    hop; raise ``scale`` for deeper iteration counts.

    Same dataflow and scale shape as :func:`pagerank` (two shuffles
    per round — ranks-x-edges join keyed on src, then a dst-keyed
    sum), same iterative-loop hygiene (``localCheckpoint`` lineage
    truncation every ``checkpoint_interval`` rounds with the final
    round always eager, retired rounds freed via :func:`_free_ckpt`,
    reused node/edge frames persisted and released in ``finally`` —
    see :func:`pagerank` for the short-loop interval trade).
    Overflow bound: ``damping_num * total_mass`` must fit in int64,
    i.e. ``node_count * scale * damping_num < 2^63`` — at the default
    scale that is ~10^11 nodes, far past any dedup pair graph.

    Returns ``(node, rank)`` with ``rank`` long — one row per node
    appearing anywhere in the edge list.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError(
            f"need 0 < damping_num < damping_den, got "
            f"{damping_num}/{damping_den}"
        )
    if scale < damping_den:
        raise ValueError(
            f"scale must be >= damping_den, got {scale} < {damping_den}"
        )
    if checkpoint_interval < 1:
        raise ValueError(
            f"checkpoint_interval must be >= 1, got {checkpoint_interval}"
        )
    reset = (scale * (damping_den - damping_num)) // damping_den
    e, nodes, ew = _pagerank_frames(
        edges, src_col, dst_col, deg_via_window, weight_col,
        symmetric=symmetric,
    )
    contrib_expr = (
        "(rank * w) div deg" if weight_col is not None else "rank div deg"
    )
    try:
        if seed_pred is None:
            zeros = nodes.select(
                "node",
                F.lit(0).cast("long").alias("c"),
                F.lit(True).alias("__in_base"),
            )
            ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
            reset_expr = f"{reset}L"
        else:
            seeded = nodes.withColumn("__seed", seed_pred(F.col("node")))
            zeros = seeded.select(
                "node",
                F.lit(0).cast("long").alias("c"),
                F.col("__seed").alias("__in_base"),
            )
            ranks = seeded.select(
                "node",
                F.when(F.col("__seed"), F.lit(scale))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("rank"),
            )
            reset_expr = f"(CASE WHEN __seed THEN {reset}L ELSE 0L END)"
        prev = None
        for i in range(iterations):
            # shuffle_hash on the rank side: ew is persisted already
            # hash-partitioned on src, so a hash build from the
            # node-grain rank frame probes it with ZERO exchange or
            # sort of the edge list — sort-merge would re-sort the big
            # side every round.
            contribs = ew.join(
                ranks.hint("shuffle_hash"), ew["src"] == ranks["node"]
            ).select(
                F.col("dst").alias("node"),
                F.expr(contrib_expr).alias("c"),
                F.lit(None).cast("boolean").alias("__in_base"),
            )
            # union-then-aggregate instead of aggregate-then-left-join:
            # the zero-contribution row per node keeps every node in
            # the result AND carries the seed flag (max ignores the
            # contrib rows' NULLs), folding what was [groupBy + join
            # base] — two shuffles — into ONE node-keyed aggregate.
            merged = zeros.unionByName(contribs)
            agg_cols = [F.sum("c").alias("s")]
            if seed_pred is not None:
                agg_cols.append(F.max("__in_base").alias("__seed"))
            ranks = merged.groupBy("node").agg(*agg_cols).select(
                "node",
                F.expr(
                    f"{reset_expr} + ({damping_num}L * s) "
                    f"div {damping_den}L"
                ).alias("rank"),
            )
            if i == iterations - 1 or (i + 1) % checkpoint_interval == 0:
                ranks = ranks.localCheckpoint(eager=True)
                if prev is not None:
                    _free_ckpt(prev)  # retired round: never read again
                prev = ranks
    finally:
        ew.unpersist()
        nodes.unpersist()
        e.unpersist()
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
    by multiple downstream joins, so each is checkpointed lazily —
    without that the upstream pair-mining pipeline would re-execute
    once per reference (measured 3x wall time on the n-gram pair
    graph); both materialize inside the caller's single action (an
    eager variant was measured 1.8x slower at 10x: the materialization
    job re-runs the upstream pipeline the final action would have run
    anyway). The blocks stay live after the action — release them with
    ``free_persistent_rdds`` in long-lived sessions.
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
    # 3-arm union, NOT an explode: each arm re-runs the wedge-close
    # join, but the arms are independent broadcast joins over the
    # CHECKPOINTED o (cheap to re-probe) and run as parallel stages —
    # A/B-measured 2.9 s (union) vs 3.1 s (explode) at sf0.1 in r11.
    members = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return members.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def kcore_peel(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 3,
    rounds: int = 4,
) -> DataFrame:
    """Bounded-round k-core peeling over an undirected graph: each
    round drops every node whose CURRENT degree is below ``k``, then
    drops edges touching a dropped node; after ``rounds`` rounds the
    survivors are a SUPERSET of the true k-core that shrinks toward it
    monotonically (the true core is the fixpoint; each round can only
    remove non-core nodes, never core ones). Fixed rounds keep the
    operator oracle-replayable (an unrolled SQL round per peel) and
    the job count data-independent — the same bounded-iteration
    contract as :func:`pagerank_exact`; raise ``rounds`` for deeper
    chains of hanging tendrils. Dense-core extraction is the graph
    curation step that strips low-support noise off a near-dup /
    co-occurrence graph before community work.

    Input edges are canonicalized exactly like the CC family
    (undirected, deduplicated, self-loops dropped), so a multi-edge
    counts once toward degree. Returns ``(node, degree)`` for the
    surviving nodes with their degree inside the surviving subgraph.

    Scale shape per round: one map-side-combined degree aggregate +
    two broadcast-eligible semi joins of the edge list against the
    (shrinking) survivor set — no windows, no driver data round-trip.
    Each round's edge frame is ``localCheckpoint``-ed (lineage
    TRUNCATED — persist chaining re-plans the whole nested join tree
    each round, the exact blow-up the module docstring documents) and
    the retired round's blocks are freed via :func:`_free_ckpt`, the
    CC loop's storage hygiene.
    """
    if k < 1 or rounds < 1:
        raise ValueError(f"need k >= 1 and rounds >= 1, got {k}/{rounds}")
    e = _canonical(
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    )
    # undirected degree: count each edge from both endpoints. The
    # doubling is an explode (ONE reference to e), not a two-arm
    # union — the upstream pair pipeline executes once inside the
    # checkpoint job instead of twice (the CC edge-doubling shape).
    prev = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("s"), F.col("d")),
                    F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
                )
            ).alias("x")
        )
        .select("x.s", "x.d")
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        deg = prev.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("s")
        # shuffle_hash on the survivor side: a checkpointed frame
        # reports no size stats, so Catalyst defaults both semi joins
        # to sort-merge — re-SORTING the full edge frame twice per
        # round (the same stats-blind-SMJ class as the round-6
        # pair-stream fix; measured in the 10x smoke as the kcore
        # ratio outlier). The node-grain survivor set is the build
        # side and only shrinks.
        nxt = (
            prev.join(keep.hint("shuffle_hash"), "s", "semi")
            .join(
                keep.select(F.col("s").alias("d")).hint("shuffle_hash"),
                "d",
                "semi",
            )
            .localCheckpoint(eager=True)
        )
        _free_ckpt(prev)  # retired round: never read again
        prev = nxt
    return prev.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )


def khop_reachable(
    edges: DataFrame,
    seed_pred,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    hops: int = 3,
) -> DataFrame:
    """Bounded-hop BFS over a directed graph: every node reachable from
    the seed set (``seed_pred``: node Column -> boolean Column, the
    :func:`pagerank_exact` convention) within ``hops`` edges, labeled
    with its MINIMUM hop distance (seeds are hop 0). The frontier
    pattern — expand, subtract visited, accumulate — is the iterative
    shape CC/k-core/PageRank don't exercise: per round one semi join
    (edges x frontier on src) and one anti join (candidates x visited),
    both keyed; the frontier and visited frames localCheckpoint per
    round with retired rounds freed (the cluster-module loop hygiene).
    Bounded hops keep the job count data-independent and the oracle an
    unrolled round per hop — the crawl-frontier / seed-expansion
    primitive (grow a curated corpus along the link graph, depth
    capped).

    Returns ``(node, hop)`` — one row per reachable node, hop in
    [0, hops].
    """
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    # hash-partition the edge frame by the probe key ONCE: every hop's
    # semi join requires hashpartitioning(s) and reuses the persisted
    # layout, so only the (tiny, node-grain) frontier shuffles per hop
    # instead of the full edge frame (guide §2.4 — share one exchange).
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    e = e.repartition(
        e.sparkSession.sparkContext.defaultParallelism, "s"
    ).persist()
    # seed derivation: filter each endpoint arm BEFORE the distinct so
    # the exchange carries only seed candidates, never the full node
    # set (guide §2.3 — shuffle fewer bytes; measured 5.1 -> 3.8 s
    # with the partitioning change at sf0.1)
    seeds = (
        e.select(F.col("s").alias("node"))
        .filter(seed_pred(F.col("node")))
        .unionByName(
            e.select(F.col("d").alias("node")).filter(
                seed_pred(F.col("node"))
            )
        )
        .distinct()
    )
    visited = seeds.withColumn("hop", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited.select("node")
    try:
        for i in range(1, hops + 1):
            # shuffle_hash on the node-grain sides: frontier/visited
            # come off checkpoints (no size stats), so Catalyst would
            # otherwise sort-merge both joins — sorting the edge frame
            # every hop (the kcore stats-blind-SMJ class).
            nxt = (
                e.join(
                    frontier.select(F.col("node").alias("s")).hint(
                        "shuffle_hash"
                    ),
                    "s",
                    "semi",
                )
                .select(F.col("d").alias("node"))
                .distinct()
                .join(
                    visited.select("node").hint("shuffle_hash"),
                    "node",
                    "anti",
                )
            )
            new_rows = nxt.withColumn("hop", F.lit(i))
            nv = visited.unionByName(new_rows).localCheckpoint(eager=True)
            _free_ckpt(visited)
            visited = nv
            # derive the next frontier from the CHECKPOINTED union —
            # new_rows' lineage still references the freed prior round
            frontier = visited.filter(F.col("hop") == i).select("node")
        return visited
    finally:
        e.unpersist()


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    rounds: int = 2,
) -> DataFrame:
    """Bounded-round SEMI-SUPERVISED label propagation over a directed
    edge list: seed nodes carry fixed labels; each round every still-
    unlabeled node adopts the MAJORITY label among its already-labeled
    in-neighbors (ties -> smallest label), and newly labeled nodes
    propagate in later rounds. The seed-expansion primitive for
    classifying a corpus from a small labeled set along a similarity /
    co-occurrence graph — the labeled cousin of :func:`khop_reachable`
    (which tracks reachability, not label competition).

    Deterministic and oracle-replayable by construction: fixed round
    count, exact integer vote counts, total tie order (count DESC,
    label ASC). Seed labels never change (the clamped formulation).
    Labels must be NUMERIC: the tie order rides a (cnt, -label)
    max-struct, and an explicit dtype guard rejects non-numeric label
    columns at CALL time with a TypeError (map string labels to codes
    first). The guard is deliberate (r08 fresh-lens fix): without it
    the negation only fails at RUNTIME mid-task under ANSI mode, and
    under a caller session with ANSI off it would silently cast
    strings to NULL and corrupt the vote order instead of failing.

    Scale shape per round: one edges x labels equi-join keyed on src
    (shuffle_hash on the node-grain label side — the frame comes off
    unioned lineage with no stats, the kcore stats-blind-SMJ class),
    one (node, label) vote aggregate, one max-struct majority pick,
    one anti join against the labeled set. ``rounds`` is small and
    user-bounded, so lineage stays shallow without checkpointing.

    Returns ``(node, label, round)`` — every node labeled within
    ``rounds`` rounds, seeds at round 0.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from pyspark.sql.types import NumericType

    label_type = seeds.schema[label_col].dataType
    if not isinstance(label_type, NumericType):
        raise TypeError(
            f"label column {label_col!r} must be numeric for the "
            f"(cnt, -label) tie order, got {label_type.simpleString()}; "
            "map string labels to integer codes first"
        )
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    labeled = seeds.select(
        F.col(node_col).alias("node"),
        F.col(label_col).alias("label"),
        F.lit(0).alias("round"),
    )
    for r in range(1, rounds + 1):
        votes = (
            e.join(
                labeled.select(
                    F.col("node").alias("s"), "label"
                ).hint("shuffle_hash"),
                "s",
            )
            .groupBy(F.col("d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .join(labeled.select("node").hint("shuffle_hash"), "node", "anti")
        )
        winner = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt"),
                        (-F.col("label")).alias("neg"),
                    )
                ).alias("m")
            )
            .select(
                "node",
                (-F.col("m.neg")).alias("label"),
                F.lit(r).alias("round"),
            )
        )
        labeled = labeled.unionByName(winner)
    return labeled


def common_neighbor_candidates(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 5,
    max_degree: int | None = 100,
) -> DataFrame:
    """LINK PREDICTION by common-neighbor count: for every
    non-adjacent node pair sharing at least one neighbor, count the
    shared neighbors, then keep each node's top-``k`` candidates
    (count DESC, candidate-id ASC — a total order, so the cut is
    deterministic). The classic first-order recommender over a
    co-occurrence graph ("parts bought alongside the same parts",
    "documents linked from the same documents") and the cheap
    candidate stage under heavier rankers.

    Scale shape: neighbor lists are gathered per node (one keyed
    shuffle — the posting-list move, not an edges x edges self-join),
    ``max_degree`` SLICES each sorted list to its first ``max_degree``
    neighbors before the quadratic pair expansion (per-node work
    bounded at min(deg, cap)^2 — the hot-basket cap; a hub's tail
    neighbors beyond the cap are dropped BY CONTRACT and the bias is
    deterministic, mirrored in the oracle's rank <= cap predicate),
    wedge pairs hash-aggregate on the pair key, existing edges are
    removed with one anti join, and the top-k cut is a per-node
    max-struct window over the (small) candidate relation.

    Returns ``(node, candidate, common_cnt, rank)`` with rank in
    [1, k].
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_degree is not None and max_degree < 2:
        raise ValueError(
            f"max_degree must be >= 2 (a 1-neighbor cap generates no "
            f"wedges at all), got {max_degree}"
        )
    # checkpoint the canonical edge list (consumed by both doubling
    # arms + the existing-edge anti join — the un-reused upstream pair
    # pipeline executed 3x, the edge_structural_similarity finding);
    # doubling via explode keeps it to ONE reference
    e = _canonical(
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    ).localCheckpoint(eager=False)
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("s"), F.col("d")),
                F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
            )
        ).alias("x")
    ).select("x.s", "x.d")
    nbrs = F.array_sort(F.collect_set("d"))
    if max_degree is not None:
        nbrs = F.slice(nbrs, 1, max_degree)
    hubs = und.groupBy(F.col("s").alias("n")).agg(nbrs.alias("ns"))
    hubs = hubs.repartition(
        edges.sparkSession.sparkContext.defaultParallelism
    )
    x1 = hubs.select("ns", F.posexplode("ns").alias("i", "a"))
    wedges = x1.select(
        F.col("a").alias("u"),
        F.explode(
            F.slice(
                "ns",
                F.col("i") + 2,
                F.greatest(F.size("ns") - F.col("i") - 1, F.lit(0)),
            )
        ).alias("v"),
    )
    cn = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_cnt")
    )
    # drop already-adjacent pairs: candidates are canonical (u < v from
    # the sorted neighbor arrays), so one semi-orientation anti join.
    # Checkpointed: BOTH orientation arms below read it, and without
    # truncation the whole wedge expansion + anti join ran twice.
    cand = cn.join(
        e.select(F.col("s").alias("u"), F.col("d").alias("v")).hint(
            "shuffle_hash"
        ),
        ["u", "v"],
        "anti",
    ).localCheckpoint(eager=False)
    # per-node top-k over BOTH orientations of each candidate pair
    both = cand.select(
        F.col("u").alias("node"),
        F.col("v").alias("candidate"),
        "common_cnt",
    ).unionByName(
        cand.select(
            F.col("v").alias("node"),
            F.col("u").alias("candidate"),
            "common_cnt",
        )
    )
    w = Window.partitionBy("node").orderBy(
        F.desc("common_cnt"), F.asc("candidate")
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("node", "candidate", "common_cnt", F.col("rank").cast("long").alias("rank"))
    )


def resource_allocation_candidates(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 5,
    max_degree: int | None = 100,
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """LINK PREDICTION by the RESOURCE-ALLOCATION index (Zhou, Lü &
    Zhang, Eur. Phys. J. B 2009) in EXACT integer ppm: for every
    non-adjacent pair sharing neighbors, score
    ``sum over shared neighbors w of (ppm_scale DIV deg(w))`` — the
    degree-discounted refinement of plain common-neighbor counting
    (a shared hub says far less than a shared rare neighbor; RA and
    its log-discounted cousin Adamic-Adar dominate raw counts on
    recommendation benchmarks, and RA's reciprocal discount needs no
    float log, so the score replays bit-for-bit in any engine).

    Scale shape is :func:`common_neighbor_candidates` with the wedge
    CENTER's weight riding the expansion: per-node neighbor lists
    (one keyed shuffle), ``max_degree`` slice before the quadratic
    wedge expansion (same deterministic-bias contract — but the
    DISCOUNT uses the center's FULL degree, computed on the unsliced
    set, so a capped hub still discounts as the hub it is), wedge
    pairs hash-aggregate on the pair key carrying ``sum(w_ppm)``, one
    anti join against existing edges, per-node top-``k`` by
    (ra_ppm DESC, candidate ASC).

    Returns ``(node, candidate, ra_ppm, common_cnt, rank)``.

    Reference scope note: no graph operators exist in the reference
    (SURVEY.md §2.7); north-star extension surface.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_degree is not None and max_degree < 2:
        raise ValueError(
            f"max_degree must be >= 2 (a 1-neighbor cap generates no "
            f"wedges at all), got {max_degree}"
        )
    # same branch-point truncation as common_neighbor_candidates: the
    # canonical edge list feeds the doubling AND the anti join
    e = _canonical(
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    ).localCheckpoint(eager=False)
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("s"), F.col("d")),
                F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
            )
        ).alias("x")
    ).select("x.s", "x.d")
    full = F.array_sort(F.collect_set("d"))
    hubs = und.groupBy(F.col("s").alias("n")).agg(full.alias("ns_full"))
    sliced = (
        F.slice("ns_full", 1, max_degree)
        if max_degree is not None
        else F.col("ns_full")
    )
    hubs = hubs.select(
        "n",
        F.expr(f"{ppm_scale}L DIV size(ns_full)").alias("w_ppm"),
        sliced.alias("ns"),
    )
    hubs = hubs.repartition(
        edges.sparkSession.sparkContext.defaultParallelism
    )
    x1 = hubs.select("w_ppm", "ns", F.posexplode("ns").alias("i", "a"))
    wedges = x1.select(
        "w_ppm",
        F.col("a").alias("u"),
        F.explode(
            F.slice(
                "ns",
                F.col("i") + 2,
                F.greatest(F.size("ns") - F.col("i") - 1, F.lit(0)),
            )
        ).alias("v"),
    )
    ra = wedges.groupBy("u", "v").agg(
        F.sum("w_ppm").alias("ra_ppm"),
        F.count(F.lit(1)).alias("common_cnt"),
    )
    # checkpointed: both orientation arms below read it (the
    # common_neighbor_candidates finding)
    cand = ra.join(
        e.select(F.col("s").alias("u"), F.col("d").alias("v")).hint(
            "shuffle_hash"
        ),
        ["u", "v"],
        "anti",
    ).localCheckpoint(eager=False)
    both = cand.select(
        F.col("u").alias("node"),
        F.col("v").alias("candidate"),
        "ra_ppm",
        "common_cnt",
    ).unionByName(
        cand.select(
            F.col("v").alias("node"),
            F.col("u").alias("candidate"),
            "ra_ppm",
            "common_cnt",
        )
    )
    w = Window.partitionBy("node").orderBy(
        F.desc("ra_ppm"), F.asc("candidate")
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "node",
            "candidate",
            "ra_ppm",
            "common_cnt",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def edge_structural_similarity(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int | None = 100,
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """STRUCTURAL SIMILARITY of every EXISTING edge — open-neighborhood
    Jaccard ``|N(u) inter N(v)| / |N(u) union N(v)|`` in exact integer
    ppm. This is the edge weight SCAN-family graph clustering
    (Xu et al., KDD 2007) thresholds to find communities, hubs and
    outliers, and the standard "is this edge inside a community or a
    bridge between two?" score: a high-Jaccard edge lives inside a
    dense cluster, a low-Jaccard edge connects strangers. (SCAN itself
    uses closed neighborhoods and a float sqrt-cosine; the Jaccard
    variant needs no float — closed-neighborhood counts are the open
    ones + 2 for an existing edge, derivable by the caller.)

    Scale shape mirrors :func:`common_neighbor_candidates`: per-node
    neighbor lists (one keyed shuffle), ``max_degree`` slices each
    sorted list before the quadratic wedge expansion (per-node work
    min(deg, cap)^2; pairs whose shared neighbors all rank beyond the
    cap are undercounted BY CONTRACT, deterministically), wedge pairs
    hash-aggregate on the pair key, then ONE semi-orientation inner
    join keeps existing edges only (the link predictors anti-join the
    same relation) and the FULL degrees (computed on the unsliced
    neighbor sets) ride in via two broadcast-sized node-grain joins.
    An existing edge with zero shared neighbors is still emitted
    (jaccard 0) via a left join from the edge list, not the wedge
    relation — bridges are the interesting rows.

    Returns ``(p1, p2, common_cnt, deg1, deg2, jaccard_ppm)`` with
    p1 < p2; ``jaccard_ppm = common_cnt * ppm_scale DIV
    (deg1 + deg2 - common_cnt)`` (truncating, denominator >= 2 for any
    existing edge so never zero).

    Reference scope note: no graph operators exist in the reference
    (SURVEY.md §2.7); north-star extension surface.
    """
    if max_degree is not None and max_degree < 2:
        raise ValueError(
            f"max_degree must be >= 2 (a 1-neighbor cap generates no "
            f"wedges at all), got {max_degree}"
        )
    # the canonical edge list is consumed THREE times (both union arms
    # of the undirected doubling + the existing-edge probe of the final
    # left join), and Catalyst/AQE do not reuse the subtree (measured:
    # the upstream pair-mining pipeline executed 3x = 7 parquet scans
    # in one action, ReusedExchange count 0) — checkpoint it lazily,
    # the triangle_counts convention. The doubling itself becomes an
    # explode (ONE reference) instead of a two-arm union.
    e = _canonical(
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    ).localCheckpoint(eager=False)
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("s"), F.col("d")),
                F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
            )
        ).alias("x")
    ).select("x.s", "x.d")
    full = F.array_sort(F.collect_set("d"))
    hubs = und.groupBy(F.col("s").alias("n")).agg(full.alias("ns_full"))
    sliced = (
        F.slice("ns_full", 1, max_degree)
        if max_degree is not None
        else F.col("ns_full")
    )
    hubs = hubs.select(
        "n", F.size("ns_full").cast("long").alias("deg"), sliced.alias("ns")
    )
    # node-grain branch point (wedge expansion + two degree joins read
    # it): checkpoint so the neighborhood aggregate runs once
    hubs = hubs.repartition(
        edges.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint(eager=False)
    x1 = hubs.select("ns", F.posexplode("ns").alias("i", "a"))
    wedges = x1.select(
        F.col("a").alias("u"),
        F.explode(
            F.slice(
                "ns",
                F.col("i") + 2,
                F.greatest(F.size("ns") - F.col("i") - 1, F.lit(0)),
            )
        ).alias("v"),
    )
    cn = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_cnt")
    )
    deg = hubs.select("n", "deg")
    scored = (
        e.select(F.col("s").alias("u"), F.col("d").alias("v"))
        .join(cn.hint("shuffle_hash"), ["u", "v"], "left")
        .na.fill({"common_cnt": 0})
        .join(deg.select(F.col("n").alias("u"), F.col("deg").alias("deg1")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("deg").alias("deg2")), "v")
    )
    return scored.select(
        F.col("u").alias("p1"),
        F.col("v").alias("p2"),
        F.col("common_cnt").cast("long").alias("common_cnt"),
        "deg1",
        "deg2",
        F.expr(
            f"common_cnt * {ppm_scale}L DIV (deg1 + deg2 - common_cnt)"
        ).alias("jaccard_ppm"),
    )


def checked_long(col: Column, *, context: str = "value") -> Column:
    """DECIMAL->BIGINT cast that RAISES AT EXECUTION on overflow instead
    of non-ANSI mode's silent NULL. Guards casts of values that grow
    with the data (hits_bipartite scores grow like degree^iterations):
    an overflow surfaces as a loud job failure naming the context, never
    as a NULL that quietly drops rows from a parity compare."""
    return F.when(
        (col >= F.lit(-(2**63)).cast("decimal(38,0)"))
        & (col <= F.lit(2**63 - 1).cast("decimal(38,0)")),
        col.cast("long"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"checked_long: {context} overflows BIGINT ("),
                col.cast("string"),
                F.lit(") — keep DECIMAL(38,0) end-to-end or reduce "
                      "iterations/scale"),
            )
        )
    )


def hits_bipartite(
    incidence: DataFrame,
    *,
    hub_col: str = "hub",
    auth_col: str = "auth",
    iterations: int = 2,
) -> DataFrame:
    """HITS (Kleinberg, JACM 1999) over a BIPARTITE incidence relation
    — hub nodes point at authority nodes — in EXACT UNNORMALIZED
    integers: ``h_0 = 1`` for every hub, then alternating
    ``a_{t+1}(p) = sum of h_t over hubs pointing at p`` and
    ``h_{t+1}(c) = sum of a_{t+1} over authorities c points at``.
    Unnormalized HITS preserves the RANKING of the normalized
    iteration exactly (normalization is a positive scalar per round),
    and integer sums replay bit-for-bit in any engine — no float
    L2-normalization drift. The catalog/retrieval use: "which parts do
    the heaviest buyers concentrate on" — a popularity score that
    weights an endorsement by the endorser's own breadth, one step
    beyond raw degree.

    ``iterations`` counts AUTHORITY updates; scores grow like
    degree^iterations, so sums run in DECIMAL(38,0) (128-bit — safe
    for 2-3 iterations at warehouse degree scales; the emitted column
    stays DECIMAL(38,0) so the caller decides the final cast).

    Scale shape: the incidence is deduplicated once (distinct on
    (hub, auth)); every iteration is one key-partitioned aggregate
    producing a NODE-grain score frame plus one equi-join of the
    incidence against that frame, both shuffled on their join key —
    no windows, no broadcasts of edge-sized data, no driver loop
    state beyond the fixed iteration count.

    Returns ``(auth, score)`` — authority scores after ``iterations``
    rounds; hub scores are one more aggregate away and omitted to
    keep the output single-grain.

    Reference scope note: no graph operators exist in the reference
    (SURVEY.md §2.7); north-star extension surface.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # the deduplicated incidence is re-read by every iteration's two
    # joins plus the init aggregate (2*iterations - 1 references), and
    # each reference re-executed the whole upstream build (measured on
    # hits_parts_customers: 3 executions of the orders-lineitem join =
    # 6 parquet scans in one action) — checkpoint it lazily, the
    # triangle_counts/CC convention
    inc = incidence.select(
        F.col(hub_col).alias("h"), F.col(auth_col).alias("a")
    ).distinct().localCheckpoint(eager=False)
    # a_1 = in-degree (h_0 = 1), in DECIMAL(38,0) from the start
    auth = inc.groupBy("a").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("score")
    )
    for _ in range(iterations - 1):
        hub = (
            inc.join(auth, "a")
            .groupBy("h")
            .agg(F.sum("score").cast("decimal(38,0)").alias("hscore"))
        )
        auth = (
            inc.join(hub, "h")
            .groupBy("a")
            .agg(F.sum("hscore").cast("decimal(38,0)").alias("score"))
        )
    return auth.select(F.col("a").alias("auth"), "score")


def cluster_purity(
    comps: DataFrame,
    labels: DataFrame,
    *,
    node_col: str = "node",
    comp_col: str = "comp",
    label_col: str = "label",
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """Per-cluster LABEL PURITY in exact integer ppm — the standard
    external clustering-quality check (majority-label fraction), here
    pointed at near-dup components: a pure component (every member
    from one source/label) is what a correct dedup graph produces;
    low-purity components flag over-merging (a too-loose similarity
    threshold chaining unrelated docs together).

    Two key-partitioned aggregates and one equi-join, nothing else:
    (comp, label) counts first (map-side combine), then per-comp
    ``max`` elects the majority count while ``sum`` recovers the size
    — never a window over members, never a collect. Majority TIES
    resolve to the count (purity is about the max count, not which
    label holds it), so the output is deterministic without a
    tie-break rule. ``purity_ppm = majority_n * ppm_scale DIV size``
    truncates exactly the way DuckDB ``//`` does.

    Returns ``(comp, size, majority_n, purity_ppm)``. Nodes missing
    from ``labels`` are dropped by the inner join (size counts labeled
    members only — document the label frame's completeness contract).

    Reference scope note: no clustering exists in the reference
    (SURVEY.md §2.7); north-star extension surface.
    """
    m = comps.select(
        F.col(node_col).alias("__n"), F.col(comp_col).alias("comp")
    ).join(
        labels.select(
            F.col(node_col).alias("__n"), F.col(label_col).alias("__l")
        ),
        "__n",
    )
    per_label = m.groupBy("comp", "__l").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return per_label.groupBy("comp").agg(
        F.sum("__c").alias("size"),
        F.max("__c").alias("majority_n"),
    ).select(
        "comp",
        "size",
        "majority_n",
        F.expr(f"majority_n * {ppm_scale}L DIV size").alias("purity_ppm"),
    )


def local_clustering(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b",
    *,
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """Per-node LOCAL CLUSTERING COEFFICIENT in exact integer ppm —
    Watts-Strogatz ``2 * triangles / (deg * (deg - 1))``, the
    tight-community-vs-chain-noise signal one normalization past raw
    triangle counts: a node whose neighbors all know each other scores
    ppm_scale, a pure hub scores 0.

    Composes :func:`triangle_counts` (degree-ordered orientation — the
    Suri-Vassilvitskii bound on wedge work) with one degree aggregate
    and a LEFT join (triangle-free nodes matter and score 0). Emitted
    for nodes with degree >= 2 (the coefficient is undefined below);
    the ratio is one integer DIV, truncating exactly like DuckDB
    ``//``.

    Returns ``(node, degree, n_tri, lcc_ppm)``.

    Reference scope note: no graph operators exist in the reference
    (SURVEY.md §2.7); north-star extension surface.
    """
    # self-loops dropped to match triangle_counts' _canonical edge set:
    # a loop adds 2 to the naive degree but can never close a triangle,
    # which would deflate lcc_ppm for any caller whose raw edge list
    # carries loops (ADVICE r09)
    # checkpointed: consumed by both degree arms AND fed to
    # triangle_counts (which would otherwise re-run the whole upstream
    # pair pipeline for its own canonicalization — 3 executions total,
    # the edge_structural_similarity finding). _canonical is idempotent
    # on an already-canonical frame, so passing canon through is exact.
    canon = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct().localCheckpoint(
        eager=False
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(canon, "a", "b")
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.expr(
                f"coalesce(n_tri, 0) * 2 * {ppm_scale}L "
                f"DIV (degree * (degree - 1))"
            ).alias("lcc_ppm"),
        )
    )
