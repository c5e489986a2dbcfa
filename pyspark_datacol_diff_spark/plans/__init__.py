"""Plan-inspection helpers: assertions over the executed physical plan
used by tests to pin the properties that matter at 100 TB — pushdown,
broadcast vs shuffle joins, shuffle counts, column pruning.

Correctness tests prove an operator computes the right answer; these
prove it computes it with the PLAN we designed (a correct-but-
full-scan regression fails CI here, not in production).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The final executed physical plan as text (post-AQE re-plan is not
    included — this is the initial physical plan, which is what pins
    strategy choices like join type and pushdown)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """The optimized LOGICAL plan as text — the level where join-strategy
    HINTS are still visible (``leftHint=/rightHint=(strategy=broadcast)``
    on the Join node); physical planning consumes them, so a forced
    broadcast and an AQE-chosen one look identical in the physical plan."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def _tree_name_pos(line: str) -> int:
    """Column where the operator name starts (tree-drawing prefixes are
    spaces, ':', '+', '-'); -1 for non-node lines."""
    for i, ch in enumerate(line):
        if ch not in " :+-":
            return i
    return -1


def forced_broadcast_builds(df: DataFrame) -> list[dict[str, str]]:
    """Every broadcast-HINTED join build side in the optimized logical
    plan, classified by what bounds it:

    - ``scalar``: topmost node feeding the build is a grouping-free
      aggregate (``Aggregate [exprs]``, one row by construction) — the
      correct form of a scalar subquery; always safe.
    - ``limited``: a GlobalLimit bounds the build — safe.
    - ``keyed_aggregate``: the build is an aggregate GROUPED BY data
      columns — its row count is the key domain's cardinality, which is
      the DATA's (a vocabulary, an item catalog, a user id space). At
      100 TB a forced broadcast of an unbounded domain kills the job
      regardless of AQE; only a caller-declared bound makes it safe.
    - ``relation``: no aggregate/limit — a raw or filtered relation
      (e.g. a dimension table). Boundedness is a caller invariant the
      plan cannot prove (documented stance in :func:`scale_lint`).

    Returns ``[{"kind", "detail"}, ...]`` in plan order.
    """
    lines = optimized_plan(df).splitlines()

    def _direct_children(idx: int) -> list[int]:
        root = _tree_name_pos(lines[idx])
        out = []
        for j in range(idx + 1, len(lines)):
            p = _tree_name_pos(lines[j])
            if 0 <= p <= root:
                break
            if p == root + 3:
                out.append(j)
        return out

    def _subtree(idx: int) -> list[int]:
        root = _tree_name_pos(lines[idx])
        out = [idx]
        for j in range(idx + 1, len(lines)):
            p = _tree_name_pos(lines[j])
            if 0 <= p <= root:
                break
            out.append(j)
        return out

    builds: list[dict[str, str]] = []
    for i, line in enumerate(lines):
        if "Hint=(strategy=broadcast" not in line:
            continue
        kids = _direct_children(i)
        for side in re.findall(r"(left|right)Hint=\(strategy=broadcast", line):
            pick = 0 if side == "left" else 1
            if pick >= len(kids):
                continue
            sub = _subtree(kids[pick])
            kind, detail = "relation", "no aggregate/limit in build subtree"
            for j in sub:
                node = lines[j]
                if "GlobalLimit" in node:
                    kind, detail = "limited", "GlobalLimit bounds the build"
                    break
                m = re.search(r"Aggregate \[(.*?)\](, \[)?", node)
                if m:
                    if m.group(2):
                        kind = "keyed_aggregate"
                        detail = f"build grouped by [{m.group(1)}]"
                    else:
                        kind, detail = "scalar", "grouping-free aggregate (1 row)"
                    break
            builds.append({"kind": kind, "detail": detail})
    return builds


def count_op(df: DataFrame, op: str) -> int:
    return len(re.findall(re.escape(op), physical_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans.

    Tolerates metadata truncation: Spark cuts scan metadata at
    ``spark.sql.maxMetadataStringLength`` chars (``...`` with no closing
    ``]``), so match up to ``]`` OR end-of-line. Sessions built by
    ``session.get_spark`` / tests/conftest.py raise the limit to 10000,
    but a caller-provided session may not have.
    """
    return [
        # strip only the literal truncation ellipsis — a bare rstrip(".")
        # would corrupt filter values that genuinely end in a dot. A
        # truncated entry may still end mid-token; callers match
        # fragments, so prefer full-length sessions for exact asserts.
        re.sub(r"\.\.\.$", "", m.strip())
        for m in re.findall(
            r"PushedFilters: \[([^\]\n]*)\]?", physical_plan(df)
        )
        if m.strip()
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — the column-pruning witness."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", physical_plan(df))


def assert_join_strategy(
    df: DataFrame,
    *,
    sort_merge: int = 0,
    broadcast_hash: int = 0,
    allow_nested_loop: bool = False,
) -> None:
    plan = physical_plan(df)
    smj = plan.count("SortMergeJoin")
    bhj = plan.count("BroadcastHashJoin")
    assert smj == sort_merge, f"expected {sort_merge} SortMergeJoin, got {smj}"
    assert bhj == broadcast_hash, (
        f"expected {broadcast_hash} BroadcastHashJoin, got {bhj}"
    )
    if not allow_nested_loop:
        assert "CartesianProduct" not in plan, "unexpected CartesianProduct"


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = shuffle_count(df)
    assert got <= n, f"expected <= {n} shuffles, got {got}"


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    pf = pushed_filters(df)
    assert any(fragment in p for p in pf), (
        f"no pushed filter containing {fragment!r}; pushed: {pf}"
    )


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """The named column must appear in NO scan's ReadSchema (and, for
    computed columns, nowhere in the plan)."""
    for rs in read_schemas(df):
        assert column not in rs, f"{column} not pruned from scan: {rs}"


def scale_lint(
    df: DataFrame,
    *,
    declared_exact_baseline: str | None = None,
    declared_bounded_broadcast: str | None = None,
) -> list[dict[str, str]]:
    """Audit a DataFrame's physical plan for the patterns that are
    harmless at test scale and fatal at 100 TB. Returns one finding per
    hit: ``{"code", "severity", "detail"}``, empty when clean.

    This is the plan-assertion test harness turned user-facing: run it
    on any pipeline before promoting it to a big cluster, or wire it
    into CI next to the correctness tests. Codes:

    - ``cartesian`` (error): CartesianProduct / BroadcastNestedLoopJoin —
      a pair blow-up that scales O(n*m). Re-express as an equi-join on a
      bucket/band key, or accept it only as a small-side verify stage.
      A BroadcastNestedLoopJoin whose broadcast subtree is a grouping-
      free aggregate (``keys=[]`` — a scalar subquery, one-row build
      side) is downgraded to info: that is the correct physical form of
      "compare every row against a global statistic".
    - ``global_window`` (error): a window over ``SinglePartition`` — the
      whole dataset funnels through ONE task. Partition the window by a
      key (or hash-bucket streams, as pack_sequences does).
    - ``global_sort`` (warn): a total-order rangepartitioning sort right
      before the sink is legitimate (range-clustered write); anywhere
      else it is usually an accidental ``orderBy`` that a ``sortWithinPartitions``
      or a top-k window should replace.
    - ``row_python_udf`` (error): row-at-a-time Python eval
      (BatchEvalPython) — 10-100x slower than Arrow; use pandas_udf /
      mapInPandas (ArrowEvalPython / MapInPandas nodes are fine).
    - ``unpruned_wide_scan`` (warn): a scan reading 2x+ more columns
      than any plan node references by name — projection is not reaching
      the reader.
    - ``no_pushdown_scan`` (info): a filtered plan whose scans push no
      predicates — fine for compute-heavy predicates deliberately held
      above a rebalance (see sources.no_pushdown), wrong for selective
      key predicates.
    - ``reinlined_generator_filter`` (warn): a generator's inferred
      ``size()`` filter carries a nested higher-order-function chain —
      the optimizer alias-substituted an expensive array column into
      the Filter BELOW the projection defining it, where it re-evaluates
      per row (the round-9 winnowing pathology, seconds -> >10 min at
      sf0.1). Pin the defining projection with
      ``sources.no_alias_inline``.

    - ``forced_broadcast`` (error): a broadcast-HINTED join whose build
      side is an aggregate GROUPED BY data columns — the build's row
      count is the key domain's cardinality (a vocabulary, an item
      catalog), which is the data's, not the schema's. AQE cannot save
      a hint-forced broadcast; drop the hint and let runtime sizes pick
      the strategy, or pass ``declared_bounded_broadcast`` when the key
      domain is bounded by contract (hour-of-week cells, a state
      machine's states) — the finding then downgrades to info carrying
      the declaration. Scalar (keys=[]) builds, GlobalLimit-bounded
      builds, and raw relations are not flagged (relation boundedness
      is a caller invariant the plan cannot prove — see below).

    ``declared_exact_baseline``: pass a one-line justification when the
    operator's CONTRACT is the exact O(n*m) computation — brute-force
    top-k against a bounded query set, the exact-verify side of a recall
    gate. Pair-blow-up findings then downgrade to info and carry the
    justification, keeping the declaration visible in reports instead of
    silently suppressed. Boundedness of a broadcast side is a caller
    invariant the plan cannot prove (a selective filter looks the same
    as an unbounded relation), so this is deliberately an explicit
    opt-in, never an inference.
    """
    plan = physical_plan(df)
    findings: list[dict[str, str]] = []

    def add(code: str, severity: str, detail: str) -> None:
        findings.append({"code": code, "severity": severity, "detail": detail})

    lines = plan.splitlines()

    def _name_pos(line: str) -> int:
        """Column where the operator name starts (tree-drawing prefixes
        are spaces, ':', '+', '-'); -1 for non-node lines."""
        for i, ch in enumerate(line):
            if ch not in " :+-":
                return i
        return -1

    def _subtree(idx: int, *, include_root: bool = False) -> list[int]:
        """Line indexes of the subtree rooted at lines[idx]: following
        lines whose operator name sits deeper, up to the first line back
        at or above the root's depth."""
        root = _name_pos(lines[idx])
        out = [idx] if include_root else []
        for j in range(idx + 1, len(lines)):
            p = _name_pos(lines[j])
            if 0 <= p <= root:
                break
            out.append(j)
        return out

    def add_pair_blowup(detail: str) -> None:
        if declared_exact_baseline:
            add(
                "cartesian",
                "info",
                f"{detail} — declared exact baseline: "
                f"{declared_exact_baseline}",
            )
        else:
            add("cartesian", "error", detail)

    n_cart = plan.count("CartesianProduct")
    if n_cart:
        add_pair_blowup(f"{n_cart}x CartesianProduct: O(n*m) pair blow-up")
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        # scalar build side: the join's DIRECT BroadcastExchange child
        # (depth exactly one level down) over a grouping-free aggregate
        # (one row by construction)
        jpos = _name_pos(line)
        scalar = False
        for j in _subtree(i):
            p = _name_pos(lines[j])
            direct_child = jpos < p <= jpos + 6
            if direct_child and (
                "BroadcastExchange" in lines[j]
                or "BroadcastQueryStage" in lines[j]
            ):
                scalar = any(
                    "Aggregate" in lines[b] and "keys=[]" in lines[b]
                    for b in _subtree(j)
                )
        if scalar:
            add(
                "cartesian",
                "info",
                "BroadcastNestedLoopJoin over a scalar (1-row keys=[] "
                "aggregate) build side: the correct form of a scalar "
                "subquery",
            )
        else:
            add_pair_blowup("BroadcastNestedLoopJoin: O(n*m) pair blow-up")
    # a Window's single-partition requirement shows as an Exchange
    # SinglePartition child (possibly under the window's Sort)
    if re.search(
        r"Window .*\n(?:[^\n]*\bSort\b[^\n]*\n)?[^\n]*Exchange SinglePartition",
        plan,
    ):
        add(
            "global_window",
            "error",
            "window over SinglePartition: whole input on one task",
        )
    if "Exchange rangepartitioning" in plan and "TakeOrdered" not in plan:
        add(
            "global_sort",
            "warn",
            "total-order sort (rangepartitioning exchange): intended only "
            "for range-clustered sinks",
        )
    if "BatchEvalPython" in plan:
        add(
            "row_python_udf",
            "error",
            "row-at-a-time Python UDF (BatchEvalPython): use Arrow "
            "(pandas_udf / mapInPandas)",
        )
    for rs in read_schemas(df):
        cols = re.findall(r"(\w+):", rs)
        referenced = [c for c in cols if plan.count(c) > 1]
        if len(cols) >= 4 and len(referenced) * 2 <= len(cols):
            add(
                "unpruned_wide_scan",
                "warn",
                f"scan reads {len(cols)} columns, plan references "
                f"~{len(referenced)}: projection not pushed",
            )
    for b in forced_broadcast_builds(df):
        if b["kind"] != "keyed_aggregate":
            continue
        if declared_bounded_broadcast:
            add(
                "forced_broadcast",
                "info",
                f"broadcast-hinted keyed-aggregate build ({b['detail']}) "
                f"— declared bounded: {declared_bounded_broadcast}",
            )
        else:
            add(
                "forced_broadcast",
                "error",
                f"broadcast-hinted join build is a keyed aggregate "
                f"({b['detail']}): its row count is the key domain's "
                "cardinality — drop the hint (AQE picks from measured "
                "sizes) or declare the bound",
            )
    # re-inlined generator filter (the round-9 winnowing pathology,
    # commit 9fa0085): InferFiltersFromGenerate adds `size(col) > 0`
    # under an explode, and PushDownPredicates then alias-substitutes
    # the column — inlining the FULL array-building expression into the
    # Filter below the projection that defines it, where a nested
    # higher-order-function chain loses its staging and re-evaluates
    # per row (measured seconds -> >10 min at sf0.1). Signature: a
    # Filter in a Generate's child subtree whose condition carries a
    # size(...) predicate over a NESTED HOF chain (>= 2 lambdafunction
    # occurrences — a bare inferred `size(col#n) > 0` over a fenced /
    # plain column reference has none and is the healthy form). Fence
    # the defining projection with sources.no_alias_inline.
    seen_offending_filters: set[int] = set()
    for i, line in enumerate(lines):
        if not re.search(r"\bGenerate\b", line):
            continue
        for j in _subtree(i):
            fl = lines[j]
            if (
                re.search(r"(?:^|\s|\))Filter ", fl)
                and "size(" in fl
                and fl.count("lambdafunction(") >= 2
                # dedupe by the Filter line: nested generators over the
                # SAME offending Filter must yield ONE finding, not one
                # per enclosing Generate (ADVICE r10)
                and j not in seen_offending_filters
            ):
                seen_offending_filters.add(j)
                add(
                    "reinlined_generator_filter",
                    "warn",
                    "a generator's inferred size() filter re-evaluates a "
                    "nested higher-order-function chain below the "
                    "projection that defines it (InferFiltersFromGenerate "
                    "+ alias substitution): pin the array column with "
                    "sources.no_alias_inline at its defining projection",
                )

    has_filter_node = re.search(r"(?m)^[\s:+*-]*(?:\*\(\d+\) )?Filter ", plan)
    if has_filter_node and not pushed_filters(df):
        add(
            "no_pushdown_scan",
            "info",
            "plan filters but no scan pushes predicates (deliberate for "
            "compute-heavy predicates above a rebalance; wrong for "
            "selective key predicates)",
        )
    return findings
