#!/usr/bin/env python3
"""Run plans.scale_lint over EVERY registered query's physical plan and
emit a JSON report — the 100x-scale claim made mechanical.

Usage:
    python3 scripts/scale_lint_report.py [out.json] [sf_dir]

Writes ``{query: [findings...]}`` for queries with any finding, plus a
``__summary__`` entry with counts by severity. Exit code 1 if any
error-severity finding exists. Linting itself inspects plans, but
BUILDING some queries executes work: the streaming queries run their
micro-batch replay to produce the (batch) result whose plan is then
linted, and the PQ/IVF gates run their k-means fits — run this at a
small sf (default sf0.001), not against a production-sized directory.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "SCALELINT.json"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

# Queries whose CONTRACT is the exact O(n*m) computation. Each gets
# scale_lint(declared_exact_baseline=...) with the justification below,
# which downgrades its pair-blow-up findings to info WITH the declaration
# attached — visible in the report, never silently suppressed. Every one
# has a bucketed/banded scale path implemented beside it.
DECLARED_EXACT = {
    "ann_topk_cosine": (
        "brute-force exact top-k: corpus streams against a BROADCAST "
        "bounded query set (O(n*q), q small by contract); the scale "
        "path is ann_ivf_topk"
    ),
    "ann_topk_quantized": (
        "int8 exact MIPS baseline against a broadcast bounded query "
        "set; scale path is ann_ivf_topk"
    ),
    "knn_eval_embed": (
        "leave-one-out kNN accuracy over the SAME broadcast-bounded "
        "exact top-k scan as ann_topk_cosine (O(n*q), q = the vec_id "
        "% 25 probe subset by contract); a production eval at larger "
        "probe counts would swap in ann_ivf_topk's cell-bounded scan"
    ),
    "embed_cosine_near_dup": (
        "exact O(n^2) cosine pair verify — the ground-truth baseline "
        "the LSH path (lsh_near_dup_recall) is gated against"
    ),
    "lsh_near_dup_recall": (
        "recall gate: deliberately computes the exact O(n^2) pair set "
        "next to the LSH candidates to measure recall"
    ),
    "hard_negatives_embed": (
        "hard-negative mining on the same broadcast-bounded exact scan "
        "as ann_topk_cosine (O(n*q), q small by contract) with the "
        "label-inequality predicate pruning pairs pre-score; the "
        "IMPLEMENTED scale path is hard_negatives_ivf (gated by "
        "hard_negatives_ivf_recall)"
    ),
    "hard_negatives_ivf_recall": (
        "recall gate: the IVF miner's candidates are cell-bounded (the "
        "scale path itself), but the exact ground truth it is measured "
        "against is the same deliberate broadcast-bounded O(n*q) scan "
        "as hard_negatives_embed"
    ),
    "ann_pq_recall": (
        "recall gate: the PQ ADC pass streams corpus codes against the "
        "BROADCAST bounded query set (O(n*q), the PQ contract — m "
        "lookups per row instead of dim multiplies), and the exact "
        "ground-truth top-k it is measured against is the same "
        "deliberate O(n*q) baseline as ann_topk_cosine"
    ),
    "mutual_knn_embed": (
        "kNN-graph construction over the deliberately bounded vec_id "
        "% 5 node subset: the directed edge list comes from the same "
        "broadcast-bounded exact top-k scan as ann_topk_cosine (O(n*q) "
        "with q = n_subset by contract); the IMPLEMENTED scale path is "
        "mutual_knn_pairs(method='ivf') — registered as "
        "mutual_knn_ivf_embed, cell-keyed equi-join, no crossJoin — "
        "gated by mutual_knn_ivf_recall"
    ),
    "mutual_knn_ivf_recall": (
        "recall gate: the IVF mutual-kNN path's edges are cell-bounded "
        "(the scale path itself, linted clean as mutual_knn_ivf_embed), "
        "but the exact ground-truth graph it is measured against is "
        "the same deliberate broadcast-bounded O(n*q) scan as "
        "mutual_knn_embed"
    ),
    "ann_ivf_auto_recall": (
        "recall gate for the PRODUCTION auto-IVF configuration "
        "(nlist=auto, bounded nprobe — the candidate arm is cell-"
        "bounded, the scale path itself), measured against the same "
        "deliberate broadcast-bounded O(n*q) exact scan as "
        "ann_topk_cosine"
    ),
}


# Queries whose broadcast-HINTED build side is a KEYED aggregate whose
# key domain is bounded by CONTRACT, not by the data (scale_lint's
# forced_broadcast class cannot tell a state machine's states from a
# web-scale vocabulary — boundedness is an explicit opt-in, never an
# inference). Each declaration downgrades the finding to info WITH the
# justification attached, visible in the report.
DECLARED_BOUNDED = {
    "decontaminate_docs": (
        "build = the BENCHMARK set's distinct n-grams — bounded by the "
        "decontamination contract (the benchmark is tiny relative to "
        "the corpus; that is the operation's premise)"
    ),
    "markov_transitions_events": (
        "build = per-from-state totals — |states| is the event-type "
        "domain, a schema-bounded enum (documented small-|states| "
        "assumption in transition_counts)"
    ),
    "streaming_transitions": (
        "build = per-from-state totals over the micro-batch replay — "
        "same schema-bounded state domain as markov_transitions_events"
    ),
    "seasonality_lift_events": (
        "builds = per-type and per-hour-of-week marginals — at most "
        "|event types| and exactly 168 rows by construction"
    ),
    "streaming_seasonality_events": (
        "builds = the same type/hour-of-week marginals as "
        "seasonality_lift_events (at most |event types| x 168 cells), "
        "recomputed at read over streaming-maintained raw cell counts"
    ),
    "outliers_events": (
        "build = per-group quantile fences — one row per event type "
        "(schema-bounded enum), the iqr_fences group contract"
    ),
    "winsorize_events": (
        "build = the same per-event-type fence relation as "
        "outliers_events — one row per schema-bounded group"
    ),
}


def main() -> int:
    import __spark_entry__ as entry
    from pyspark_datacol_diff_spark import get_spark
    from pyspark_datacol_diff_spark.plans import scale_lint

    spark = get_spark(app_name="scale-lint", master="local[8]",
                      shuffle_partitions=8)
    report: dict[str, list[dict[str, str]]] = {}
    counts = {"error": 0, "warn": 0, "info": 0}
    n_clean = 0
    for name, fn in entry.queries().items():
        try:
            findings = scale_lint(
                fn(spark, SF_DIR),
                declared_exact_baseline=DECLARED_EXACT.get(name),
                declared_bounded_broadcast=DECLARED_BOUNDED.get(name),
            )
        except Exception as e:  # a query that cannot even plan is an error
            findings = [{"code": "plan_failure", "severity": "error",
                         "detail": repr(e)}]
        if findings:
            report[name] = findings
            for f in findings:
                counts[f.get("severity", "warn")] = (
                    counts.get(f.get("severity", "warn"), 0) + 1
                )
        else:
            n_clean += 1
        # iterative operators persist at branch points during planning
        spark.catalog.clearCache()
    report["__summary__"] = {
        "queries": len(entry.queries()),
        "clean": n_clean,
        **{f"n_{k}": v for k, v in counts.items()},
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report["__summary__"]))
    return 1 if counts["error"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
