#!/usr/bin/env python3
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is fully materialized through the noop sink (no driver-side
collect cost, no rows skipped — the whole plan executes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

# Headline set: one query per DISTINCT plan shape. The r02 bench timed 53
# queries and per-query job overhead (~0.2-1 s each) drowned real deltas;
# this set keeps the ~43 shapes that exercise different physical plans and
# leaves same-shape variants (q4/q5/q12/q13/q19 scan-agg-join family,
# window_user_running vs range_frame, ann_topk_arrow/quantized vs cosine,
# chunk/vocab/tfidf explode-agg family, per-row-expression family) to the
# correctness gate. Every name below except the round-3 additions also
# appeared in BENCH_r02, so round-over-round per-query comparison holds.
BENCH_QUERIES = [
    "diff_orders_detail",        # full-outer SMJ diff, wide projection
    "diff_lineitem_flags",       # composite-key diff + flag aggregate
    "digest_orders",             # grouping-free per-column digest
    "q1_pricing_summary",        # scan + hash aggregate
    "q3_shipping_priority",      # broadcast join + TakeOrdered top-k
    "q9_profit_by_nation",       # 5-way join tree
    "q17_small_quantity",        # scalar-subquery BNLJ
    "q21_waiting_supplier",      # semi + anti self-joins
    "topk_orders_per_customer",  # partitioned window top-k
    "events_hourly",             # time-bucket aggregate
    "asof_click_view",           # as-of join
    "range_join_click_error",    # interval range join
    "window_user_range_frame",   # RANGE-frame running window
    "session_window_events",     # native session window
    "funnel_events",             # ordered 3-stage funnel, one sort
    "outliers_events",           # quantile fences + scalar broadcast
    "json_events_props",         # JSON extraction
    "cube_orders_status_priority",  # CUBE rollup (Expand)
    "text_stats_docs",           # pure-Column text expressions
    "repetition_docs",           # zero-shuffle array fold
    "pipeline_training_corpus",  # multi-stage corpus pipeline
    "ngram_jaccard_docs",        # posting-list bucketed pair join
    "dedup_cluster_docs",        # iterative connected components
    "pack_sequences_docs",       # hash-bucketed greedy packing
    "bm25_docs",                 # broadcast df-join scoring + top-k
    "span_dedup_docs",           # groupBy min-struct survivor election
    "ann_topk_cosine",           # brute-force cosine top-k
    "ann_ivf_topk",              # IVF cell-probe top-k
    "minhash_native_docs",       # signature agg + band self-join
    "simhash_docs",              # 64-bit signature + pigeonhole bands
    "salted_join_events",        # skew-salted replicate/route join
    # new shapes in round 3 (no BENCH_r02 counterpart):
    "change_intervals_events",   # gaps-and-islands, one reused exchange
    "profile_orders",            # unpivot + per-column distinct aggregate
    "hopping_window_events",     # sliding windows: Expand + partial agg
    "ohlc_user_hourly",          # struct-min/max OHLC bars (SortAggregate)
    "event_paths_users",         # sequence build + trigram count
    # new shapes in round 4:
    "digest_tree_orders",        # dual-scan Merkle trees + grain join
    "triangle_counts_docs",      # degree-oriented wedge-closing joins
    "bloom_semi_join_lineitem",  # bitset-literal probe prune + semi join
    "bigram_counts_docs",        # zip_with gram build + map-combined agg
    "hist_event_value",          # algebraic fixed-bin histogram
    "ffill_user_purchase",       # keyed-window forward fill
    "latest_event_per_user",     # max_by top-1-per-group (no window)
    "streaming_dedup_events",    # watermarked stateful streaming dedup
    #   (the one streaming-family headline: micro-batch replay through
    #   real StateStore dedup; the other streaming shapes share its
    #   source/trigger machinery and stay on the correctness gate)
    # new shapes in round 5:
    "cc_star_docs",              # alternating-star CC (O(log n) fallback)
    "srp_near_dup_embed",        # exact-int SRP signatures + band join
    # lsh_near_dup_recall stays out: it deliberately runs the exact
    # O(n^2) verify next to the LSH path (a correctness gate, not a
    # throughput headline)
    # new shapes in round 6:
    "q2_min_cost_supplier",      # synthesized partsupp + window-min + TakeOrdered
    "diff_orders_skewed",        # hot-key full-outer diff (20% on one key)
    "kmeans_cells_embed",        # driver-coordinated integer Lloyd rounds
    "kmeans_cosine_pairs_embed",  # Lloyd-cell-bucketed cosine pair join
    "max_concurrency_events",    # sweep-line: two-phase prefix scan
    "multimodal_audio_features",  # heavy per-row byte-decode projection
    # round 7: the graph family is the cost center (3 of r06's 5 most
    # expensive operators) — headline visibility is what caught the
    # round-6 pair-graph drift, so these now ride the bench instead of
    # entering only through SCALETEST
    "pagerank_copurchase",       # 3 exact-integer rank rounds
    "kcore_copurchase",          # 4 peel rounds, semi/anti survivor joins
    "khop_copurchase",           # bounded-hop BFS frontier expansion
    "prefix_jaccard_docs",       # AllPairs prefix-filtered set-sim join
    # new shapes in round 8:
    "edge_jaccard_copurchase",   # capped wedge expansion scoring edges
    "hits_parts_customers",      # 2-round bipartite join+agg iteration
    "skipgram_pmi_docs",         # in-row windowed pair expansion + PMI
    "mutual_knn_ivf_embed",      # IVF cell-join kNN + reciprocal semi
    # new shapes in round 9:
    "winnow_pairs_docs",         # window-min fingerprints + posting join
    "doc_keywords_docs",         # vocab-grain AQE df-join + per-doc top-k
    "label_coherence_embed",     # posexplode (label, pos) integer sums
    "cluster_purity_docs",       # CC fixpoint + two-level purity agg
    # new shapes in round 10:
    "pivot_orders_status_priority",  # explicit-values pivot aggregate
    "spearman_trend_events",     # dual row_number windows, one partition
    "golden_record_docs",        # CC + unpivot + counted-grain elections
    "hapax_by_source_docs",      # (group, token)-grain two-level agg
    # new shapes in round 11 (the three statistics — MWU, ACF, kappa —
    # share the ks/spearman/chi2 plan families already on the bench and
    # stay on the correctness gate):
    "tv_source_docs",            # token-grain marginal join + keyed reduce
    "kmv_distinct_docs",         # per-group bottom-k window over vocab grain
]


def main() -> None:
    from pyspark_datacol_diff_spark import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )

    qs = entry.queries()

    # Per-query warm-up: run each query once UNTIMED, then time the
    # second execution. First executions pay one-off JVM/codegen JIT for
    # that query's operator shapes (measured 2-6x on the explode/agg
    # families: pipeline 12.5s cold vs 2.2s steady); a long-lived
    # cluster runs at steady state, which is what the headline measures.
    # Caches are cleared between runs, so the warm run warms CODE paths,
    # never data. Set SPARK_GRAFT_BENCH_WARM=0 to measure cold-start.
    warm = os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0"
    # Median of N timed runs per query (default 3): single-run numbers
    # carried +/-0.3 s co-run drift in BENCH_r04, large enough to hide
    # real 20% regressions on sub-2s queries. The median is robust to
    # one GC/scheduling hiccup; the per-query spread (max-min across
    # the timed runs) is reported alongside so round-over-round deltas
    # smaller than the spread are read as noise, not regressions.
    # cold-start mode forces a single timed run unless RUNS is set
    # explicitly: median([cold, warm, warm]) would silently report a
    # steady-state number under the cold-start flag
    default_runs = "3" if warm else "1"
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", default_runs)))

    # operators persist()/localCheckpoint() at branch points; the
    # shared quiesce recipe (clearCache + checkpoint-block release +
    # full GC) isolates every timed run — see session.quiesce_session
    from pyspark_datacol_diff_spark import quiesce_session

    def quiesce():
        quiesce_session(spark)

    # Box-drift canary (VERDICT r09 #1a, same discipline as the
    # SCALETEST gate's two_stage_agg_events): a deliberately boring,
    # never-edited plan timed with the IDENTICAL warm/median-of-runs
    # methodology and recorded IN the headline artifact. Round N+1's
    # canary_sec / round N's canary_sec is the box-epoch factor — the
    # mechanical adjudication of "did the driver box slow down or did
    # the code": per-query drift claims divide by it instead of being
    # argued from local re-runs. The canary is NOT in BENCH_QUERIES
    # and its time is NOT part of the headline total.
    CANARY = "two_stage_agg_events"

    def _timed(name: str) -> tuple[float, float, float]:
        if warm:
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            quiesce()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
            quiesce()
        samples.sort()
        return (
            round(samples[len(samples) // 2], 3),
            round(samples[-1] - samples[0], 3),
            round(samples[0], 3),
        )

    canary_sec, _canary_spread, _canary_min = _timed(CANARY)

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        timings[name], spreads[name], mins[name] = _timed(name)

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0)
    # r06 format fix (VERDICT r05 "What's wrong" #1): the driver parses the
    # FINAL stdout line through a bounded tail-capture window. r05 appended
    # the per-query `spread` dict to the single line, which pushed the
    # line's head (metric/value) out of the window and the driver recorded
    # parsed:null. Methodology metadata (spread, runs, warm flag) now goes
    # on a PRECEDING line; the final line is the compact headline JSON only.
    print(
        json.dumps(
            {
                "meta": "bench_methodology",
                # warm_per_query=true: each query timed on its SECOND+
                # executions (caches cleared between runs; JIT warm, data
                # cold). Per-query value = MEDIAN of `runs` timed
                # executions; `spread` = max-min of those runs (the noise
                # band: round-over-round deltas inside a query's spread
                # are run noise, not regressions).
                "warm_per_query": warm,
                "runs": runs,
                # canary_sec: the never-edited two_stage_agg_events plan
                # timed with the same methodology; cross-round ratio of
                # canary_sec IS the box-epoch factor (see comment at
                # CANARY above). Excluded from the headline total.
                "canary": CANARY,
                "canary_sec": canary_sec,
                "spread": spreads,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                # r12 additions (VERDICT r11 #5), additions-only — every
                # pre-existing key above is byte-identical in meaning:
                # `spread` = max-min of the timed runs per query (the
                # noise band: a cross-round delta inside it is run
                # noise); `qmin` = min-of-runs per query (the
                # noise-resistant point estimate). Medians in `queries`
                # stay the headline so round-over-round comparison of
                # the existing keys is unbroken.
                "spread": spreads,
                "qmin": mins,
                "canary": {"name": CANARY, "sec": canary_sec},
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
