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

# Headline set: the core diff at bench scale, relational breadth, and the
# training-data-pipeline extensions.
BENCH_QUERIES = [
    "diff_orders_flags",
    "diff_orders_detail",
    "diff_lineitem_flags",
    "digest_orders",
    "zorder_key_events",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_profit_by_nation",
    "q13_custdist",
    "q5_local_supplier",
    "q4_order_priority",
    "q12_late_lines_by_status",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "q17_small_quantity",
    "topk_orders_per_customer",
    "agg_orders_by_segment",
    "events_hourly",
    "asof_click_view",
    "range_join_click_error",
    "window_user_running",
    "window_user_range_frame",
    "session_window_events",
    "funnel_events",
    "outliers_events",
    "date_funcs_events",
    "array_funcs_lineitem",
    "agg_event_stats",
    "json_events_props",
    "cube_orders_status_priority",
    "dedup_exact_docs",
    "dedup_incremental_docs",
    "text_stats_docs",
    "lang_id_docs",
    "repetition_docs",
    "pipeline_training_corpus",
    "fingerprint_rolling_docs",
    "ngram_jaccard_docs",
    "dedup_cluster_docs",
    "chunk_docs",
    "vocab_topk_docs",
    "pack_sequences_docs",
    "tfidf_top_docs",
    "bm25_docs",
    "span_dedup_docs",
    "two_stage_agg_events",
    "ann_topk_cosine",
    "ann_topk_arrow",
    "ann_ivf_topk",
    "ann_topk_quantized",
    "minhash_native_docs",
    "simhash_docs",
    "salted_join_events",
    # lsh_near_dup_recall stays out: it deliberately runs the exact
    # O(n^2) verify next to the LSH path (a correctness gate, not a
    # throughput headline)
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

    # untimed warmup: run the first headline query end-to-end once so the
    # timed loop measures queries, not JVM/codegen/shuffle cold-start
    # (a plain scan+agg warmup left the first timed query absorbing ~2.5 s
    # of sort-merge-join and wide-projection codegen JIT). This is the
    # steady-state a long-lived cluster actually runs at.
    qs[BENCH_QUERIES[0]](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators persist() at branch points; drop those blocks so one
        # query's cache never squeezes the next query's execution memory
        spark.catalog.clearCache()

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
