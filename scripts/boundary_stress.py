#!/usr/bin/env python3
"""Boundary-stress parity sweep: copy the sf0.001 tables, INJECT
measure-zero edge rows (exact session-gap timestamps, duplicate
timestamps, histogram bin-edge values, empty/short/duplicate texts,
zero and quantization-boundary vectors), and re-run the SQL-exact
query subset against the DuckDB oracles on the stressed data.

Rationale: the per-round parity sweep validates on driver testdata,
whose continuous distributions almost surely avoid boundary events —
the round-4 session-gap comparator question (`>` vs `>=` at an exact
30:00 gap) was undetectable on that data by construction. This sweep
makes the boundary class mechanically checkable: any comparator or
rounding convention that differs between the Spark operator and its
oracle flips a row here and fails the hash.

Scope: the SQL-exact queries over events/documents/embeddings. Gate
queries that PIN data-dependent constants (recall gates, fixture-pinned
counts) are excluded by design — their oracles assume driver-data
properties the stress set deliberately violates.

Usage: python3 scripts/boundary_stress.py [out_dir_kept_if_given]
Exit 0 = all pass.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.001"

QUERIES = [
    # session family: exact-gap events are THE case
    "session_window_events",
    "session_stats_events",
    "streaming_sessions",
    # histogram family: bin-edge values, duplicate values
    "hist_event_value",
    "hist_quantiles_event_value",
    "len_hist_by_source_docs",
    "len_pctile_by_source_docs",
    # time bucketing / ordering: duplicate + week-boundary timestamps
    "events_hourly",
    "change_intervals_events",
    "wow_change_events",
    "latest_event_per_user",
    "ffill_user_purchase",
    # join boundaries: simultaneous click/view, exact range edges
    "asof_click_view",
    "asof_forward_click_purchase",
    "range_join_click_error",
    # text edges: empty/one-token/exact-duplicate docs
    "text_stats_docs",
    "repetition_docs",
    "bigram_counts_docs",
    "token_rarity_docs",
    "ngram_jaccard_docs",
    "dedup_cluster_docs",
    # embedding edges: zero vector, quantization-boundary components
    "srp_near_dup_embed",
    "srp_dedup_embed",
    "embed_dim_stats",
    # diff family: NULL and empty-string compare fields (reference
    # P1/P11 null-vs-blank convention), null arithmetic in the s2
    # mutation arm, null order dates in the drilldown predicates
    "diff_orders_detail",
    "diff_orders_flags",
    "diff_orders_col_counts",
    "diff_drilldown_status",
    "digest_orders",
    "merge_upsert_orders",
    # ordering-sensitive event pipelines: simultaneous view/click/
    # purchase (u2) stresses strictly-after funnel stages, zero
    # conversion latency, path tie-breaks; exact window-boundary and
    # duplicate timestamps stress OHLC/hopping/resample bucketing
    "funnel_events",
    "conversion_latency_events",
    "event_paths_users",
    "retention_cohorts_events",
    "rfm_segments_events",
    "ohlc_user_hourly",
    "resample_user_hourly",
    "hopping_window_events",
    "user_trend_features",
    "copurchase_pairs_lineitem",
    # round-5 additions: winsorize fences hit the injected extreme /
    # duplicate-at-fence values (percentile_disc tie conventions);
    # diverse sampling sees the zero vector (every SRP dot == 0, the
    # d >= 0 sign boundary fires ALL plane bits) and exact-duplicate
    # vectors sharing a bucket; the MG sketch walks the empty/
    # single-token/duplicate docs; scoped diff digests the NULL and
    # empty-string compare fields through its bucket hashing.
    # (pagerank_copurchase reads only the UNstressed lineitem copy —
    # running it here would duplicate plain parity, so it is omitted.)
    "winsorize_events",
    "diverse_sample_embed",
    "heavy_hitters_docs",
    "heavy_hitters_by_source_docs",
    "streaming_heavy_hitters",
    "scoped_diff_orders",
    # first-seen ties under duplicate timestamps + the ISO-week
    # boundary event exercise the acquisition curve's min-date grain
    "cumulative_users_daily",
    # round-6 additions: duplicate timestamps are THE sweep-line tie
    # case (RANGE-frame simultaneous +1/-1), sub-1s values make
    # zero-length intervals; the zero/boundary vectors hit the pair
    # miner's zero-norm guard and Lloyd's ties; empty docs floor the
    # audio n_samples formula; benford sees the stressed value column
    "max_concurrency_events",
    "kmeans_cosine_pairs_embed",
    "multimodal_audio_features",
    "benford_orders",
    # duplicate timestamps are the TWAP tiebreak case (zero-length
    # segments must vanish identically in both engines); the stressed
    # orders' NULL/epoch dates walk scd2's half-open version windows;
    # gini sees the injected event-type mix edges. (knn_eval_embed and
    # the ann family stay out: a stressed ZERO vector makes cosine
    # NaN-ordered — engine-dependent by construction, same reason
    # ann_topk_cosine is excluded.)
    "twap_user_hourly",
    "gini_event_mix_users",
    "scd2_enrich_orders",
    # duplicate-timestamp bursts land in one hour bucket — the CUSUM
    # prefix windows must agree through the tied aggregate. (part and
    # lineitem ship UNstressed copies, so sorted_neighborhood_parts /
    # khop_copurchase here would just duplicate plain parity — omitted
    # like pagerank_copurchase.)
    "cusum_hourly_events",
    # round-7 additions: empty/one-token/exact-duplicate docs walk the
    # TTR tokenizer (token != '' filter + integer DIV at tiny
    # denominators); duplicate timestamps + stressed values hit the
    # decay's bround/shift at the age boundary; the decimated audio
    # path re-walks the empty-doc n_samples floor through the stride
    # ceil. (mutual_knn_embed stays out with the ann family: the
    # stressed zero vector makes cosine NaN-ordered. er_score_parts /
    # labelprop / triples read only UNstressed part/lineitem copies —
    # omitted like khop_copurchase.)
    "ttr_by_source_docs",
    "decayed_score_users",
    "multimodal_audio_decimate",
    # empty/one-token docs produce empty shingle sets (absent from the
    # join universe on both sides); exact-duplicate docs sit AT the
    # jaccard=1 boundary of the prefix filter's >= threshold
    "prefix_jaccard_docs",
    # duplicate timestamps are THE attribution tie case (the explicit
    # event_id tiebreak must pick the same first/last touch in both
    # engines); the injected exact 30:00 gap walks the strict-> session
    # break comparator
    "attribution_user_clicks",
    # round-8 additions: duplicate timestamps walk the transition
    # matrix's (ts, event_id) lag tiebreak — simultaneous events must
    # produce the same step sequence in both engines; the duplicate
    # embedding pair (vec_id 90_000_005 passes the %5 probe subset)
    # sits at the IVF mutual-kNN path's sim=1.0 tie and quantization
    # boundary (the exact mutual_knn_embed stays excluded with the ann
    # family — zero-vector NaN cosine — but the IVF path filters
    # zero norms on BOTH sides by contract, so it is boundary-safe)
    "markov_transitions_events",
    "mutual_knn_ivf_embed",
    # late round-8 additions: empty/one-token docs produce zero
    # skip-gram pairs and zero phrase alignments (must drop out of
    # both engines identically — the size(tk) >= k filter vs the SQL
    # range bound); exact-duplicate docs double pair counts without
    # changing lifts' marginal ratios; duplicate timestamps land in
    # one hour-of-week cell for the seasonality lift's tied counts.
    # (edge_jaccard_copurchase reads only the UNstressed lineitem;
    # hits_parts_customers' stressed orders rows join no lineitem row
    # — both would duplicate plain parity, omitted like pagerank.)
    "skipgram_pmi_docs",
    "phrase_search_docs",
    "seasonality_lift_events",
    # the injected bin-edge / below-lo / duplicate values are exactly
    # the quantile-rank min-rank-tie class and sit in the KS prefix
    # sums at the distribution tails; the duplicated doc pair shifts
    # vocab_growth's token volumes without adding types; the streaming
    # seasonality must fold the duplicate-timestamp burst through the
    # same cells as the batch path
    "quantile_rank_events",
    "ks_drift_events",
    "vocab_growth_docs",
    "streaming_seasonality_events",
    # the injected exact 30:00 gap is the session-end boundary (end =
    # last event + gap lands exactly ON an interval edge — half-open
    # must exclude the touch) and duplicate timestamps stress the
    # overlap join's session construction on both engines
    "session_error_overlap_events",
    # r09: the injected empty/one-token/below-k docs are the winnowing
    # short-doc conventions (no grams / one window-of-all) and shift
    # doc_keywords' df counts; the duplicate doc pair must produce a
    # shared-fingerprint pair and a pure 2-component; duplicate
    # timestamps put a 0 gap in the interarrival census; bin-edge and
    # negative cents sit on the MAD median/deviation boundaries; the
    # zero vector and exactly-integral x*1e6 elements are the coherence
    # quantization floor cases. (join_skew reads only unstressed
    # lineitem/part — omitted like pagerank.)
    "winnow_fp_docs",
    "winnow_pairs_docs",
    "doc_keywords_docs",
    "cluster_purity_docs",
    "mad_outliers_events",
    "interarrival_users",
    "label_coherence_embed",
    # r10 (VERDICT r09 #4): the four unstressed r09-wave queries. The
    # injected u5/u6 rows sit exactly AT and 1us PAST the funnel's
    # within_seconds <= bound; the u7 burst puts four simultaneous rows
    # through the order-sensitive CUSUM prefix fold (and the streaming
    # time-splits' (ts, event_id) tiebreak); the Sunday-23:59:59.999999
    # / Monday-00:00 / DST-instant rows pin the hour-of-week cell map
    # at its boundaries; the six 100-event users put top_share's
    # top_k=5 cut mid-tie, decided only by the ascending-id tiebreak.
    "funnel_windowed_events",
    "streaming_cusum_events",
    "seasonal_residuals_events",
    "top_share_users_events",
    # r11 (VERDICT r10 #7): the r10 wave. (a) the injected "tiedx"
    # event type has a FULLY-TIED x column — rho is defined only by the
    # documented (x, event_id) total-order tiebreak, pinned here
    # hash-exact against the oracle's identical row_number ranks;
    # (c) srcONE is a one-token group and srcDUP an all-duplicate-token
    # group for the diversity/hapax censuses (D=0 boundaries, hapax=0);
    # (d) user u8 walks collapse_repeats through a LEADING NULL type,
    # a NULL-vs-NULL adjacent run, and a simultaneous-timestamp pair
    # decided only by the event_id tiebreak; (e) the 90_000_008/9 dup
    # pair is its own 2-cluster with a 50/50 lang tie (value-ASC
    # tiebreak must elect "aa") and an all-NULL source field; the
    # injected NULL/""-status and NULL-priority orders rows walk the
    # pivot's explicit-value columns and NULL groupBy group, and the
    # NULL-custkey orders walk q18/q22's join/anti-join key boundaries.
    # chi2_source_lang_docs sees the srcONE/srcDUP cells plus the
    # (NULL, NULL)-category documents row — NULL categories are real
    # cells by contract. (weighted_sample_aes_docs is EXCLUDED by
    # design: the injected empty doc has n_chars=0 and the operator's
    # contract is an execution-time raise on non-positive weights —
    # pinned by tests/test_round10_ops.py, not replayable as a hash.)
    "spearman_trend_events",
    "chi2_source_lang_docs",
    "simpson_diversity_docs",
    "hapax_by_source_docs",
    "golden_record_docs",
    "collapse_repeats_events",
    "block_volume_winnow_docs",
    "pivot_orders_status_priority",
    "q18_large_volume_customers",
    "q22_idle_balance_customers",
]


def synth(out: str) -> None:
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")

    # orders: NULL and empty-string compare fields — the reference's
    # null-vs-blank compare convention (SURVEY P1/P11) at its boundary.
    # Keys are chosen so the injected rows take every diff route: both
    # sides unchanged (null==null, ''==''), s2-mutated, and one-sided.
    # 900001 % 101 != 0 and % 97 != 0 -> both sides; 900002 likewise;
    # 900100 % 11 == 0 via custkey mutation uses arithmetic on NULL.
    con.execute(
        "CREATE TABLE oinj (o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP, o_orderpriority VARCHAR)"
    )
    con.executemany(
        "INSERT INTO oinj VALUES (?, ?, ?, ?, ?, ?)",
        [
            (900001, None, None, 0.0, dt.datetime(2024, 1, 1), ""),
            (900002, 7, "", 0.0, dt.datetime(2024, 1, 1), None),
            (900108, None, "", None, None, None),  # % 11 == 0: null+1e6 arm
            (900107, 8, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        ],
    )
    con.execute(
        f"COPY (SELECT * FROM '{BASE}/orders.parquet' UNION ALL "
        f"SELECT * FROM oinj) TO '{out}/orders.parquet' (FORMAT PARQUET)"
    )

    b = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = []
    eid = 90_000_000
    def add(ts, user, etype, value, props='{"k": 1}'):
        nonlocal eid
        ev.append((eid, ts, user, etype, value, props))
        eid += 1
    u = 9_000_001
    # exact 30:00 session gap, then 30:00 + 1us, then equal timestamps
    add(b, u, "view", 10.0)
    add(b + dt.timedelta(minutes=30), u, "click", 20.0)
    add(b + dt.timedelta(minutes=60, microseconds=1), u, "view", 30.0)
    add(b + dt.timedelta(minutes=60, microseconds=1), u, "click", 30.0)  # dup ts
    # a click and a view at the SAME instant (as-of tie), purchase exactly at click ts
    u2 = 9_000_002
    add(b, u2, "view", 5.0)
    add(b, u2, "click", 5.0)
    add(b, u2, "purchase", 5.0)
    # histogram bin edges: cents exactly at bin boundaries 0, 1000, 49999, 50000 (clamp)
    u3 = 9_000_003
    add(b + dt.timedelta(hours=1), u3, "error", 0.0)
    add(b + dt.timedelta(hours=1, seconds=1), u3, "error", 10.0)       # 1000 cents
    add(b + dt.timedelta(hours=1, seconds=2), u3, "error", 499.99)     # 49999
    add(b + dt.timedelta(hours=1, seconds=3), u3, "error", 500.0)      # 50000 clamps
    add(b + dt.timedelta(hours=1, seconds=4), u3, "error", -0.01)      # below lo
    # exact ISO week boundary (Monday 00:00) for date_trunc('week')
    add(dt.datetime(2024, 1, 8, 0, 0, 0), u3, "signup", 1.0)
    # NEGATIVE values (r08): the decayed-sum floor-vs-truncate boundary.
    # The table's anchor (max date, ~Jan 30) puts these ~29-31 days old,
    # so each negative scaled value shifts to -1 under the pinned
    # arithmetic-shift (floor) convention but to 0 under truncating
    # DIV / // — any engine-side convention drift flips the hash here.
    # -0.005 also walks bround's round-half-even at a negative half.
    u4 = 9_000_004
    add(b - dt.timedelta(days=1), u4, "refund", -0.05)   # -5 >> 30 = -1
    add(b - dt.timedelta(days=2), u4, "refund", -0.01)   # -1 >> 31 = -1
    add(b - dt.timedelta(days=1), u4, "refund", -0.005)  # bround -> 0
    add(b, u4, "refund", -1.27)                          # -127 >> 29 = -1
    # r10 (VERDICT r09 #4a): funnel stage landing EXACTLY at
    # within_seconds=1800 — the <= inclusive boundary must convert...
    u5 = 9_000_005
    add(b, u5, "view", 1.0)
    add(b + dt.timedelta(seconds=1800), u5, "click", 1.0)
    add(b + dt.timedelta(seconds=3600), u5, "purchase", 1.0)
    # ...and 1 microsecond past it must NOT
    u6 = 9_000_006
    add(b, u6, "view", 1.0)
    add(b + dt.timedelta(seconds=1800, microseconds=1), u6, "click", 1.0)
    # r10 (#4b): a simultaneous-timestamp burst for the order-sensitive
    # CUSUM prefix fold — four rows at ONE instant with mixed signs of
    # (cents - drift), distinct event_ids; the (ts, event_id) tiebreak
    # must produce the same prefix in the streaming time-splits (rows
    # may straddle a batch boundary) and the batch SQL
    u7 = 9_000_007
    add(b + dt.timedelta(hours=2), u7, "burst", 100.0)
    add(b + dt.timedelta(hours=2), u7, "burst", 0.0)
    add(b + dt.timedelta(hours=2), u7, "burst", -50.0)
    add(b + dt.timedelta(hours=2), u7, "burst", 20.0)
    # r10 (#4c): hour-of-week cell boundaries for the seasonal residual
    # census — last microsecond of the ISO week (Sunday 23:59:59.999999,
    # cell 167) against the existing Monday-00:00 row (cell 0), plus the
    # EU DST-transition instant (2024-03-31 01:30 UTC): both engines run
    # UTC so the cell must be the plain UTC hour-of-week, not a
    # locale-shifted one
    add(dt.datetime(2024, 1, 7, 23, 59, 59, 999999), u3, "error", 2.0)
    add(dt.datetime(2024, 3, 31, 1, 30, 0), u3, "error", 3.0)
    # r10 (#4d): a top_share tie AT the k-th rank — six injected users
    # with identical 100-event counts outrank every organic user (max 88
    # at sf0.001), so the top_k=5 cut lands mid-tie and only the
    # ascending-user_id tiebreak decides membership; both engines must
    # pick users 9_100_001..9_100_005
    for tied_u in range(9_100_001, 9_100_007):
        for i in range(100):
            add(
                b + dt.timedelta(days=3, seconds=7 * i),
                tied_u,
                "tick",
                1.0,
            )
    # r11 (#7a): a FULLY-TIED x column — every "tiedx" event has the
    # same cents value, so Spearman's rho is defined ONLY by the
    # (x, event_id) tiebreak order; both engines must produce the same
    # (deterministic, documented) tie-broken statistic
    u9 = 9_000_009
    for i in range(6):
        add(b + dt.timedelta(hours=3, seconds=i), u9, "tiedx", 7.0)
    # r11 (#7d): collapse_consecutive NULL-run boundaries for user u8 —
    # a LEADING NULL type (must start a run, not vanish against the
    # missing lag), a NULL-vs-NULL adjacent pair (one run, collapse),
    # then a click, then TWO SIMULTANEOUS rows whose keep/drop order is
    # decided only by the ascending event_id tiebreak, then NULL again
    # (a new run after a non-NULL)
    u8 = 9_000_008
    add(b + dt.timedelta(hours=4), u8, None, 1.0)
    add(b + dt.timedelta(hours=4, seconds=1), u8, None, 1.0)
    add(b + dt.timedelta(hours=4, seconds=2), u8, "click", 1.0)
    add(b + dt.timedelta(hours=4, seconds=3), u8, "click", 1.0)  # dup ts pair
    add(b + dt.timedelta(hours=4, seconds=3), u8, "view", 1.0)   # same instant
    add(b + dt.timedelta(hours=4, seconds=4), u8, None, 1.0)
    con.execute(
        "CREATE TABLE inj (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO inj VALUES (?, ?, ?, ?, ?, ?)", ev)
    con.execute(
        f"COPY (SELECT * FROM '{BASE}/events.parquet' UNION ALL "
        f"SELECT * FROM inj) TO '{out}/events.parquet' (FORMAT PARQUET)"
    )

    docs = [
        (90_000_001, "", "en", "srcX", 0),                       # empty text
        (90_000_002, "word", "en", "srcX", 4),                   # single token
        (90_000_003, "two tokens", "en", "srcX", 10),            # below 3-gram
        (90_000_004, "exactly three tokens", "en", "srcX", 20),  # one 3-gram
        (90_000_005, "exactly three tokens", "en", "srcX", 20),  # exact dup pair
        (90_000_006, "a  b\tc   d", "en", "srcX", 10),           # whitespace runs
        (90_000_007, "x " * 100, "en", "srcX", 200),             # n_chars bin edge
        # r11 (#7e): an exact-duplicate pair forming its OWN 2-member
        # cluster with a 50/50 lang tie (count tie -> value-ASC
        # tiebreak must elect "aa" in both engines) and an all-NULL
        # source field (the election has no candidate rows — the
        # pivoted field must come back NULL identically)
        (90_000_008, "golden tie record pair", "aa", None, 22),
        (90_000_009, "golden tie record pair", "bb", None, 22),
        # r11 (#7c): a one-token source group (hapax=1, types=1 -> the
        # diversity index's n*(n-1) denominator floor) and an
        # all-duplicate-token group (types=1, hapax=0, D=0)
        (90_000_010, "solo", "en", "srcONE", 4),
        (90_000_011, "dup dup dup dup", "en", "srcDUP", 15),
        (90_000_012, "dup dup", "en", "srcDUP", 7),
        # r11: a both-NULL-category documents row — chi2's (NULL, NULL)
        # contingency cell is a real cell by contract
        (90_000_013, "null category cell row", None, None, 22),
    ]
    con.execute(
        "CREATE TABLE dinj (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO dinj VALUES (?, ?, ?, ?, ?)", docs)
    con.execute(
        f"COPY (SELECT * FROM '{BASE}/documents.parquet' UNION ALL "
        f"SELECT * FROM dinj) TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )

    # embeddings: zero vector, all-negative, quantization boundaries
    # (x*1e6 exactly integral: floor is the boundary case), plus an
    # exact duplicate pair for the near-dup path
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    dim = 64
    zero = [0.0] * dim
    qb = [f32((i % 7) * 1e-6) for i in range(dim)]        # tiny, exactly integral at 1e6
    neg = [f32(-0.5 - i * 0.001) for i in range(dim)]
    dup = [f32(0.25 + 0.01 * i) for i in range(dim)]
    vecs = [
        (90_000_001, zero, 0),
        (90_000_002, qb, 1),
        (90_000_003, neg, 2),
        (90_000_004, dup, 0),
        (90_000_005, dup, 1),
    ]
    con.execute(
        "CREATE TABLE einj (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO einj VALUES (?, ?, ?)", vecs)
    con.execute(
        f"COPY (SELECT * FROM '{BASE}/embeddings.parquet' UNION ALL "
        f"SELECT * FROM einj) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
    )


def check_ks_empty_group() -> bool:
    """The ks_statistic empty-group boundary (VERDICT r08 #4): an empty
    side is undefined — Spark would emit NULL and DuckDB would raise, so
    the operator must raise the SAME typed error in both worlds. The
    sweep cannot produce an empty group by injecting rows into a shared
    table (both event types exist in the base data), so the case runs
    as a dedicated in-process check: a one-sided frame must raise
    ValueError, and the same frame with both sides present must not."""
    from pyspark_datacol_diff_spark import get_spark
    from pyspark_datacol_diff_spark.operators.quality import ks_statistic

    spark = get_spark(
        app_name="boundary-ks", master="local[4]", shuffle_partitions=4
    )
    one_sided = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3)], ["grp", "v"]
    )
    try:
        ks_statistic(one_sided, "grp", "v", "a", "b")
    except ValueError as e:
        if "non-empty samples" not in str(e):
            print(f"ks_empty_group: FAIL (wrong error: {e})")
            return False
    else:
        print("ks_empty_group: FAIL (no raise on empty group_b)")
        return False
    both = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3)], ["grp", "v"]
    )
    r = ks_statistic(both, "grp", "v", "a", "b").collect()[0]
    ok = (r["n_a"], r["n_b"], r["ks_ppm"]) == (2, 2, 500000)
    print(
        "ks_empty_group: PASS (typed raise on empty side; exact ks on "
        "the good frame)" if ok else f"ks_empty_group: FAIL ({r})"
    )
    return ok


def check_chi2_degenerate() -> bool:
    """The chi2 degenerate-contingency boundaries (VERDICT r10 #7b):
    a 1x1 contingency (every row in ONE cell) has dof 0 and statistic
    exactly 0 — the sum-of-squares identity gives n*ppm - n*ppm with
    no truncation loss, so the 0 is exact, not approximate; a
    single-row table is the 1x1 case at n=1. Injecting these into the
    shared documents table is impossible (the base data already spans
    many cells), so they run as dedicated in-process checks."""
    from pyspark_datacol_diff_spark import get_spark
    from pyspark_datacol_diff_spark.operators.quality import chi2_ppm

    spark = get_spark(
        app_name="boundary-chi2", master="local[4]", shuffle_partitions=4
    )
    one_cell = spark.createDataFrame([("a", "x")] * 7, ["r", "c"])
    r = chi2_ppm(one_cell, "r", "c").collect()[0]
    ok1 = (
        r["n"], r["n_row_cats"], r["n_col_cats"], r["dof"], r["chi2_ppm"]
    ) == (7, 1, 1, 0, 0)
    single_row = spark.createDataFrame([("a", None)], "r string, c string")
    s = chi2_ppm(single_row, "r", "c").collect()[0]
    ok2 = (
        s["n"], s["n_row_cats"], s["n_col_cats"], s["dof"], s["chi2_ppm"]
    ) == (1, 1, 1, 0, 0)
    print(
        "chi2_degenerate: PASS (1x1 and single-row both exact-zero, "
        "dof 0)" if ok1 and ok2
        else f"chi2_degenerate: FAIL (1x1={dict(r.asDict())}, "
        f"single={dict(s.asDict())})"
    )
    return ok1 and ok2


def main() -> int:
    keep = len(sys.argv) > 1
    out = sys.argv[1] if keep else tempfile.mkdtemp(prefix="dcd_boundary_")
    os.makedirs(out, exist_ok=True)
    try:
        synth(out)
        rc = subprocess.call(
            [sys.executable, os.path.join(os.path.dirname(__file__), "parity.py"),
             "--sf", out, *QUERIES]
        )
        if not check_ks_empty_group():
            rc = rc or 1
        if not check_chi2_degenerate():
            rc = rc or 1
        return rc
    finally:
        if not keep:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
