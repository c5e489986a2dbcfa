"""Source/sink helpers.

Reference-parity surface (SURVEY.md §2.1): header-only all-string CSV
scan (S1 — `tests/test_find_datacol_diff.py:20-22` in the reference),
console display of the diff's array column via to_json (S2 —
`README.md:45`), stats sink (S3). Plus the parquet reading conventions
the driver testdata needs and scale-aware write helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def balance_partitions(df: DataFrame, *, min_ratio: float = 0.5) -> DataFrame:
    """Rebalance under-partitioned scans before CPU-heavy per-row stages.

    A parquet scan can never run more concurrent tasks than it has
    row-group splits, whatever ``maxPartitionBytes`` says — a handful of
    small single-row-group files caps an expensive projection (shingling,
    per-pair scoring, regex stats) at a handful of cores. If the input
    has fewer partitions than ``min_ratio x defaultParallelism``, round-
    robin repartition up to defaultParallelism; otherwise no-op. At real
    scale inputs carry many splits and this adds nothing; the rebalance
    shuffle moves only the raw input once and unlocks full-cluster
    parallelism for everything before the next keyed shuffle.

    Cost note: reading ``df.rdd.getNumPartitions()`` forces one
    driver-side plan-to-RDD conversion (planning only — no job, no data
    movement). Call this once per pipeline INPUT, right after the scan,
    not per downstream operator.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_ratio)):
        return df.repartition(target)
    return df


def no_pushdown(cond) -> "F.Column":
    """Pin a filter where it is written: OR the condition with an
    always-false non-deterministic arm (``monotonically_increasing_id()
    < -1``). A disjunction is a single unsplittable predicate, and a
    predicate containing a non-deterministic expression cannot move
    through exchanges — so the whole condition stays put.

    (The AND-a-true-guard form is NOT sufficient: the optimizer splits
    conjunctions and pushes the deterministic conjuncts on their own,
    which silently re-sinks the expensive predicate below the rebalance.
    ``tests/test_sources.py`` pins the blocked plan shape.)

    Use ONLY for compute-heavy predicates placed above
    ``balance_partitions``: predicate pushdown normally helps (smaller
    shuffles, parquet row-group skipping), but pushing an expensive
    regex/scoring predicate below the rebalance exchange re-serializes
    it onto the scan's few tasks — measured 3.5x slower on a
    single-row-group input. The guard costs one long comparison per row
    and changes no semantics (``cond OR false == cond``, including for
    null: ``null OR false`` is null, which filters the row exactly as a
    bare null condition would).
    """
    return cond | (F.monotonically_increasing_id() < -1)


def no_alias_inline(col) -> "F.Column":
    """Pin an EXPENSIVE projected column where it is computed: wrap it
    in a never-taken non-deterministic branch
    (``when(monotonically_increasing_id() < -1, col).otherwise(col)``).
    A non-deterministic projection cannot be alias-substituted by
    filter pushdown or collapsed by CollapseProject — so optimizer
    rules that would otherwise RE-INLINE the full expression somewhere
    it gets re-evaluated are fenced off, at the cost of one long
    comparison per row and no semantic change (the guard branch is
    impossible; both branches are ``col``).

    The motivating pathology (pinned by tests/test_round9_ops.py):
    ``explode(expensive_array_col)`` makes InferFiltersFromGenerate add
    ``size(col) > 0``, and PushDownPredicates then substitutes the
    alias — inlining the whole array expression into a Filter BELOW the
    projection, where nested higher-order functions lose their staging
    and re-evaluate per element (winnowing's gram-hash array went from
    seconds to >10 minutes at sf0.1). Use for columns like that one:
    costly to build, consumed by a generator or re-filtered downstream.
    """
    return F.when(F.monotonically_increasing_id() < -1, col).otherwise(col)


def read_csv_all_string(spark: SparkSession, path: str) -> DataFrame:
    """Header-only CSV read, every column StringType — the reference's
    input convention (no inferSchema). Schema inference over a 100 TB
    landing zone is a full extra scan; explicit or all-string schemas
    keep ingestion single-pass."""
    return spark.read.option("header", True).csv(path)


def read_csv_with_schema(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV with an explicit DDL schema (the at-scale path: typed columns
    without an inference scan)."""
    return spark.read.option("header", True).schema(schema).csv(path)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zone TIMESTAMP regardless
    of the physical layout the producer chose. Three layouts appear in the
    wild (and across driver testdata generations): TIMESTAMP(NANOS) read
    as epoch-nanos BIGINT under ``nanosAsLong``, TIMESTAMP_NTZ, and plain
    TIMESTAMP. Dispatching on the analyzed dtype keeps every downstream
    plan (windows, watermarks, as-of joins) identical across layouts."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table. ``events.parquet`` has carried
    TIMESTAMP(NANOS) (rejected by the vectorized reader unless read as
    long) in some generations and micros TIMESTAMP in others — enable the
    nanos fallback and normalize whatever comes back."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines source. Always pass ``schema`` at scale — inference
    samples the data with an extra scan and can mistype sparse fields;
    with an explicit DDL schema the read is single-pass and Spark prunes
    unreferenced fields from the parse."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)
    return r.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "error",
    compression: str | None = "gzip",
) -> None:
    """JSON-lines sink (the interchange format of text-corpus tooling).
    Compressed by default: JSONL is ~5-10x larger than parquet for the
    same rows, so uncompressed interchange dominates egress cost at
    scale. Keep parquet for anything re-read by this engine."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def show_diff(diff_df: DataFrame, n: int = 20, truncate: bool = False) -> None:
    """Console sink for diff results: the array-of-structs column is
    rendered via to_json so nested values are readable (reference
    README.md:45 display idiom)."""
    out = diff_df
    if "CompColArr" in out.columns:
        out = out.withColumn("CompColArr", F.to_json("CompColArr"))
    out.show(n, truncate=truncate)


def summary_table(summary_df: DataFrame) -> str:
    """Stats sink: the per-column mismatch summary as a printable table
    (reference tabulate idiom, S3) without a hard tabulate dependency."""
    pdf = summary_df.toPandas()
    try:
        from tabulate import tabulate  # type: ignore

        return tabulate(pdf, headers="keys", tablefmt="psql")
    except ImportError:
        return pdf.to_string()


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Parquet sink. ``partition_by`` low-cardinality columns for
    partition-pruned downstream scans (date/source/lang — never a key);
    at 100 TB aim for 128 MB-1 GB files per partition directory."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    num_files: int | None = None,
    mode: str = "error",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on
    ``cluster_cols`` (one sorted key range per output file) +
    ``sortWithinPartitions`` so every row group's min/max statistics are
    tight on the cluster key. Downstream range/point predicates on that
    key then skip whole files (range partitioning) AND whole row groups
    (parquet stats pushdown) — the portable substitute for a clustered
    index, and the single biggest scan-cost lever at 100 TB after
    partition pruning. Use for the key you filter by but can't
    directory-partition (high cardinality: timestamps, ids).
    """
    parts = (
        df.repartitionByRange(num_files, *cluster_cols)
        if num_files
        else df.repartitionByRange(*cluster_cols)
    )
    parts.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


_MORTON_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(x: "F.Column") -> "F.Column":
    """Interleave-ready bit spread: moves the low 31 bits of ``x`` to
    the even bit positions of a long (classic magic-mask doubling)."""
    v = x.bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _MORTON_MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton_key(a: "F.Column", b: "F.Column") -> "F.Column":
    """Z-order (Morton) key of two non-negative integer dimensions: bit-
    interleaves the low 31 bits of each, so rows close in EITHER
    dimension land close in the combined sort order. Sorting the data
    layout by this key gives tight parquet min/max statistics on BOTH
    columns at once — range-cluster on one column and predicates on the
    other skip nothing; Z-cluster and predicates on either column skip
    most row groups. Pure long bit arithmetic (shifts, masks, or) —
    codegen'd in Spark and replayable verbatim in any engine.
    """
    return _spread_bits(a.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits(b.cast("long")), 1)
    )


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    dim_a: str,
    dim_b: str,
    *,
    num_files: int | None = None,
    mode: str = "error",
) -> None:
    """Z-ordered parquet layout: range-partition + sort on the Morton
    key of two filter dimensions, then drop the key — the multi-column
    generalization of ``write_clustered_parquet`` for tables filtered
    by either (or both) of two high-cardinality columns."""
    z = df.withColumn("__z", morton_key(F.col(dim_a), F.col(dim_b)))
    parts = (
        z.repartitionByRange(num_files, "__z")
        if num_files
        else z.repartitionByRange("__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same vectorized/pushdown behavior as parquet (ORC is
    the other columnar format Spark reads natively; predicate pushdown
    and column pruning both apply)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "error",
) -> None:
    """ORC sink; same partitioning guidance as :func:`write_parquet`."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = True,
    mode: str = "error",
) -> None:
    """CSV sink (the reference's world is header CSVs — reference
    ``tests/test_pysparkdatacoldiff.py`` reads them with
    ``header=True``; this is the matching writer). CSV stringifies
    everything — an export/debug format, not the 100 TB interchange
    layout (use parquet/ORC)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    *,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Bucketed managed-table sink: pre-shuffles once at write so later
    equi-joins/aggs on ``bucket_cols`` skip their exchange entirely —
    the classic way to amortize the diff engine's join shuffle when one
    side is a stable reference snapshot diffed repeatedly."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def read_parquet_evolving(
    spark: SparkSession,
    path: str,
    *,
    target_schema=None,
) -> DataFrame:
    """Landing-zone read across schema generations. Without a
    ``target_schema``, ``mergeSchema`` unions the footer schemas of
    every file (a file written before a column existed yields NULL for
    it — Spark's per-file projection handles that for free). With one,
    the contract schema is passed straight to the reader — the catalog
    pattern: no footer sweep, missing columns materialize as typed
    NULLs, extra file columns are dropped; the target's types must be
    parquet-compatible with the files' physical types (widen AFTER the
    read with casts — the vectorized reader does not convert). Scale
    note: mergeSchema reads every file FOOTER up front, fine daily,
    wrong per-query on millions of files — which is why the
    target-schema form exists.
    """
    if target_schema is None:
        return spark.read.option("mergeSchema", "true").parquet(path)
    return spark.read.schema(target_schema).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_mb: int = 128,
    mode: str = "error",
) -> int:
    """Small-file compaction — the landing-zone hygiene job: streaming
    sinks and incremental loads leave thousands of KB-sized files, and
    every downstream scan then pays per-file open/footer cost (and the
    driver pays per-file listing). Rewrites ``src`` into
    ``ceil(total_bytes / target_mb)`` files at ``dst`` and returns the
    file count present at ``dst`` after the write (== files written
    for error/overwrite modes; append accumulates).

    The rewrite routes through ``repartition(n)`` — a round-robin
    shuffle, deliberately: ``coalesce(n)`` would avoid the shuffle but
    chains the narrow dependency upstream (n tasks READ too, killing
    read parallelism) and inherits input skew into output files. Sizing
    uses the INPUT bytes as the estimate for output bytes; same codec
    in and out makes that close. At scale run per partition-directory
    (compact yesterday's partition, not the whole table) — this
    function is that single-directory step.
    """
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    df = spark.read.parquet(src)
    import math
    import os
    from urllib.parse import unquote, urlparse

    files = df.inputFiles()
    local = [
        unquote(urlparse(f).path) for f in files if f.startswith("file:")
    ]
    if len(local) == len(files) and local:
        total = sum(os.path.getsize(f) for f in local)
    else:  # non-local filesystem: fall back to Spark's relation estimate
        total = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n = max(1, math.ceil(total / (target_mb << 20)))
    df.repartition(n).write.mode(mode).parquet(dst)
    return len(spark.read.parquet(dst).inputFiles())


def synth_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """Deterministic TPC-H-style ``partsupp`` synthesized from the
    ``part`` and ``supplier`` tables the driver testdata DOES ship
    (it ships no partsupp parquet — README §coverage): 4 suppliers
    per part, keys and costs pure integer arithmetic so any engine
    reproduces the table bit-for-bit from the same two inputs.

      ps_suppkey          = (p_partkey*4 + i) % S          (i in 0..3)
      ps_availqty         = (p_partkey*17 + ps_suppkey*31) % 9999 + 1
      ps_supplycost_cents = (p_partkey*131 + ps_suppkey*773) % 92000
                            + 90000                 (i.e. 900.00-1819.99)

    with S = count(supplier). Consecutive residues mod S are distinct
    while S >= 4, so each part gets exactly 4 DISTINCT suppliers —
    (ps_partkey, ps_suppkey) is a primary key, as in TPC-H.

    Scale shape: part x 4 is a narrow flatmap — the 4-way replica
    expansion is an ``explode`` of a 4-element literal array (a
    projection, not a join: a broadcast crossJoin would plan as a
    BroadcastNestedLoopJoin and trip the cartesian scale-lint), and
    the 1-row supplier count rides the blessed scalar-subquery BNLJ
    form; the build adds NO exchange over the part scan. Downstream
    joins decide their own strategy. Costs are exact-integer cents
    (the engine's cross-engine determinism convention — module doc of
    ``__spark_entry__``)."""
    # S < 4 would collide the 4 residues and silently break the
    # (ps_partkey, ps_suppkey) primary key — fail loudly instead
    # (plan-side assert: no extra job, checked when the count row
    # materializes)
    s_cnt = supplier.agg(F.count(F.lit(1)).alias("__s_cnt")).select(
        F.when(
            F.col("__s_cnt") >= 4, F.col("__s_cnt")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("synth_partsupp needs >= 4 suppliers, got "),
                    F.col("__s_cnt").cast("string"),
                )
            )
        ).alias("__s_cnt")
    )
    suppkey = (F.col("p_partkey") * 4 + F.col("__i")) % F.col("__s_cnt")
    return (
        part.select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("__i"),
        )
        .crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            suppkey.alias("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                (F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 31) % 9999
                + 1
            ).alias("ps_availqty"),
            (
                (F.col("ps_partkey") * 131 + F.col("ps_suppkey") * 773)
                % 92000
                + 90000
            ).alias("ps_supplycost_cents"),
        )
    )


def synth_scd2_customer(customer: DataFrame) -> DataFrame:
    """Deterministic SCD2 (type-2 slowly-changing-dimension) customer
    history synthesized from the driver's ``customer`` table (it ships
    no history table): exactly 3 versions per customer with HALF-OPEN
    ``[valid_from, valid_to)`` validity, contiguous and gap-free per
    key:

      v0: 1992-01-01                            (before any order)
      v1: 1997-01-01 + (c_custkey % 300) days
      v2: 1999-06-01 + (c_custkey % 200) days
      valid_to       = next version's valid_from; v2 -> 9999-01-01
      segment        = c_mktsegment || '/v' || i
      credit_limit   = (c_custkey % 1000 + 1) * 100 * (i + 1)

    All breakpoints and attributes are integer/date arithmetic, so any
    engine rebuilds the table bit-for-bit from the same input — the
    synth_partsupp convention. The two mid-history breakpoints land
    INSIDE the orders date range (1995..2001) and vary per key, so a
    validity join against orders genuinely splits each customer's
    orders across versions.

    Scale shape: a 3-way ``explode`` of a literal struct array — a
    narrow flatmap over the customer scan, no exchange, no join.
    """
    day = F.expr("interval 1 day")
    v1_from = F.to_timestamp(F.lit("1997-01-01")) + (
        F.col("c_custkey") % 300
    ) * day
    v2_from = F.to_timestamp(F.lit("1999-06-01")) + (
        F.col("c_custkey") % 200
    ) * day
    bounds = [
        (F.to_timestamp(F.lit("1992-01-01")), v1_from),
        (v1_from, v2_from),
        (v2_from, F.to_timestamp(F.lit("9999-01-01"))),
    ]
    versions = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                lo.alias("valid_from"),
                hi.alias("valid_to"),
            )
            for i, (lo, hi) in enumerate(bounds)
        ]
    )
    v = F.explode(versions).alias("v")
    return customer.select("c_custkey", "c_mktsegment", v).select(
        "c_custkey",
        F.col("v.valid_from").alias("valid_from"),
        F.col("v.valid_to").alias("valid_to"),
        F.concat(
            F.col("c_mktsegment"), F.lit("/v"), F.col("v.i").cast("string")
        ).alias("segment"),
        (
            (F.col("c_custkey") % 1000 + 1) * 100 * (F.col("v.i") + 1)
        ).cast("long").alias("credit_limit"),
    )
