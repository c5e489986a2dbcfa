"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same builder flags are the ones
you would set on a real cluster (AQE, skew-join handling, partition
coalescing). Nothing here is required for correctness — every operator in
the package works on a caller-provided session too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark_datacol_diff_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    - AQE on: runtime coalescing of post-shuffle partitions + skew-join
      splitting — at 100 TB this is what keeps the diff's full-outer
      sort-merge join healthy under key skew.
    - ``spark.sql.shuffle.partitions`` sized to the machine locally;
      on a real cluster leave AQE to coalesce from a high initial value.
    - Arrow enabled for the few pandas edges (summary ``.toPandas()``,
      Pandas UDFs in the multimodal/similarity paths).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep scan metadata (PushedFilters / ReadSchema) un-truncated so
        # plans.pushed_filters / plans.scale_lint see whole entries; the
        # 100-char default cuts wide scans mid-token
        .config("spark.sql.maxMetadataStringLength", "10000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def free_persistent_rdds(spark: SparkSession) -> int:
    """Unpersist EVERY persistent RDD in the context — including
    ``localCheckpoint`` block sets, which ``spark.catalog.clearCache()``
    cannot see (it only drops Dataset cache entries). Returns the
    number of RDDs released.

    Use between independent pipelines in a long-lived session (a
    benchmark harness, a notebook, a service): iterative operators
    leave their final checkpointed result live by design, and without
    this the blocks accumulate until the context dies — the storage
    leak behind the round-4 10x smoke regression (33 s co-run vs
    14.5 s isolated for an identical plan).

    DANGER: a localCheckpointed RDD has no lineage; releasing one that
    a still-pending DataFrame will read fails that read. Only call at
    a quiescent point — after the previous pipeline's actions are done
    and before the next one builds state.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in list(jmap.values()):
        jrdd.unpersist()
        n += 1
    return n


def quiesce_session(spark: SparkSession) -> None:
    """Full measurement isolation between independent pipelines in one
    session: drop Dataset caches, drop localCheckpoint block sets
    (:func:`free_persistent_rdds` — invisible to clearCache), then
    force a full JVM GC. The GC matters empirically: heap garbage left
    by one query (humongous array allocations G1 reclaims lazily)
    measured a 2x tax on the NEXT query's wall time at identical plans
    (ngram_jaccard after text_stats: 8.5 s polluted vs 4.7 s quiesced).
    The single shared recipe for bench.py and scripts/scale_smoke.py —
    keep them on this helper so a future isolation fix reaches both
    harnesses. Same quiescent-point caveat as free_persistent_rdds."""
    spark.catalog.clearCache()
    free_persistent_rdds(spark)
    spark.sparkContext._jvm.System.gc()
