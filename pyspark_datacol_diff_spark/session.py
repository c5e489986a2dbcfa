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
