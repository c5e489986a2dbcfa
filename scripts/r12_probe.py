#!/usr/bin/env python3
"""Round-12 isolated probe: time a subset of declared queries with the
bench's exact methodology (noop sink, warm-up run, quiesce between runs)
but isolated from the full co-run — min-of-N and median-of-N reported.

Usage:
  python3 scripts/r12_probe.py q1 q2 ...          # isolated min-of-3
  SPARK_GRAFT_PROBE_RUNS=5 python3 scripts/r12_probe.py q1
  SPARK_GRAFT_PROBE_PLANS=/tmp/plans python3 scripts/r12_probe.py q1

The A/B discipline (OPTIMIZATION_r11.md): run baseline and candidate
back-to-back in ONE session so box drift cancels; this script is one
arm — for module-level A/B use SPARK_GRAFT_AB env toggles read by the
operator under test and pass the queries twice.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
PLANS = os.environ.get("SPARK_GRAFT_PROBE_PLANS", "")


def main() -> None:
    from pyspark_datacol_diff_spark import get_spark, quiesce_session
    import __spark_entry__ as entry

    spark = get_spark(
        app_name="r12_probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    qs = entry.queries()
    names = sys.argv[1:]
    out = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"r12probe:{name}")
        if PLANS:
            os.makedirs(PLANS, exist_ok=True)
            with open(os.path.join(PLANS, f"{name}.txt"), "w") as fh:
                fh.write(qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        # warm-up (JIT), then timed runs
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        quiesce_session(spark)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
            quiesce_session(spark)
        samples.sort()
        out[name] = {
            "min": round(samples[0], 3),
            "median": round(samples[len(samples) // 2], 3),
            "max": round(samples[-1], 3),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
