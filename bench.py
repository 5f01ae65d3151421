#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

Results are fully materialized via the noop sink (all partitions
computed, nothing collected to the driver), so the timing covers scan +
shuffle + compute, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from fp_data_lakehouse_spark.operators import REGISTRY
    from fp_data_lakehouse_spark.session import get_session

    spark = get_session("fp-lakehouse-bench")

    # JVM/codegen warm-up on the smallest fixture so per-query numbers
    # measure the engine, not first-call initialization.
    warm = REGISTRY["q01_avg_customer_revenue"].builder(spark, "/root/testdata/sf0.001")
    materialize(warm)

    timings: dict[str, float] = {}
    t_suite = time.time()
    for name in sorted(REGISTRY):
        t0 = time.time()
        try:
            materialize(REGISTRY[name].builder(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # a failing query must not hide the rest
            timings[name] = -1.0
            print(f"# bench error in {name}: {exc}", file=sys.stderr)
    total = round(time.time() - t_suite, 3)

    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
