#!/usr/bin/env python
"""Per-query profiling harness for optimization rounds (guide §1):
times named registry queries with the noop sink (min-of-N), labels the
jobs, and writes ``.explain('formatted')`` output to plans/<tag>/.

Usage:
    python tools/profile_queries.py [--sf DIR] [--tag r14_before]
        [--passes 2] [--explain-only] name [name ...]
    python tools/profile_queries.py --top 20          # slowest from bench_full.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default=None, help="plans/<tag>/<name>.txt output dir")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--top", type=int, default=0, help="profile N slowest from bench_full.json")
    ap.add_argument("--explain-only", action="store_true")
    args = ap.parse_args()

    from fp_data_lakehouse_spark.operators import REGISTRY
    from fp_data_lakehouse_spark.session import get_session

    names = list(args.names)
    if args.top:
        with open(f"{REPO}/bench_full.json") as f:
            full = json.load(f)
        ranked = sorted(
            ((n, t) for n, t in full["queries"].items() if t > 0 and n in REGISTRY),
            key=lambda kv: -kv[1],
        )
        names.extend(n for n, _ in ranked[: args.top] if n not in names)

    spark = get_session("fp-lakehouse-profile")
    # warm-up so the first profiled query doesn't pay JVM init — on the
    # smallest local fixture when present, else the profiled sf itself
    # (the hardcoded sf0.001 path crashed on hosts without it)
    warm_sf = "/root/testdata/sf0.001"
    if not os.path.exists(warm_sf):
        warm_sf = args.sf
    REGISTRY["q01_avg_customer_revenue"].builder(spark, warm_sf).write.format(
        "noop"
    ).mode("overwrite").save()

    out_dir = None
    if args.tag:
        out_dir = f"{REPO}/plans/{args.tag}"
        os.makedirs(out_dir, exist_ok=True)

    results = {}
    for name in names:
        if name == "gr00_coorder_edges_build":
            # The synthetic bench line item (not in REGISTRY). The memo
            # cache MUST be cleared before every timed pass — without
            # it, pass 2+ times a warm artifact READ, not the build:
            # the r14 "-62%" A/B error (r14 verdict item 3). bench.py
            # clears it the same way before its timed pre-build.
            from fp_data_lakehouse_spark.operators.graph import (
                _coorder_edges,
                clear_coorder_cache,
            )

            spark.sparkContext.setJobDescription(f"profile:{name}")
            best = None
            for _ in range(args.passes):
                clear_coorder_cache()
                t0 = time.time()
                _coorder_edges(spark, args.sf)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[name] = round(best, 3)
            print(json.dumps({name: results[name]}), flush=True)
            spark.sparkContext.setJobDescription(None)
            continue
        if name not in REGISTRY:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if out_dir:
            df = REGISTRY[name].builder(spark, args.sf)
            with open(f"{out_dir}/{name}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if args.explain_only:
            continue
        best = None
        for _ in range(args.passes):
            t0 = time.time()
            REGISTRY[name].builder(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(json.dumps({name: results[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"profile": results, "sf": args.sf}))


if __name__ == "__main__":
    main()
