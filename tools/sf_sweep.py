"""Scale-factor sweep over registry families (default q* + ev*,
VERDICT r8 item 8; --families vt,st for the lifecycle corpora,
VERDICT r10 item 7): synthesize a 10x copy of the driver fixtures by
key-shifted union (orders/lineitem/customer/events grow; region/nation/
supplier/part/documents/embeddings stay dim-sized, as they would in a
real deployment), run both corpora at 1x and 10x, and report per-family
totals plus per-query scaling exponents  e = log10(t_10x / t_1x)
(e ~= 1.0 is linear; e < 1 means fixed overhead still dominates;
e > 1 flags a super-linear plan).

Usage:  python tools/sf_sweep.py [--base /root/testdata/sf0.1]
Writes one JSON line to stdout; human table to stderr. The 10x corpus
is materialized under /tmp and removed on exit unless --keep.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 10
GROW = ("customer", "orders", "lineitem", "events")
DIMS = ("region", "nation", "supplier", "part", "documents", "embeddings")


def synthesize(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from fp_data_lakehouse_spark.sources.catalog import load_table

    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        src = f"{base}/{name}.parquet"
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)

    cust = load_table(spark, base, "customer")
    orders = load_table(spark, base, "orders")
    li = load_table(spark, base, "lineitem")
    ev = load_table(spark, base, "events")
    c_max = cust.agg(F.max("c_custkey")).head()[0] + 1
    o_max = orders.agg(F.max("o_orderkey")).head()[0] + 1
    u_max = ev.agg(F.max("user_id")).head()[0] + 1
    e_max = ev.agg(F.max("event_id")).head()[0] + 1

    def rep(df, shifts):  # key-shifted union: cardinalities scale with data
        legs = []
        for i in range(REPS):
            leg = df
            for col, width in shifts.items():
                leg = leg.withColumn(col, F.col(col) + F.lit(i * width))
            legs.append(leg)
        outdf = legs[0]
        for leg in legs[1:]:
            outdf = outdf.unionByName(leg)
        return outdf

    rep(cust, {"c_custkey": c_max}).write.mode("overwrite").parquet(
        f"{out}/customer.parquet"
    )
    rep(orders, {"o_orderkey": o_max, "o_custkey": c_max}).write.mode(
        "overwrite"
    ).parquet(f"{out}/orders.parquet")
    rep(li, {"l_orderkey": o_max}).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    rep(ev, {"event_id": e_max, "user_id": u_max}).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )


def run_corpus(spark, sf_dir: str, names) -> dict[str, float]:
    from fp_data_lakehouse_spark.operators.registry import REGISTRY

    out = {}
    for name in names:
        best = math.inf
        for _ in range(2):  # min-of-2, mirroring bench.py
            t0 = time.time()
            try:
                REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # one bad query must not kill the sweep
                print(f"# sweep error in {name}@{sf_dir}: {exc}", file=sys.stderr)
                best = -1.0
                break
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/fp_sweep_10x")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--families",
        default="q,ev",
        help="comma-separated family prefixes (leading alpha run of the "
        "query name) to sweep, e.g. q,ev or vt,st",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fp_data_lakehouse_spark.operators.registry import REGISTRY
    from fp_data_lakehouse_spark.session import tune

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = tune(
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        # q43's recursive CTE legitimately exceeds the 1M-row recursion
        # safety valve at 10x (rows scale with data; the LIMIT is a
        # guard, not a plan property) — raise it for the sweep
        .config("spark.sql.cteRecursionRowLimit", "100000000")
        .getOrCreate()
    )
    import re as _re

    fams_wanted = tuple(f.strip() for f in args.families.split(",") if f.strip())
    names = sorted(
        n
        for n in REGISTRY
        if (m := _re.match(r"[a-z]+", n)) is not None and m.group(0) in fams_wanted
    )
    if not names:
        raise SystemExit(f"no registry queries match families {fams_wanted}")
    try:
        synthesize(spark, args.base, args.out)
        t1 = run_corpus(spark, args.base, names)
        t10 = run_corpus(spark, args.out, names)
    finally:
        if not args.keep:
            shutil.rmtree(args.out, ignore_errors=True)
        spark.stop()

    rows = []
    for n in names:
        if t1[n] < 0 or t10[n] < 0:
            continue  # errored queries are reported on stderr only
        ratio = t10[n] / max(t1[n], 1e-3)
        rows.append((n, t1[n], t10[n], round(math.log10(max(ratio, 1e-3)), 2)))
    fam = {}
    for n, a, b, _ in rows:
        f = _re.match(r"[a-z]+", n).group(0)
        s = fam.setdefault(f, [0.0, 0.0])
        s[0] += a
        s[1] += b
    print(
        json.dumps(
            {
                "metric": "sf_sweep_10x",
                "base": args.base,
                "families": {
                    k: {
                        "t_1x_sec": round(v[0], 2),
                        "t_10x_sec": round(v[1], 2),
                        "exponent": round(math.log10(v[1] / v[0]), 2),
                    }
                    for k, v in fam.items()
                },
                "queries": {n: {"t1": a, "t10": b, "exp": e} for n, a, b, e in rows},
            }
        )
    )
    print(f"{'query':42s} {'1x':>8s} {'10x':>8s} {'exp':>6s}", file=sys.stderr)
    for n, a, b, e in sorted(rows, key=lambda r: -r[3]):
        print(f"{n:42s} {a:8.3f} {b:8.3f} {e:6.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
