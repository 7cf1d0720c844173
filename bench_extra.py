#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Times each declared driver-table query with the noop sink (guide §1.4 —
the computation is timed, not the sink, and nothing is pruned the way a
bare .count() can prune), labels jobs (guide §1.5), and dumps
``.explain("formatted")`` for each query to ``plans/r06/<query>_<tag>.txt``.

Usage:
    python bench_extra.py [--tag before|after] [--queries a,b,c] [--repeat 2]

Timing note: the queries that stand up a throwaway Icelet table
(drift_auto_realign, icelet_sql_snapshot, cdc_change_feed) and
schema_evolution_mapping do their work inside the query *call*, so for
those the timed region is call+count, same as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# queries whose heavy work happens inside the call (materialized result);
# noop-writing their output would time nothing
MATERIALIZED = {
    "schema_evolution_mapping", "drift_auto_realign", "icelet_sql_snapshot",
    "cdc_change_feed",
}

BENCH_QUERIES = [
    "cdc_lww_replay", "lww_dedup_winners", "schema_profile_orders",
    "pricing_summary", "argmax_vote", "revenue_by_nation",
    "schema_evolution_mapping", "drift_auto_realign",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="dump plans to plans/r06/<q>_<tag>.txt")
    ap.add_argument("--queries", default=",".join(BENCH_QUERIES))
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--warm", action="store_true",
                    help="one untimed warm-up call per query first")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod
    from filipo_spark.session import get_spark

    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    qmap = entry_mod.queries()
    names = [n for n in args.queries.split(",") if n]
    plans_dir = os.path.join(REPO, "plans", "r06")
    if args.tag:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qmap[name]
        if args.tag and name not in MATERIALIZED:
            df = fn(spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if args.warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            if name in MATERIALIZED:
                fn(spark, SF_DIR).count()
            else:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.perf_counter()
            if name in MATERIALIZED:
                fn(spark, SF_DIR).count()
            else:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"{name:32s} {samples}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
