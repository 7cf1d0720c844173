#!/usr/bin/env python
"""Dump .explain("formatted") for every bench-timed query (round-6
plan evidence).  Usage:  python scripts/dump_plans_r06.py <tag> [outdir]

For the two queries whose work happens inside the call (materialized
results), representative internal plans are dumped instead: the
drift fixture's LWW fold (drift_auto_realign) and the align() probe
internals via the debug hook (schema_evolution_mapping).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "plans", "r06")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    import __spark_entry__ as entry_mod
    from filipo_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-plans", cores=8, shuffle_partitions=8)
    qmap = entry_mod.queries()

    def dump(name, df):
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(explain_str(df))
        print("dumped", name)

    for name in [
        "cdc_lww_replay", "cdc_batched_replay", "lww_dedup_winners",
        "schema_profile_orders", "pricing_summary", "argmax_vote",
        "revenue_by_nation",
    ]:
        dump(name, qmap[name](spark, SF))

    # drift_auto_realign: the sf-scale part of the query is the fixture
    # target's LWW fold (events → changes → apply_batch → logical)
    from pyspark.sql import functions as F

    from filipo_spark.operators.merge import (
        changes_to_physical,
        logical,
        lww_resolve,
    )
    from filipo_spark.sources import changes_from_events

    ch = changes_from_events(spark, SF)
    try:
        from __spark_entry__ import _rebalance

        ch = _rebalance(ch)
    except ImportError:
        pass
    tgt = logical(lww_resolve(changes_to_physical(ch))).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    dump("drift_auto_realign_target_fold", tgt)

    # schema_evolution_mapping: align() probe internals via debug hook
    from filipo_spark.align import align
    from filipo_spark.generators import gen_drifted, gen_echo_changelog, gen_transcripts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    target = gen_transcripts(spark, n_conv=30, max_turns=15, seed=42)
    dbg: dict = {}
    align(gen_drifted(gen_echo_changelog(target), "typedrift"), target, debug=dbg)
    dump("align_key_discovery_scan", dbg["key_long"])
    dump("align_probe_rows", dbg["tgt_probe_rows"])
    spark.stop()


if __name__ == "__main__":
    main()
