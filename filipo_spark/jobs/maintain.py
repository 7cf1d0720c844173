"""spark-submit job: Icelet table maintenance — compact / expire / vacuum.

    spark-submit --py-files filipo_spark.zip filipo_spark/jobs/maintain.py \
        --table /data/transcripts [--compact-min-files 8] \
        [--expire-keep-last 100] [--vacuum]

Runs the three maintenance levers in their safe order:

1. ``--compact-min-files N``: fold buckets holding >= N delta files back
   to one resolved file each (MoR read-amplification bound);
2. ``--expire-keep-last K``: drop all but the newest K snapshots from
   the lineage — the retention horizon for time travel AND for
   ``changes_between`` catch-up (a feed consumer lagging more than K
   commits must re-read a full snapshot, table/changes.py).  Size K
   above the slowest consumer's lag; consumers that registered a
   cursor (``jobs/feed.py --cursor``) make that checkable — expiry
   REFUSES to strand a registered cursor unless ``--expire-force``;
3. ``--vacuum``: delete data files no retained snapshot references
   (post-crash orphans + post-expiry deltas).

Prints a JSON summary.  Compaction commits through the normal fenced
protocol; expire+vacuum are driver-side metadata/file ops (no Spark job).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--table", required=True)
    ap.add_argument("--compact-min-files", type=int, default=0,
                    help="fold buckets with >= N delta files (0 = skip)")
    ap.add_argument("--expire-keep-last", type=int, default=0,
                    help="keep only the newest K snapshots (0 = skip)")
    ap.add_argument("--expire-force", action="store_true",
                    help="expire even when it strands a registered feed cursor")
    ap.add_argument("--vacuum", action="store_true",
                    help="delete unreferenced data files")
    ap.add_argument("--cpus", type=int, default=0, help="local[N] cores (0 = local[*])")
    args = ap.parse_args(argv)

    from filipo_spark.table.icelet import IceletTable

    table = IceletTable.load(args.table)
    out: dict = {"table": args.table}

    if args.compact_min_files:
        from filipo_spark.session import get_spark

        spark = get_spark("filipo-maintain", cores=args.cpus or None)
        res = table.compact(spark, min_files=args.compact_min_files)
        out["compacted_buckets"] = res.buckets if res else []
    if args.expire_keep_last:
        out["expired_snapshots"] = table.expire_snapshots(
            args.expire_keep_last, force=args.expire_force
        )
    if args.vacuum:
        removed = table.vacuum()
        out["vacuumed_files"] = len(removed)
    out["retained_snapshots"] = len(table.snapshot_ids())
    out["cursors"] = table.cursors()
    if "bloom" in table.current_snapshot():
        # operability: past ~0.5 the key sketch's FP rate degrades and
        # the drift probe under-counts misses — resize/rebuild then
        out["bloom_saturation"] = round(table.key_bloom().saturation, 4)
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
