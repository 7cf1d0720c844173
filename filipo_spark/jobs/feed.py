"""spark-submit job: incremental change feed between two Icelet snapshots.

    spark-submit --py-files filipo_spark.zip filipo_spark/jobs/feed.py \
        --table /data/transcripts --from-snapshot <sid> \
        [--to-snapshot <sid>] [--out /data/feed-000123] [--format parquet|json]

Prints a JSON summary (snapshot window, rows, upserts/deletes) to
stdout; with ``--out`` also writes the feed rows — the hand-off point
for a downstream consumer that tails the table without rescanning it
(table/changes.py).  Without ``--from-snapshot``, lists the snapshot
lineage and each snapshot's committed offset range instead, so a
consumer can pick its cursor.

``--cursor NAME`` makes the consumer's position durable in the table's
own metadata: the feed reads from the registered cursor (seed the first
read with ``--from-snapshot``) and advances it to the window's upper
snapshot after a successful read — and ``expire_snapshots`` then
REFUSES to drop snapshots a registered cursor still needs, so a
mis-sized retention can no longer silently strand a lagging consumer
(table/icelet.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--table", required=True)
    ap.add_argument("--from-snapshot",
                    help="exclusive lower cursor; omit to list the lineage")
    ap.add_argument("--to-snapshot", help="inclusive upper cursor (default: current)")
    ap.add_argument("--cursor",
                    help="named durable consumer cursor: read from its stored "
                         "snapshot (or --from-snapshot to seed/override) and "
                         "advance it after a successful read")
    ap.add_argument("--out", help="write feed rows here (default: summary only)")
    ap.add_argument("--format", choices=["parquet", "json"], default="parquet")
    ap.add_argument("--cpus", type=int, default=0, help="local[N] cores (0 = local[*])")
    args = ap.parse_args(argv)

    from filipo_spark.session import get_spark
    from filipo_spark.table.icelet import IceletTable

    spark = get_spark("filipo-feed", cores=args.cpus or None)
    table = IceletTable.load(args.table)

    if args.cursor and not args.from_snapshot:
        stored = table.cursors().get(args.cursor)
        if stored is None:
            raise SystemExit(
                f"cursor {args.cursor!r} is not registered on {args.table}: "
                "seed it with --from-snapshot <sid> on the first read"
            )
        args.from_snapshot = stored

    if not args.from_snapshot:
        by_sid = {m["snapshot_id"]: m for m in table.manifest()}
        lineage = [
            {"snapshot_id": sid,
             **{k: by_sid[sid][k] for k in ("epoch", "offset_lo", "offset_hi", "kind")
                if sid in by_sid and k in by_sid[sid]}}
            for sid in table.snapshot_ids()
        ]
        json.dump({"table": args.table, "lineage": lineage}, sys.stdout)
        print()
        return

    from filipo_spark.table.changes import changes_between

    # resolve the window's upper end ONCE, before the read: a commit
    # landing between the read and the cursor advance would otherwise
    # move the cursor past changes this feed never delivered
    to_sid = args.to_snapshot or table.current_snapshot_id()
    feed = changes_between(spark, table, args.from_snapshot, to_sid)
    if args.out:
        w = feed.write.mode("overwrite")
        (w.parquet(args.out) if args.format == "parquet" else w.json(args.out))
        feed = spark.read.parquet(args.out) if args.format == "parquet" else feed
    counts = {r["op"]: r["n"] for r in
              feed.groupBy("op").agg({"*": "count"}).withColumnRenamed(
                  "count(1)", "n").collect()}
    if args.cursor:
        # advance ONLY after the window was fully produced — a crash
        # above leaves the cursor (and retention protection) in place
        table.set_cursor(args.cursor, to_sid)
    json.dump(
        {"table": args.table,
         "from_snapshot": args.from_snapshot,
         "to_snapshot": to_sid,
         "rows": sum(counts.values()),
         "upserts": counts.get("U", 0),
         "deletes": counts.get("D", 0),
         **({"cursor": args.cursor} if args.cursor else {}),
         **({"out": args.out, "format": args.format} if args.out else {})},
        sys.stdout,
    )
    print()


if __name__ == "__main__":
    main()
