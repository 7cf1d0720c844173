"""spark-submit job: Structured Streaming tail of a change log.

    spark-submit --py-files filipo_spark.zip filipo_spark/jobs/stream.py \
        --source /data/wal --table /data/transcripts --checkpoint /data/ckpt \
        [--continuous] [--max-files-per-trigger 64] [--mapping mapping.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--continuous", action="store_true",
                    help="keep tailing (default: drain available data and stop)")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--mapping", help="optional mapping.json for a drifted source")
    ap.add_argument("--source-format", choices=["drifted", "json"], default=None,
                    help="wire shape of a drifted source with NO mapping.json "
                         "yet: with --auto-realign the mapping is bootstrapped "
                         "from the first micro-batch (reason=init fence)")
    ap.add_argument("--auto-realign", action="store_true",
                    help="per-batch mapping-health check; re-align and hot-swap "
                         "the mapping when the stream's wire shape drifts "
                         "(align/drift.py; realign events fenced in the manifest)")
    ap.add_argument("--drift-threshold", type=float, default=None,
                    help="health ratio that triggers re-alignment")
    ap.add_argument("--key-check-every", type=int, default=None,
                    help="add the key-membership health probe every N applied "
                         "batches (catches string-key value corruption); "
                         "default auto: every batch when the table keeps a key "
                         "bloom sketch (zero table I/O), else off; 0 forces off")
    ap.add_argument("--echo-check-every", type=int, default=0,
                    help="add the sampled echo audit every N applied batches "
                         "(catches value corruption of mapped non-key columns, "
                         "e.g. text arriving base64-mangled); costs a "
                         "bucket-pruned read of the sampled keys' buckets")
    ap.add_argument("--compact-every", type=int, default=0,
                    help="fold over-fragmented buckets every N applied batches")
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args(argv)

    from filipo_spark.session import get_spark
    from filipo_spark.streaming.tail import tail_changelog
    from filipo_spark.table.icelet import IceletTable

    spark = get_spark("filipo-stream", cores=args.cpus or None)
    if os.path.exists(os.path.join(args.table, "metadata", "CURRENT")):
        table = IceletTable.load(args.table)
    else:
        table = IceletTable.create(args.table, n_buckets=args.n_buckets)

    mapping = None
    if args.mapping:
        from filipo_spark.align import Mapping

        with open(args.mapping) as f:
            mapping = Mapping.from_json(f.read())
    elif args.auto_realign and not args.source_format:
        # the wire schema is fixed at readStream time: mapping-less
        # bootstrap must declare the wire shape so the tail can learn the
        # mapping from its first micro-batch (streaming/tail.py)
        sys.exit("--auto-realign without --mapping requires --source-format "
                 "drifted|json (the mapping is then learned from the first "
                 "micro-batch)")

    stats = tail_changelog(
        spark, args.source, table, args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.continuous,
        mapping=mapping,
        auto_realign=args.auto_realign,
        drift_threshold=args.drift_threshold,
        compact_every=args.compact_every,
        source_format=args.source_format,
        key_check_every=args.key_check_every,
        echo_check_every=args.echo_check_every,
    )
    if args.continuous:
        stats.pop("query").awaitTermination()
    final_mapping = stats.pop("mapping", None)
    if args.auto_realign and final_mapping is not None:
        # persist the (possibly re-learned or bootstrapped) function store
        # next to the input mapping, else in the table's metadata dir
        out = (
            args.mapping + ".current"
            if args.mapping
            else os.path.join(args.table, "metadata", "mapping.current.json")
        )
        with open(out, "w") as f:
            f.write(final_mapping.to_json())
    from filipo_spark.metrics import replay_metrics

    json.dump({**stats, **replay_metrics(table)}, sys.stdout)
    print()


if __name__ == "__main__":
    main()
