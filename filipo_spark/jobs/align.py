"""spark-submit job: learn a drifted-payload → target-schema mapping.

    spark-submit --py-files filipo_spark.zip filipo_spark/jobs/align.py \
        --drifted /data/drifted_wal --target /data/transcripts_table \
        --out mapping.json [--n-probe 100] [--string-similarity 0.5]

Thresholds mirror the reference's config.json names/defaults
(string_similarity 0.5 :17, record_similarity 0.1 :18,
candidate_responses 0.2 :21, min_confidence 0.1 :30).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> None:
    from filipo_spark.schema import (
        CANDIDATE_RESPONSES,
        MIN_CONFIDENCE,
        RECORD_SIMILARITY,
        STRING_SIMILARITY,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--drifted", required=True, help="dir of (lsn, op, payload) records")
    ap.add_argument(
        "--format", default="parquet", choices=["parquet", "json"],
        help="drifted-source format (S2 dispatch): parquet, or JSON-lines "
             "whose nested payload object is flattened to dotted paths (C9)",
    )
    ap.add_argument("--target", required=True, help="Icelet table root OR parquet dir")
    ap.add_argument("--out", required=True, help="output mapping.json path")
    ap.add_argument("--n-probe", type=int, default=100)
    ap.add_argument("--string-similarity", type=float, default=STRING_SIMILARITY)
    ap.add_argument("--record-similarity", type=float, default=RECORD_SIMILARITY)
    ap.add_argument("--candidate-responses", type=float, default=CANDIDATE_RESPONSES)
    ap.add_argument("--min-confidence", type=float, default=MIN_CONFIDENCE)
    ap.add_argument(
        "--evaluate", type=int, default=0, metavar="K",
        help="evaluation mode (reference mode=2): dump up to K matched "
             "(probe record, target row) pairs as CSV next to --out",
    )
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args(argv)

    from filipo_spark.align import align
    from filipo_spark.session import get_spark
    from filipo_spark.table.icelet import IceletTable

    spark = get_spark("filipo-align", cores=args.cpus or None)
    if os.path.exists(os.path.join(args.target, "metadata", "CURRENT")):
        target = IceletTable.load(args.target).read_logical(spark)
    else:
        target = spark.read.parquet(args.target)
    if args.format == "json":
        from pyspark.sql import functions as F

        drifted = spark.read.json(args.drifted)
        if not dict(drifted.dtypes)["payload"].startswith(("map", "string")):
            # nested payload object → JSON string; align() normalizes it
            # back through the C9 flatten (one codegen projection)
            drifted = drifted.withColumn("payload", F.to_json("payload"))
    else:
        drifted = spark.read.parquet(args.drifted)

    mapping = align(
        drifted,
        target,
        n_probe=args.n_probe,
        string_similarity=args.string_similarity,
        record_similarity=args.record_similarity,
        candidate_responses=args.candidate_responses,
        min_confidence=args.min_confidence,
        evaluate_dir=(args.out + ".eval") if args.evaluate else None,
        evaluate_k=args.evaluate or 5,
    )
    with open(args.out, "w") as f:
        f.write(mapping.to_json())
    print(mapping.to_json(), file=sys.stdout)


if __name__ == "__main__":
    main()
