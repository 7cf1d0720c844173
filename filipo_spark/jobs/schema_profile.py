"""spark-submit job: schema profiling (functionality, identifiers, types).

    spark-submit --py-files filipo_spark.zip filipo_spark/jobs/profile.py \
        --input /data/table.parquet --out profile.json \
        [--functionality-threshold 0.996]

The engine's SchemaExtractor (reference: SchemaExtractor.java:45-136,
index.json artifact) — one aggregation pass over a melted view.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    from filipo_spark.schema import FUNCTIONALITY_THRESHOLD

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet dir/file to profile")
    ap.add_argument("--out", help="output profile.json (stdout if omitted)")
    ap.add_argument("--functionality-threshold", type=float, default=FUNCTIONALITY_THRESHOLD)
    ap.add_argument("--approx", action="store_true", help="HLL distinct counts (10^10-row scale)")
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args(argv)

    from filipo_spark.operators.profile import identifiers, schema_profile
    from filipo_spark.session import get_spark

    spark = get_spark("filipo-profile", cores=args.cpus or None)
    df = spark.read.parquet(args.input)
    prof = schema_profile(df, exact=not args.approx)
    rows = [r.asDict() for r in prof.orderBy("column_name").collect()]
    ids = [
        r["column_name"]
        for r in identifiers(prof, args.functionality_threshold).collect()
    ]
    out = {"columns": rows, "identifiers": sorted(ids)}
    s = json.dumps(out, indent=2, sort_keys=True, default=str)
    if args.out:
        with open(args.out, "w") as f:
            f.write(s)
    print(s, file=sys.stdout)


if __name__ == "__main__":
    main()
