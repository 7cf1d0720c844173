#!/usr/bin/env python
"""Build the spark-submit --py-files artifact: filipo_spark.zip.

Usage: python scripts/package.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "filipo_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirs, files in os.walk(os.path.join(REPO, "filipo_spark")):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)


if __name__ == "__main__":
    main()
