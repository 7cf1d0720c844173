"""Sample the 12M-event (xdeep) scaling level into BENCH/scaling_xdeep.json.

    python scripts/xdeep_scaling.py            # one batch (~8 min)
    FILIPO_SCALE_BUDGET=700 python scripts/xdeep_scaling.py

Reuses bench.scaling_runs by IMPORT, so adding/sampling this level never
touches the measured files and never invalidates the content-hash
versioned sidecars (bench._code_version).  bench_report renders the
level plus the batch-size efficiency trend into BENCH/BASELINE.md on the
next full bench run — the 12M single-epoch batch is the closest shape
this sandbox can get to a ~10^8-event production micro-batch, where the
serial per-run cost's share drops under 1%.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import scaling_runs  # noqa: E402

if __name__ == "__main__":
    s = scaling_runs(12_000_000, repeats=2, sidecar="scaling_xdeep.json")
    print(json.dumps({k: v for k, v in s.items() if k != "archived"}))
