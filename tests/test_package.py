"""The spark-submit artifact contract: scripts/package.py must produce a
zip from which a FRESH interpreter can import the whole package (the
--py-files path on a real cluster — executors zipimport it; a module
that only imports because the repo happens to be on sys.path would break
there)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_artifact_importable(tmp_path):
    out = str(tmp_path / "filipo_spark.zip")
    built = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py"), out],
        capture_output=True, text=True, check=True,
    )
    assert out in built.stdout
    probe = subprocess.run(
        [sys.executable, "-c",
         "import filipo_spark, filipo_spark.replay, filipo_spark.align.mapper, "
         "filipo_spark.table.icelet, filipo_spark.table.sketch, "
         "filipo_spark.streaming.tail, filipo_spark.jobs.stream, "
         "filipo_spark.functions.similarity; print('ok')"],
        capture_output=True, text=True,
        # ONLY the zip on the path — no repo fallback
        env={**os.environ, "PYTHONPATH": out},
        cwd=str(tmp_path),
    )
    assert probe.returncode == 0 and probe.stdout.strip() == "ok", probe.stderr
