"""North-rule packaging evidence: the engine runs via
``spark-submit --py-files dist/anomaly_detection_spark.zip`` from a cwd
OUTSIDE the repo (so the package can only resolve from the shipped
archive), and a second submit against the same audit ledger resumes —
skipping every committed partition (ref north rule: "packaged for
spark-submit --py-files", "a killed run resumes from the last committed
partition")."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(workdir: str, zip_path: str, audit: str) -> dict:
    driver = os.path.join(workdir, "driver.py")
    with open(driver, "w") as f:
        f.write(
            "import sys\n"
            "from anomaly_detection_spark.run import main\n"
            "sys.exit(main())\n"
        )
    env = dict(os.environ)
    # the repo root must NOT leak onto the executor/driver path
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        ["spark-submit", "--master", "local[8]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path, driver,
         "--rows", "30000", "--audit", audit, "--json"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=280,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_and_resume(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    work = tempfile.mkdtemp(prefix="submit_smoke_", dir=str(tmp_path))
    shipped = os.path.join(work, os.path.basename(zip_path))
    shutil.copy(zip_path, shipped)
    audit = os.path.join(work, "audit")

    first = _submit(work, shipped, audit)
    assert first["rows"] == 30000
    assert first["partitions_done"] > 0

    resumed = _submit(work, shipped, audit)
    assert resumed["rows"] == 0
    assert resumed["partitions_done"] == 0
