"""Build the --py-files artifact for cluster submission.

    python tools/package.py                  # -> dist/anomaly_detection_spark.zip
    spark-submit --py-files dist/anomaly_detection_spark.zip \
        --master yarn --deploy-mode cluster \
        your_driver.py  # or: python -m anomaly_detection_spark.run

The zip contains only the package (no tests/tools); executors import it
from the shipped archive. ``anomaly_detection_spark.run:main`` is the
reference driver; it reuses the session spark-submit provides.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "anomaly_detection_spark"


def main() -> int:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
