"""Build the --py-files zip for spark-submit deployment.

Usage: python tools/package_pyfiles.py [dist/sjcs_spark.zip]

Produces a zip of the spatialjoincountovershells_spark package that
executors unpack onto their PYTHONPATH:

  spark-submit --py-files dist/sjcs_spark.zip jobs/sjcs_job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "spatialjoincountovershells_spark"


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "sjcs_spark.zip")
    print(build(dst))
