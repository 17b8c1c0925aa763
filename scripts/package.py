"""Build the deployable zip for ``spark-submit --py-files``.

Usage:
    python scripts/package.py [out.zip]
    spark-submit --py-files engine.zip your_job.py

The zip contains only the engine package (no tests/bench), importable from
executors and the driver.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "kafka_connect_tablestore_spark"


def build(out: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.join(repo, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, repo))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "engine.zip"))
