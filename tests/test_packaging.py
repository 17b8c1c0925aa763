"""The --py-files deployment contract: the packaged zip alone (no repo on
sys.path) must supply the whole engine."""

from __future__ import annotations

import os
import subprocess
import sys


def test_zip_is_self_contained(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "package.py"), out],
        check=True,
        capture_output=True,
    )
    probe = (
        "import sys; sys.path.insert(0, {z!r});\n"
        "import kafka_connect_tablestore_spark as k\n"
        "from kafka_connect_tablestore_spark.engine import CdcEngine\n"
        "from kafka_connect_tablestore_spark.operators.dedup import minhash_signatures\n"
        "from kafka_connect_tablestore_spark.lake.table import LakeTable\n"
        "print('ZIPOK', k.__version__)\n"
    ).format(z=out)
    r = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo — the zip must be sufficient
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "ZIPOK" in r.stdout, r.stderr
