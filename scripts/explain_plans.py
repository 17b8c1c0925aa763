"""Dump `.explain("formatted")` for registry queries to files.

Usage:
  python scripts/explain_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query.  Used to produce the
plans/r06/<query>_{before,after}.txt evidence pair (run once from the
round-5 tree via a git worktree, once from the current tree).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

# cwd first: running this script from a git worktree of an OLDER commit
# (for the _before plans) must import THAT tree's __spark_entry__/bench
sys.path.insert(0, os.getcwd())


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from bench import build_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    q = em.queries()
    for name in names:
        try:
            df = q[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # keep going; record the failure
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)", flush=True)


if __name__ == "__main__":
    main()
