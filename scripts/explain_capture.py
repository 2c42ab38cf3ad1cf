#!/usr/bin/env python
"""Capture .explain('formatted') for bench queries into plans/<tag>/.

Usage: python scripts/explain_capture.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for every bench query (or the named
subset). <tag> is e.g. "r14"; <suffix> defaults to "before" and is taken
from $EXPLAIN_SUFFIX. Queries whose registry callable fails to BUILD (e.g.
an optional-dep guard) record the exception text instead, so a capture run
never dies half-way.

The capture is plan-only (no execution) except that some registry entries
execute bounded artifact fits at DataFrame-build time by design (model
fits, index builds) — that cost is paid here once, outside any timed bench.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    only = set(sys.argv[2:])
    suffix = os.environ.get("EXPLAIN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from bench import BENCH_QUERIES
    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.plans.registry import QUERIES

    spark = get_spark(app_name="fdi_flow_spark-explain")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if not only or n in only]
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # record, keep going
            text = f"BUILD FAILED: {type(exc).__name__}: {exc}\n"
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
