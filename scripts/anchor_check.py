#!/usr/bin/env python
"""Compare two bench sidecars' gate-feeding figures (r12 VERDICT item 1
"done" criterion): two identical-HEAD recordings taken at opposite ends of
a (possibly degraded) session should agree on the normalized geomean within
~5% once the session anchor is applied, while their raw geomeans are free
to diverge with the host.

Usage: python scripts/anchor_check.py bench_spread_quiet.json bench_spread_quiet2.json
"""

from __future__ import annotations

import json
import math
import sys


def geomean(vals):
    vals = [v for v in vals if v and v > 0]
    return math.exp(sum(math.log(v) for v in vals) / len(vals)) if vals else None


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    with open(a_path) as f:
        a = json.load(f)
    with open(b_path) as f:
        b = json.load(f)
    out = {"a": a_path, "b": b_path}
    for key in ("vs_baseline", "vs_baseline_raw", "vs_baseline_gate"):
        ra, rb = a.get(key) or {}, b.get(key) or {}
        shared = sorted(set(ra) & set(rb))
        ga, gb = geomean([ra[k] for k in shared]), geomean([rb[k] for k in shared])
        out[key] = {
            "geomean_a": round(ga, 4) if ga else None,
            "geomean_b": round(gb, 4) if gb else None,
            "rel_delta_pct": round(100 * abs(ga - gb) / ga, 2) if ga and gb else None,
            "n": len(shared),
        }
    for side, doc in (("a", a), ("b", b)):
        cal = doc.get("calibration", {})
        out[f"cal_{side}"] = {
            "cpu_ref": cal.get("ref"),
            "io_ref": cal.get("io_ref"),
            "anchor": cal.get("anchor"),
        }
    # the queries that moved most between the two runs, on gate figures
    ra, rb = a.get("vs_baseline_gate") or a.get("vs_baseline") or {}, (
        b.get("vs_baseline_gate") or b.get("vs_baseline") or {}
    )
    moved = sorted(
        ((k, ra[k], rb[k]) for k in set(ra) & set(rb) if ra[k] and rb[k]),
        key=lambda t: abs(math.log(t[2] / t[1])),
        reverse=True,
    )[:5]
    out["top_divergences"] = [
        {"query": k, "a": va, "b": vb} for k, va, vb in moved
    ]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
