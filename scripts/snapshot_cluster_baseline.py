"""Snapshot a cluster-master bench recording as the cluster baseline epoch
(r14, r13 VERDICT item 6).

Through r13 every bench baseline was recorded on local[32], so a
cluster-master recording (SPARK_GRAFT_BENCH_MASTER=local-cluster[...])
could only be read as per-query cluster-vs-local ratios — useless for
detecting cluster-specific regressions (serialization, netty shuffle,
executor-pool spin-up) across rounds. This script converts a cluster
run's spread sidecar into ``bench_baseline_cluster.json``; bench.py then
rates any FUTURE run under the SAME master string against it (the r10
local snapshot precedent: raw suite medians as the epoch, the pinned-probe
refs as the session-anchor base).

Usage:
  SPARK_GRAFT_BENCH_MASTER='local-cluster[2,8,4096]' \
    SPARK_GRAFT_BENCH_SOURCE=cluster python bench.py   # record
  python scripts/snapshot_cluster_baseline.py bench_spread_cluster.json

The snapshot stores RAW medians (the anchor divides them at rating time,
exactly like the local epoch) and refuses a sidecar without a
``local-cluster`` master — snapshotting a local run here would silently
disable the local/cluster separation the file exists to provide.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_spread_cluster.json"
    with open(os.path.join(_REPO, src) if not os.path.isabs(src) else src) as f:
        doc = json.load(f)
    master = doc.get("master", "")
    if "local-cluster" not in master:
        raise SystemExit(f"refusing snapshot: sidecar master is {master!r}, "
                         "expected a local-cluster[...] recording")
    cal = doc.get("calibration", {})
    out = {
        "master": master,
        "sf": doc.get("sf", 0.1),
        "source": (
            f"snapshot of {src} (source={doc.get('source')}, "
            f"n_runs={doc.get('n_runs')}): raw suite medians under {master}; "
            "rated by bench.py when SPARK_GRAFT_BENCH_MASTER matches exactly"
        ),
        "queries": doc["medians_raw"],
        "calibration_ref": {"cpu": cal.get("ref"), "io": cal.get("io_ref")},
        "calibration_ref_note": (
            "pinned-probe refs measured under the cluster master at snapshot "
            "time — the session-anchor base for future cluster runs"
        ),
    }
    dst = os.path.join(_REPO, "bench_baseline_cluster.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dst}: {len(out['queries'])} queries, master={master}, "
          f"cal={out['calibration_ref']}")


if __name__ == "__main__":
    main()
