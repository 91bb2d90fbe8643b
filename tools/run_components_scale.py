#!/usr/bin/env python
"""Components-at-scale evidence: runs duplicate_components on a
deterministic 8M-node / ~0.9M-edge graph at local[8] and local[32]
(fresh JVM each, identical 8g heap, tmpfs spark.local.dir) and
records the per-round time breakdown plus the 8->32 speedup.

Purpose: the 600k-node CORPUS_SCALING run showed a 0.59x "speedup"
8->32 because every round sat on the scheduling latency floor. The
claim that rounds become data-bound (shuffle/compute dominated) at
multi-million-node size needs a measurement, not an extrapolation —
this produces it. Results merge into CORPUS_SCALING.json under
"components_large".

Usage: python tools/run_components_scale.py [n_nodes]  (default 8M)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, n_nodes: int) -> dict:
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    local_dir = tempfile.mkdtemp(prefix="spark_local_", dir=shm)
    summary = os.path.join(local_dir, "summary.json")
    try:
        proc = subprocess.run(
            [
                "spark-submit",
                "--master",
                f"local[{cores}]",
                "--driver-memory",
                "8g",
                "--conf",
                f"spark.local.dir={local_dir}",
                "--conf",
                f"spark.sql.shuffle.partitions={cores * 4}",
                "--conf",
                "spark.sql.adaptive.enabled=true",
                os.path.join(REPO, "tools", "_components_scale_worker.py"),
                str(n_nodes),
                summary,
            ],
            capture_output=True,
            text=True,
            timeout=3600,
            cwd=REPO,
        )
        if not os.path.exists(summary):
            sys.stderr.write((proc.stderr or "")[-3000:])
            raise SystemExit(f"worker at local[{cores}] produced no summary")
        with open(summary) as f:
            return json.load(f)
    finally:
        shutil.rmtree(local_dir, ignore_errors=True)


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    r8 = run(8, n_nodes)
    r32 = run(32, n_nodes)
    t8, t32 = r8["wall_sec"], r32["wall_sec"]
    entry = {
        "n_nodes": n_nodes,
        "n_edges": r8["n_edges"],
        "n_keepers": r8["n_keepers"],
        "local8": r8,
        "local32": r32,
        "speedup": round(t8 / t32, 2) if t32 else None,
        "efficiency_N_to_4N": round(t8 / (4 * t32), 3) if t32 else None,
    }
    path = os.path.join(REPO, "CORPUS_SCALING.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["components_large"] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
