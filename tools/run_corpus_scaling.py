#!/usr/bin/env python
"""Two-parallelism scaling evidence for the TRAINING-DATA tier
(dedup / components / text / curation operators), companion to
tools/run_scaling.py which covers the parse->route pipeline job.

Runs tools/_corpus_scale_worker.py at local[8] and local[32] — fresh
JVM each, identical right-sized 8g heap, tmpfs spark.local.dir — and
reports per-operator wall time at both plus N->4N efficiency
(eff = t8 / (4 * t32); 1.0 = perfect linear scaling). Results land
in CORPUS_SCALING.json.

Usage: python tools/run_corpus_scaling.py [n_docs]   (default 100000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, n_docs: int, ops_csv: str | None = None) -> dict:
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
                os.path.join(REPO, "tools", "_corpus_scale_worker.py"),
                str(n_docs),
                summary,
            ]
            + ([ops_csv] if ops_csv else []),
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
        import shutil

        shutil.rmtree(local_dir, ignore_errors=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    # optional op subset + result key: run a restricted op set at a
    # different corpus size without overwriting the headline per_op
    # table, e.g.  run_corpus_scaling.py 5000000
    #   "line_dedup,shuffle_index" per_op_5m
    ops_csv = sys.argv[2] if len(sys.argv) > 2 else None
    result_key = sys.argv[3] if len(sys.argv) > 3 else "per_op"
    # measure THIS BOX's scaling ceiling the same day as the run —
    # host memory-bandwidth headroom varies drastically between VM
    # placements (observed membw ceiling 0.625 on one host, 0.207 on
    # another), and raw 8->32 efficiency is meaningless without it
    from run_scaling import hardware_ceiling

    hw = hardware_ceiling()
    r8 = run(8, n_docs, ops_csv)
    r32 = run(32, n_docs, ops_csv)
    ops = sorted(r8["timings"])
    per_op: dict = {}
    out = {
        "n_docs": r8["n_docs"],
        "n_pairs": r8.get("n_pairs"),
        "n_keepers": r8.get("n_keepers"),
        **hw,
        result_key: per_op,
    }
    membw = hw["hardware_ceiling_membw_8_to_32"]
    for op in ops:
        t8, t32 = r8["timings"][op], r32["timings"][op]
        eff = round(t8 / (4 * t32), 3) if t32 else None
        per_op[op] = {
            "local8_sec": t8,
            "local32_sec": t32,
            "speedup": round(t8 / t32, 2) if t32 else None,
            "efficiency_N_to_4N": eff,
            "eff_vs_membw_ceiling": (
                round(eff / membw, 2) if eff and membw else None
            ),
        }
    tot8 = sum(r8["timings"].values())
    tot32 = sum(r32["timings"].values())
    totals = {
        "local8_sec": round(tot8, 2),
        "local32_sec": round(tot32, 2),
        "speedup": round(tot8 / tot32, 2),
        "efficiency_N_to_4N": round(tot8 / (4 * tot32), 3),
    }
    if result_key == "per_op":
        out["total"] = totals
    else:
        # restricted run: nest EVERYTHING under the result key so the
        # headline n_docs/total/per_op of the full run survive the merge
        out = {
            result_key: {
                "n_docs": r8["n_docs"],
                **hw,
                "ops": ops_csv,
                "timings": per_op,
                "total": totals,
            }
        }
    # merge-preserve: other tools (run_components_scale.py) keep
    # their own keys (components_large*) in the same artifact
    cache = os.path.join(REPO, "CORPUS_SCALING.json")
    merged = {}
    if os.path.exists(cache):
        try:
            with open(cache) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    merged.update(out)
    with open(cache, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
