#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the criterion
"throughput scaling efficiency >= 0.8 from N to 4N executors" is
evidenced by running the IDENTICAL spark-submit job at local[8] and
local[32] on the same input (fresh JVM per run so nothing is shared)
and reporting throughput at both.

Usage: python tools/run_scaling.py [n_turns] [--impl native|pandas]
Writes results into BENCH.md-ready JSON on stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_job(master_cores: int, transcripts: str, impl: str) -> dict:
    out_dir = tempfile.mkdtemp(prefix=f"scale_{master_cores}_")
    summary = os.path.join(out_dir, "summary.json")
    try:
        env = dict(os.environ)
        env["SPARK_GRAFT_SHUFFLE"] = str(master_cores)
        subprocess.run(
            [
                "spark-submit",
                "--master",
                f"local[{master_cores}]",
                # identical heap for both sizes — in local mode the
                # driver JVM hosts all executor threads
                "--driver-memory",
                "48g",
                os.path.join(REPO, "run_pipeline.py"),
                "--master",
                f"local[{master_cores}]",
                "--transcripts-parquet",
                transcripts,
                "--input-dir",
                "unused",
                "--output-dir",
                out_dir,
                "--impl",
                impl,
                "--summary-json",
                summary,
            ],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=REPO,
            env=env,
        )
        with open(summary) as f:
            return json.load(f)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    impl = "native" if "native" in sys.argv[1:] else "pandas"

    from ci_log_processing_spark.datagen import write_transcripts

    data_dir = os.path.join(REPO, ".bench_data", f"transcripts_{n_turns}")
    write_transcripts(data_dir, n_turns)

    results = {}
    for cores in (8, 32):
        r = run_job(cores, data_dir, impl)
        results[cores] = r
        print(
            f"# local[{cores}]: {r['rows']} rows in {r['wall_sec']}s "
            f"-> {r['rows_per_sec']} rows/s",
            file=sys.stderr,
        )

    tp8 = results[8]["rows_per_sec"]
    tp32 = results[32]["rows_per_sec"]
    eff = tp32 / (4 * tp8)
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "impl": impl,
                "throughput_local8": tp8,
                "throughput_local32": tp32,
                "speedup_8_to_32": round(tp32 / tp8, 3),
                "scaling_efficiency_N_to_4N": round(eff, 3),
                "wall_local8_sec": results[8]["wall_sec"],
                "wall_local32_sec": results[32]["wall_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
