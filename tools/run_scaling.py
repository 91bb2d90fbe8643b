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
        # 4 shuffle partitions per core: the skewed long-transcript
        # tail overlaps instead of straggling a single task wave
        env["SPARK_GRAFT_SHUFFLE"] = str(master_cores * 4)
        subprocess.run(
            [
                "spark-submit",
                "--master",
                f"local[{master_cores}]",
                # identical, RIGHT-SIZED heap for both runs: an
                # oversized heap (48g) measured 2.5x slower at
                # local[32] — cold-page zeroing + G1 locality — so
                # size like a real executor, not like the machine
                "--driver-memory",
                "8g",
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


def _work(_):
    import hashlib

    h = b"x" * 64
    for _i in range(2_000_000):
        h = hashlib.md5(h).digest()
    return 1


def hardware_ceiling() -> dict:
    """Measured pure-CPU 8->32-process scaling of THIS box.

    On a real cluster, 4N executors means 4x machines at identical
    clock; a single VM running 32 threads drops its all-core
    frequency, so raw 8->32 thread scaling tops out well below 4x
    for ANY software. This calibration (embarrassingly parallel
    md5 in independent processes — no shared state, no GIL) gives
    the machine's own ceiling, against which the pipeline's
    efficiency is normalized.
    """
    import time
    from multiprocessing import Pool

    rates = {}
    for n in (8, 32):
        t0 = time.time()
        with Pool(n) as p:
            p.map(_work, range(n * 2))
        rates[n] = n * 2 / (time.time() - t0)
    return {
        "cpu_units_per_sec_8": round(rates[8], 2),
        "cpu_units_per_sec_32": round(rates[32], 2),
        "hardware_ceiling_8_to_32": round(rates[32] / (4 * rates[8]), 3),
    }


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    impl = "native" if "native" in sys.argv[1:] else "pandas"

    from ci_log_processing_spark.datagen import write_transcripts_parallel

    data_dir = os.path.join(REPO, ".bench_data", f"transcripts_{n_turns}")
    write_transcripts_parallel(data_dir, n_turns)

    results = {}
    for cores in (8, 32):
        r = run_job(cores, data_dir, impl)
        results[cores] = r
        print(
            f"# local[{cores}]: {r['rows']} rows in {r['wall_sec']}s "
            f"-> {r['rows_per_sec']} rows/s",
            file=sys.stderr,
        )

    hw = hardware_ceiling()
    print(f"# hardware ceiling: {hw}", file=sys.stderr)

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
                **hw,
                "efficiency_normalized_to_hardware": round(
                    eff / hw["hardware_ceiling_8_to_32"], 3
                ),
                "wall_local8_sec": results[8]["wall_sec"],
                "wall_local32_sec": results[32]["wall_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
