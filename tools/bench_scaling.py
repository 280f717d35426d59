"""Scaling-evidence harness (BASELINE.md protocol): run the identical job
via spark-submit --py-files dist/engine.zip at local[8] and local[32] on
the same input, median of --reps runs, and write BENCH/BASELINE.md with
images/sec at both levels and efficiency = (T8/T32)/4.

Usage: python tools/bench_scaling.py [--n 50000] [--reps 3] [--mode signatures]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip() -> str:
    """Package mfdedup_spark for --py-files (spark-submit distribution)."""
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "engine.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "mfdedup_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_once(cpus: int, zpath: str, input_path: str, mode: str, fidelity: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cpus}]",
        "--conf", f"spark.sql.shuffle.partitions={cpus}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.locality.wait=0",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=256",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "ingest.py"),
        "--input", input_path,
        "--mode", mode,
        "--fidelity", fidelity,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from run: {out.stdout[-500:]} {out.stderr[-1500:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", default="signatures")
    ap.add_argument("--fidelity", default="full")
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import ensure_image_fixture

    input_path = ensure_image_fixture(args.n)
    zpath = build_zip()
    levels = [int(x) for x in args.levels.split(",")]

    results: dict[int, list[dict]] = {}
    for cpus in levels:
        results[cpus] = []
        for rep in range(args.reps):
            r = run_once(cpus, zpath, input_path, args.mode, args.fidelity)
            results[cpus].append(r)
            print(f"local[{cpus}] rep {rep}: {r['time_sec']}s "
                  f"({r['images_per_sec']} img/s)", flush=True)

    med = {c: statistics.median(r["time_sec"] for r in rs) for c, rs in results.items()}
    ips = {c: args.n / med[c] for c in med}
    lo, hi = min(levels), max(levels)
    eff = (med[lo] / med[hi]) / (hi / lo)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    report = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(report, "w") as f:
        f.write(f"""# Scaling evidence — {args.mode} job, N={args.n} images

Protocol (BASELINE.md): identical job, identical input, two parallelism
levels via `spark-submit --py-files dist/engine.zip jobs/ingest.py`,
median of {args.reps} runs, fidelity={args.fidelity}.
Levels chosen as N and 4N cores with 4N ≤ half the VM's 32 physical
cores, so neither run oversubscribes (JVM task threads + python workers
share cores); the VM exhibits host-level burst noise, hence medians.

| cores | median wall (s) | images/sec |
|---|---|---|
""")
        for c in levels:
            f.write(f"| {c} | {med[c]:.1f} | {ips[c]:.0f} |\n")
        f.write(f"""
**Scaling efficiency {lo}→{hi} cores: {eff:.2f}** (target ≥ 0.8)

All raw runs:
""")
        for c, rs in results.items():
            f.write(f"- local[{c}]: {[r['time_sec'] for r in rs]} s\n")
        f.write("""
Notes:
- Single-VM substitute for the N→4N executor rule: both runs share one
  memory subsystem, so bandwidth-bound phases understate what separate
  executors would deliver; per-core compute (the Arrow signature UDF)
  is the scaling carrier.
- shuffle partitions fixed = cores in both runs (shuffle-shaped alike).
""")
    print(f"\nefficiency {lo}->{hi}: {eff:.3f}  (report: {report})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
