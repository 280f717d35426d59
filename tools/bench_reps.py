"""Repeated-headline-bench protocol (VERDICT r04 task 2).

The driver's per-round BENCH_r{N}.json is a SINGLE rep of bench.py on a
host whose identical queries swing 2-10x between throttle phases, so a
round-over-round delta on one rep is a coin flip. This tool runs the
exact driver command (`python bench.py`, fresh JVM per rep, identical
env) N times back-to-back — reps thereby interleave across host phases —
and reports per-query MINIMA (the uncontended-machine estimate) and
medians to BENCH/headline_reps.md.

  python tools/bench_reps.py --reps 4
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_stat() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()
    vals = list(map(int, parts[1:9]))
    return sum(vals), vals[3] + vals[7]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--label", default=None,
                    help="row label in the report (default: utc timestamp)")
    args = ap.parse_args()

    runs = []
    raw_path = os.path.join(REPO, "BENCH", "raw_headline_reps.jsonl")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    for rep in range(args.reps):
        s0 = cpu_stat()
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=args.timeout, cwd=REPO,
        )
        s1 = cpu_stat()
        line = [
            ln for ln in out.stdout.splitlines() if ln.strip().startswith("{")
        ][-1]
        r = json.loads(line)
        dt, didle = s1[0] - s0[0], s1[1] - s0[1]
        r["host_busy_frac"] = round(1 - didle / max(dt, 1), 3)
        r["rep"] = rep
        r["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        runs.append(r)
        with open(raw_path, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(
            f"rep {rep}: total {r['value']}s "
            + " ".join(f"{q}={s}" for q, s in r["queries"].items())
            + f" (host busy {r['host_busy_frac']})",
            flush=True,
        )

    queries = list(runs[0]["queries"])
    mins = {q: min(r["queries"][q] for r in runs) for q in queries}
    meds = {q: statistics.median(r["queries"][q] for r in runs) for q in queries}
    label = args.label or runs[0]["ts"]
    report = os.path.join(REPO, "BENCH", "headline_reps.md")
    exists = os.path.exists(report)
    with open(report, "a") as f:
        if not exists:
            f.write(
                """# Headline bench, repeated-reps protocol

Same command and env as the driver's per-round bench (`python bench.py`
at sf0.1, local[32], fresh JVM per rep); reps run back-to-back so they
interleave across this VM's multi-minute throttle phases. Per-query
MINIMA approximate the uncontended machine; single-rep driver numbers
(BENCH_r{N}.json) should be read against these, not against each other.

"""
            )
        f.write(f"## {label} — {args.reps} reps\n\n")
        f.write("| query | " + " | ".join(
            f"rep{r['rep']}" for r in runs) + " | min | median |\n")
        f.write("|---|" + "---|" * (args.reps + 2) + "\n")
        for q in queries:
            f.write(
                f"| {q} | "
                + " | ".join(f"{r['queries'][q]:.2f}" for r in runs)
                + f" | **{mins[q]:.2f}** | {meds[q]:.2f} |\n"
            )
        f.write(
            "| total | "
            + " | ".join(f"{r['value']:.2f}" for r in runs)
            + f" | **{sum(mins.values()):.2f}** | — |\n"
        )
        f.write(
            "\nhost_busy_frac per rep: "
            + ", ".join(str(r["host_busy_frac"]) for r in runs)
            + "\n\n"
        )
    print(f"\nminima: {mins} (report: {report})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
