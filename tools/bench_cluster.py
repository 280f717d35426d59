"""Separate-JVM scaling evidence (VERDICT r04 task 1).

The single-JVM local[N] protocol cannot distinguish "the job stops
scaling" from "one JVM's shuffle/IO paths and allocator are shared by
every thread". This harness runs the IDENTICAL job against a localhost
standalone cluster at 1 worker vs 4 workers — every worker is its own
JVM, every executor its own JVM (2 cores / fixed heap each), with
separate shuffle file streams — so the per-worker shape is constant and
the only variable is worker COUNT, the literal N→4N rule of the
BASELINE protocol.

  python tools/bench_cluster.py --n 1000000 --mode restore --reps 3

Reads the same cached fixture/warehouse as tools/bench_scaling.py and
appends a section to BENCH/BASELINE_<mode>_cluster.md. Reps are
interleaved across levels (this VM throttles in multi-minute phases).
Pass --stage-metrics to capture per-stage input/shuffle byte volumes
from the driver's status REST API (the byte-level account of the wall).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import statistics
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
MASTER_HOST, MASTER_PORT, MASTER_UI = "127.0.0.1", 7077, 8081
MASTER_URL = f"spark://{MASTER_HOST}:{MASTER_PORT}"


def _daemon_env() -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_LOG_DIR", "/tmp/spark-cluster-logs")
    env.setdefault("SPARK_PID_DIR", "/tmp/spark-cluster-pids")
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("SPARK_LOCAL_IP", MASTER_HOST)
    return env


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        s.settimeout(0.5)
        return s.connect_ex((MASTER_HOST, port)) == 0


def start_master(log_dir: str) -> subprocess.Popen:
    os.makedirs(log_dir, exist_ok=True)
    # the child inherits a dup'd fd, so the parent copy closes immediately
    # (ADVICE r05 low: log handles were never closed)
    with open(os.path.join(log_dir, "master.log"), "w") as log:
        p = subprocess.Popen(
            [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
             "-h", MASTER_HOST, "-p", str(MASTER_PORT),
             "--webui-port", str(MASTER_UI)],
            env=_daemon_env(),
            stdout=log,
            stderr=subprocess.STDOUT,
        )
    for _ in range(120):
        if _port_open(MASTER_PORT):
            return p
        time.sleep(0.5)
    stop_procs([p])
    raise RuntimeError("standalone master did not come up on :7077")


def start_workers(
    n: int, cores: int, mem: str, log_dir: str
) -> list[subprocess.Popen]:
    procs = []
    # registration failures must not orphan already-spawned worker JVMs
    # (ADVICE r05 low: they held the worker ports/work dirs and
    # contaminated subsequent levels); log handles close right away — the
    # children keep their dup'd fds
    try:
        for i in range(n):
            with open(os.path.join(log_dir, f"worker-{i}.log"), "w") as log:
                procs.append(
                    subprocess.Popen(
                        [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                         MASTER_URL, "-c", str(cores), "-m", mem,
                         "--webui-port", str(8200 + i),
                         "--work-dir", f"/tmp/spark-worker-{i}"],
                        env=_daemon_env(),
                        stdout=log,
                        stderr=subprocess.STDOUT,
                    )
                )
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://{MASTER_HOST}:{MASTER_UI}/json/", timeout=5
                ) as r:
                    st = json.load(r)
                alive = [
                    w for w in st.get("workers", []) if w["state"] == "ALIVE"
                ]
                if len(alive) >= n:
                    return procs
            except Exception:
                pass
            time.sleep(1)
        raise RuntimeError(f"only some of {n} workers registered in 90s")
    except BaseException:
        stop_procs(procs)
        raise


def stop_procs(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()


def run_once(
    zpath: str, input_path: str, mode: str, total_cores: int,
    exec_cores: int, exec_mem: str, warehouse: str | None,
    stage_metrics: bool, timeout: int,
) -> dict:
    cmd = [
        os.path.join(SPARK_HOME, "bin", "spark-submit"),
        "--master", MASTER_URL,
        "--conf", f"spark.executor.cores={exec_cores}",
        "--conf", f"spark.executor.memory={exec_mem}",
        "--conf", f"spark.cores.max={total_cores}",
        "--conf", f"spark.sql.shuffle.partitions={total_cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.locality.wait=0",
        "--conf", f"spark.ui.enabled={'true' if stage_metrics else 'false'}",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=256",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "ingest.py"),
        "--input", input_path,
        "--mode", mode,
        "--fidelity", "full",
    ]
    if warehouse:
        cmd += ["--warehouse", warehouse]
    if stage_metrics:
        cmd += ["--stage-metrics"]
    env = _daemon_env()
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, env=env
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from run: {out.stdout[-500:]} {out.stderr[-1500:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", default="restore")
    ap.add_argument(
        "--levels", default="1,4",
        help="worker counts, or WxC pairs for explicit worker-count x "
        "cores-per-worker levels (e.g. '1x8,4x2' = the same-total-cores "
        "JVM-count control)",
    )
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--exec-mem", default="10g")
    ap.add_argument("--worker-mem", default="11g")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--stage-metrics", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench import ensure_image_fixture
    from bench_scaling import build_zip

    input_path = ensure_image_fixture(args.n)
    zpath = build_zip()
    # each level = (workers, cores-per-worker); bare counts inherit
    # --exec-cores
    levels: list[tuple[int, int]] = []
    for tok in args.levels.split(","):
        if "x" in tok:
            w, c = tok.split("x")
            levels.append((int(w), int(c)))
        else:
            levels.append((int(tok), args.exec_cores))
    warehouse = None
    if args.mode == "restore":
        warehouse = f"/tmp/mfdedup_bench/wh_restore_{args.n}"
        assert os.path.exists(warehouse), (
            f"{warehouse} missing: run tools/bench_scaling.py --mode restore "
            "once to build it"
        )

    log_dir = "/tmp/spark-cluster-logs"
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    master = start_master(log_dir)
    results: dict[tuple[int, int], list[dict]] = {lv: [] for lv in levels}

    def cpu_stat():
        parts = open("/proc/stat").readline().split()
        vals = list(map(int, parts[1:9]))
        return sum(vals), vals[3] + vals[7]

    def exec_mem_for(cores: int) -> str:
        # keep per-core memory constant across level shapes (default
        # --exec-mem is for --exec-cores; scale proportionally)
        per_core = int(args.exec_mem.rstrip("g")) / args.exec_cores
        return f"{max(2, round(per_core * cores))}g"

    try:
        for rep in range(args.reps):
            for lv in levels:
                n_workers, cores = lv
                emem = exec_mem_for(cores)
                wmem = f"{int(emem.rstrip('g')) + 1}g"
                workers = start_workers(n_workers, cores, wmem, log_dir)
                try:
                    s0 = cpu_stat()
                    r = run_once(
                        zpath, input_path, args.mode,
                        n_workers * cores, cores,
                        emem, warehouse,
                        args.stage_metrics and rep == 0, args.timeout,
                    )
                    s1 = cpu_stat()
                    dt, didle = s1[0] - s0[0], s1[1] - s0[1]
                    r["host_busy_frac"] = round(1 - didle / max(dt, 1), 3)
                    r["n_workers"] = n_workers
                    r["cores_per_worker"] = cores
                    results[lv].append(r)
                    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
                    with open(
                        os.path.join(
                            REPO, "BENCH",
                            f"raw_{args.mode}_cluster_{args.n}.jsonl",
                        ),
                        "a",
                    ) as rawf:
                        rawf.write(json.dumps({**r, "rep": rep}) + "\n")
                    print(
                        f"rep {rep} {n_workers}w x {cores}c: "
                        f"{r['time_sec']}s ({r['images_per_sec']} rows/s, "
                        f"host busy {r['host_busy_frac']})",
                        flush=True,
                    )
                finally:
                    stop_procs(workers)
    finally:
        stop_procs([master])

    med = {lv: statistics.median(r["time_sec"] for r in rs)
           for lv, rs in results.items()}
    best = {lv: min(r["time_sec"] for r in rs) for lv, rs in results.items()}
    lo = min(levels, key=lambda lv: lv[0] * lv[1])
    hi = max(levels, key=lambda lv: lv[0] * lv[1])
    if lo == hi:  # same total cores everywhere: order by worker count
        lo, hi = levels[0], levels[-1]
    ratio = (hi[0] * hi[1]) / (lo[0] * lo[1])
    eff = (best[lo] / best[hi]) / ratio
    eff_med = (med[lo] / med[hi]) / ratio
    n_rows = {lv: results[lv][0].get("rows", args.n) for lv in results}
    same_cores = ratio == 1  # JVM-count control: report overhead, not eff

    report = os.path.join(
        REPO, "BENCH", f"BASELINE_{args.mode}_cluster.md"
    )
    with open(report, "w") as f:
        f.write(f"""# Separate-JVM scaling — {args.mode}, N={args.n} images

Identical job and input as BENCH/BASELINE_{args.mode}.md, but executed
on a localhost STANDALONE cluster: each worker is its own JVM and hosts
one {args.exec_cores}-core / {args.exec_mem} executor JVM (separate
heaps, separate shuffle file streams, separate Python worker pools).
The per-worker shape is constant across levels; only the worker count
changes — the literal N→4N two-cluster-size rule, minus the shared
memory bus this single VM cannot split. {args.reps} interleaved reps,
per-level minima approximate the uncontended host.

| workers | cores/worker | total cores | best wall (s) | median wall (s) | rows/sec (best) |
|---|---|---|---|---|---|
""")
        for lv in levels:
            w, c = lv
            f.write(
                f"| {w} | {c} | {w * c} | {best[lv]:.1f} | "
                f"{med[lv]:.1f} | {n_rows[lv] / best[lv]:.0f} |\n"
            )
        if same_cores:
            f.write(f"""
**Same-total-cores JVM-count control {lo[0]}x{lo[1]} vs {hi[0]}x{hi[1]}:
wall ratio {best[hi] / best[lo]:.2f} (best), {med[hi] / med[lo]:.2f}
(median)** — a ratio ≈ 1 means splitting the same cores across more
executor JVMs costs nothing, i.e. JVM-internal contention is not the
scaling limiter.
""")
        else:
            f.write(f"""
**Scaling efficiency {lo[0]*lo[1]}→{hi[0]*hi[1]} cores across separate
JVMs: {eff:.2f} (best-of-{args.reps}), {eff_med:.2f} (median)** —
target ≥ 0.8
""")
        f.write("""
All raw runs (seconds, host-busy fraction from /proc/stat):
""")
        for (w, c), rs in results.items():
            f.write(
                f"- {w}x{c}: "
                + ", ".join(
                    f"{r['time_sec']} (busy {r.get('host_busy_frac', '?')})"
                    for r in rs
                )
                + "\n"
            )
        srcs = [
            (w, r) for w, rs in results.items() for r in rs if "stage_io" in r
        ]
        if srcs:
            f.write(
                "\n## Per-stage byte volumes (rep-0 instrumented run; "
                "driver status REST API, timed section only)\n"
            )
            for (w, c), r in srcs:
                io = r["stage_io"]
                t = io["totals"]
                f.write(
                    f"\n### {w} worker(s) x {c} cores — input "
                    f"{t['input_bytes'] / 1e9:.2f} GB, shuffle write "
                    f"{t['shuffle_write_bytes'] / 1e9:.2f} GB, shuffle read "
                    f"{t['shuffle_read_bytes'] / 1e9:.2f} GB, executor time "
                    f"{t['executor_run_ms'] / 1e3:.0f} s\n\n"
                    "| stage | name | input GB | shuf W GB | shuf R GB | "
                    "exec s | tasks |\n|---|---|---|---|---|---|---|\n"
                )
                for s in io["stages"][:8]:
                    f.write(
                        f"| {s['stage']} | {s['name'][:50]} | "
                        f"{s['input_bytes'] / 1e9:.2f} | "
                        f"{s['shuffle_write_bytes'] / 1e9:.2f} | "
                        f"{s['shuffle_read_bytes'] / 1e9:.2f} | "
                        f"{s['executor_run_ms'] / 1e3:.1f} | {s['tasks']} |\n"
                    )
    print(
        f"\nefficiency {lo}->{hi} workers: best {eff:.3f} "
        f"median {eff_med:.3f} (report: {report})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
