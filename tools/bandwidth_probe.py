"""Memory-bandwidth probe for the scaling report: measures aggregate and
per-worker numpy copy bandwidth with P concurrent processes (P = the same
parallelism levels as the scaling bench). On a single shared-socket VM,
per-worker bandwidth dropping as P grows quantifies how much of the
dedup job's sub-linear core scaling is machine contention rather than
plan shape — separate executors on a real cluster each get their own
memory system (BASELINE.md note).

Usage: python tools/bandwidth_probe.py [P ...]   (default: 2 8)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

N_BYTES = 512 * 1024 * 1024  # 512 MiB per worker
REPS = 3


def worker(q: mp.Queue) -> None:
    src = np.ones(N_BYTES // 8, dtype=np.uint64)
    dst = np.empty_like(src)
    best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        dt = time.perf_counter() - t0
        best = max(best, 2 * N_BYTES / dt)  # read + write
    q.put(best)


def run(p: int) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(p)]
    for pr in procs:
        pr.start()
    vals = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    per = sum(vals) / len(vals)
    return {
        "workers": p,
        "per_worker_gbps": round(per / 1e9, 2),
        "aggregate_gbps": round(sum(vals) / 1e9, 2),
    }


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [2, 8]
    out = [run(p) for p in levels]
    lo, hi = out[0], out[-1]
    out.append(
        {
            "per_worker_retention": round(
                hi["per_worker_gbps"] / lo["per_worker_gbps"], 3
            )
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
