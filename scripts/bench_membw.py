"""Raw memory-bandwidth saturation probe (STREAM-triad-like, NumPy).

Independent of Spark: K pinned worker PROCESSES each stream a triad
(a = b + s*c) over arrays far larger than LLC, for a fixed wall-clock
window. Reports aggregate and per-core GB/s at each worker count.

Purpose (BENCH/BASELINE.md scaling analysis): quantify how much of the
engine's measured N→4N efficiency loss is the single socket's memory bus —
hardware every 1-node-vs-4-node comparison on one box shares, and real
clusters do not. engine_efficiency ≈ measured_efficiency / bus_ratio.

Run: python scripts/bench_membw.py [workers ...]   (default 1 2 4 8 16 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N = 20_000_000  # 3 float64 arrays x 160 MB each per worker >> LLC
WINDOW = 5.0    # seconds per measurement


def _worker(cpu: int, q: mp.Queue) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    a = np.zeros(N)
    b = np.full(N, 1.1)
    c = np.full(N, 2.2)
    # warm-up (page-in)
    np.add(b, c, out=a)
    t0 = time.time()
    it = 0
    while time.time() - t0 < WINDOW:
        np.multiply(c, 1.000001, out=a)
        np.add(a, b, out=a)  # triad: a = b + s*c (two passes, 5 arrays traffic)
        it += 1
    dt = time.time() - t0
    # bytes moved per iteration ≈ 5 arrays (read c, write a, read a, read b, write a)
    q.put((cpu, it, dt, 5 * 8 * N * it / dt))


def measure(k: int) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q)) for i in range(k)]
    for p in procs:
        p.start()
    rates = [q.get()[3] for _ in procs]
    for p in procs:
        p.join()
    agg = sum(rates)
    return {"workers": k, "aggregate_gbps": round(agg / 1e9, 2),
            "per_core_gbps": round(agg / k / 1e9, 2)}


def main() -> None:
    ks = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    out = [measure(k) for k in ks]
    base = out[0]["per_core_gbps"]
    for row in out:
        row["per_core_vs_1"] = round(row["per_core_gbps"] / base, 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
