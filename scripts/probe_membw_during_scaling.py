"""Direct test of the r6 C=4M shared-bus attribution (VERDICT r6 task 3).

The r6 sweep diagnosed the C=4M 4N-leg efficiency drop (0.551) as
single-socket memory-bus saturation during burst phases — by elimination
(stage-level task accounting showed steady-state supersteps near-linear).
This script measures the bus DIRECTLY: a 2-process STREAM-triad probe
pinned to CPUs the executors never use (30-31) samples achievable
bandwidth continuously while a C=4M PageRank leg runs on a real
standalone cluster, once with 1×7-core executor (N) and once with
4×7-core executors (4N) — pins 0-6 / 7-13 / 14-20 / 21-27, leaving
28-31 free so the probe is never CPU-starved, only bus-contended.

If the attribution is right, the probe's GB/s collapses during the 4N
leg's early burst phase (cross-executor state materialization) and
stays near the idle baseline during the N leg. If the probe holds
steady through 4N bursts, the engine owns the drop again.

Usage::

    python scripts/probe_membw_during_scaling.py [n_conversations]
    # default 4_000_000 (the size where the drop appears)

Writes BENCH/runs/membw_probe_<epoch>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO))

PROBE_CPUS = (30, 31)
PROBE_N = 20_000_000  # 3×160 MB arrays per worker >> LLC
SAMPLE_WINDOW = 2.0


def _probe_worker(cpu: int, q: mp.Queue, stop: mp.Event) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    a = np.zeros(PROBE_N)
    b = np.full(PROBE_N, 1.1)
    c = np.full(PROBE_N, 2.2)
    np.add(b, c, out=a)  # page-in
    while not stop.is_set():
        t0 = time.time()
        it = 0
        while time.time() - t0 < SAMPLE_WINDOW:
            np.multiply(c, 1.000001, out=a)
            np.add(a, b, out=a)
            it += 1
        dt = time.time() - t0
        q.put((time.time(), cpu, 5 * 8 * PROBE_N * it / dt / 1e9))


class Probe:
    """Continuous 2-worker bandwidth sampler; samples are (epoch, GB/s
    aggregate over both workers per window)."""

    def __enter__(self):
        self.q: mp.Queue = mp.Queue()
        self.stop = mp.Event()
        self.procs = [
            mp.Process(target=_probe_worker, args=(c, self.q, self.stop))
            for c in PROBE_CPUS
        ]
        for p in self.procs:
            p.start()
        return self

    def drain(self) -> list[tuple[float, float]]:
        # NOT `while not q.empty()`: mp.Queue.empty() races the feeder
        # pipe and can report empty immediately after a long parent
        # sleep even when samples are queued — a 0.2 s get-timeout
        # drain is the reliable shape.
        out = []
        while True:
            try:
                out.append(self.q.get(timeout=0.2))
            except Exception:
                break
        return out

    def __exit__(self, *exc):
        self.stop.set()
        for p in self.procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()


def _leg(pins: list[str], cores_each: int, n_conv: int) -> tuple[dict, list]:
    from bench_scaling_standalone import WORK, Cluster, _run_leg

    if (WORK / "logs").exists():
        shutil.rmtree(WORK / "logs")
    samples: list = []
    with Probe() as probe:
        with Cluster(pins, cores_each):
            t0 = time.time()
            res = _run_leg(cores_each * len(pins), n_conv, cores_each)
            t1 = time.time()
        time.sleep(SAMPLE_WINDOW + 0.5)
        for ts, cpu, gbs in probe.drain():
            samples.append({"t": round(ts, 1), "cpu": cpu, "gbs": round(gbs, 2)})
    res["_leg_start"], res["_leg_end"] = round(t0, 1), round(t1, 1)
    return res, samples


def _series(samples, t0, t1):
    """Aggregate per-window GB/s (sum of both probe workers, bucketed to
    the window grid) restricted to [t0, t1]."""
    buckets: dict[int, float] = {}
    for s in samples:
        if t0 <= s["t"] <= t1 + SAMPLE_WINDOW:
            buckets[int((s["t"] - t0) // SAMPLE_WINDOW)] = (
                buckets.get(int((s["t"] - t0) // SAMPLE_WINDOW), 0.0) + s["gbs"]
            )
    return [round(buckets[k], 2) for k in sorted(buckets)]


def _idle_only() -> None:
    """Record ONLY the idle baseline (probe alone, no Spark) as a
    companion membw_idle_<epoch>.json — for completing a probe record
    whose in-run baseline window was too short to land samples."""
    wall_start = time.time()
    loadavg_at_start = list(os.getloadavg())
    idle_samples: list[dict] = []
    deadline = time.time() + 120
    with Probe() as probe:
        while len(idle_samples) < 24 and time.time() < deadline:
            time.sleep(SAMPLE_WINDOW)
            idle_samples.extend(
                {"t": round(ts, 1), "cpu": c, "gbs": round(g, 2)}
                for ts, c, g in probe.drain()
            )
    series = (
        _series(idle_samples, idle_samples[0]["t"], idle_samples[-1]["t"])
        if idle_samples
        else []
    )
    s = sorted(series)
    out = {
        "metric": "probe_bandwidth_idle_baseline",
        "probe": {"cpus": list(PROBE_CPUS), "window_sec": SAMPLE_WINDOW},
        "idle_baseline_gbs": {
            "min": s[0],
            "p25": s[len(s) // 4],
            "median": s[len(s) // 2],
            "max": s[-1],
            "n_windows": len(s),
        }
        if s
        else {},
        "series": series,
        "loadavg_at_start": loadavg_at_start,
        "wall_clock_start_epoch": round(wall_start, 3),
        "wall_clock_end_epoch": round(time.time(), 3),
    }
    runs = REPO / "BENCH" / "runs"
    runs.mkdir(parents=True, exist_ok=True)
    (runs / f"membw_idle_{int(wall_start)}.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


def main() -> None:
    if "--idle-only" in sys.argv:
        _idle_only()
        return
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    wall_start = time.time()
    loadavg_at_start = list(os.getloadavg())

    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles.py")],
        check=True,
        cwd=str(REPO),
    )

    # idle baseline: probe alone on an otherwise-idle box. Collect until
    # a sample quota is met — page-in of 3×160 MB arrays per worker takes
    # ~13 s before the first sample lands, so a fixed sleep is fragile.
    idle_samples = []
    idle_deadline = time.time() + 120
    with Probe() as probe:
        while len(idle_samples) < 12 and time.time() < idle_deadline:
            time.sleep(SAMPLE_WINDOW)
            idle_samples.extend(
                {"t": round(ts, 1), "cpu": c, "gbs": round(g, 2)}
                for ts, c, g in probe.drain()
            )
    if idle_samples:
        idle_gbs = _series(idle_samples, idle_samples[0]["t"], idle_samples[-1]["t"])
    else:
        idle_gbs = []

    n_res, n_samples = _leg(["0-6"], 7, n_conv)
    time.sleep(5)
    four_res, four_samples = _leg(["0-6", "7-13", "14-20", "21-27"], 7, n_conv)

    n_series = _series(n_samples, n_res["_leg_start"], n_res["_leg_end"])
    four_series = _series(four_samples, four_res["_leg_start"], four_res["_leg_end"])

    def stats(series):
        if not series:
            return {}
        s = sorted(series)
        return {
            "min": s[0],
            "p25": s[len(s) // 4],
            "median": s[len(s) // 2],
            "max": s[-1],
            "n_windows": len(s),
        }

    out = {
        "metric": "probe_bandwidth_during_scaling_legs",
        "n_conversations": n_conv,
        "probe": {"cpus": list(PROBE_CPUS), "window_sec": SAMPLE_WINDOW},
        "idle_baseline_gbs": stats(idle_gbs),
        "n_leg": {
            "edges_per_sec": n_res.get("edges_per_sec"),
            "probe_gbs": stats(n_series),
            "series": n_series,
        },
        "four_n_leg": {
            "edges_per_sec": four_res.get("edges_per_sec"),
            "probe_gbs": stats(four_series),
            "series": four_series,
        },
        "cores_each": 7,
        "loadavg_at_start": loadavg_at_start,
        "wall_clock_start_epoch": round(wall_start, 3),
        "wall_clock_end_epoch": round(time.time(), 3),
    }
    runs = REPO / "BENCH" / "runs"
    runs.mkdir(parents=True, exist_ok=True)
    (runs / f"membw_probe_{int(wall_start)}.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
