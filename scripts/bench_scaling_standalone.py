"""True N vs 4N *executor* scaling measurement on a real standalone cluster.

The north rule requires throughput scaling efficiency ≥ 0.8 between an
N-executor and a 4N-executor cluster. This sandbox has no multi-node
cluster, but it CAN run a genuine multi-process Spark standalone cluster:
master + worker daemons launched straight from the pip-installed pyspark
jars (``java -cp $SPARK_HOME/jars/* org.apache.spark.deploy.{master,worker}``
— the one required env var is ``SPARK_SCALA_VERSION=2.13``, without which
the executor launcher cannot resolve the jars dir from a pip layout and
dies with "Cannot find any build directories").

Protocol (each leg a fresh cluster, same deterministic input):

* leg N:  1 worker  JVM, ``taskset``-pinned to CPUs 0-7,  8 cores / 20 GB
* leg 4N: 4 worker JVMs, pinned to 0-7 / 8-15 / 16-23 / 24-31, 8 cores each
* driver connects with ``spark.executor.cores=8`` so executors map 1:1 to
  workers (1 executor vs 4 executors — real separate JVMs with their own
  heaps, GC, shuffle servers and Python worker pools, talking over
  localhost sockets like cluster nodes talk over the fabric)
* the repo ships to executors via ``--py-files``-equivalent
  (``spark.submit.pyFiles`` = dist/libgrape_lite_spark.zip), the
  spark-submit production shape
* job: PageRank, 10 supersteps after a 1-round warm-up, on the synthetic
  transcript graph (seed 42 ⇒ byte-identical input for both legs)

Caveat recorded with the result: both legs still share ONE machine's
memory-bandwidth/LLC, which a real 4-node cluster would not — so the
measured number is a LOWER bound on real N→4N scaling. A half-machine
control (1×4-core vs 4×4-core workers = 4 vs 16 CPUs, bus unsaturated in
both legs) is run alongside to isolate that confound.

Run:  python scripts/bench_scaling_standalone.py [n_conversations]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SPARK_HOME = Path(
    subprocess.check_output(
        [sys.executable, "-c", "import pyspark, os; print(os.path.dirname(pyspark.__file__))"],
        text=True,
    ).strip()
)
WORK = Path("/tmp/spark-standalone-bench")
MASTER_URL = "spark://127.0.0.1:7077"
PR_ROUNDS = int(os.environ.get("SPARK_GRAFT_PR_ROUNDS", "10"))


def _env() -> dict[str, str]:
    env = dict(os.environ)
    env["SPARK_HOME"] = str(SPARK_HOME)
    env["SPARK_SCALA_VERSION"] = "2.13"
    env["PYSPARK_PYTHON"] = sys.executable
    env["SPARK_LOG_DIR"] = str(WORK / "logs")
    return env


def _launch(args: list[str], log: Path, pin: str | None = None) -> subprocess.Popen:
    cmd = ["java", "-cp", f"{SPARK_HOME}/jars/*", "-Xmx1g"] + args
    if pin and shutil.which("taskset"):
        cmd = ["taskset", "-c", pin] + cmd
    log.parent.mkdir(parents=True, exist_ok=True)
    with log.open("w") as fh:
        return subprocess.Popen(cmd, stdout=fh, stderr=subprocess.STDOUT, env=_env())


def _wait_for(log: Path, needle: str, timeout: float = 30.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if log.exists() and needle in log.read_text():
            return
        time.sleep(0.5)
    raise TimeoutError(f"{needle!r} not found in {log}")


class Cluster:
    """A master + K pinned workers; context-managed teardown."""

    def __init__(self, worker_pins: list[str], cores_each: int, mem_each: str = "20g"):
        self.worker_pins = worker_pins
        self.cores_each = cores_each
        self.mem_each = mem_each
        self.procs: list[subprocess.Popen] = []

    def __enter__(self) -> "Cluster":
        logs = WORK / "logs"
        m = _launch(
            ["org.apache.spark.deploy.master.Master", "--host", "127.0.0.1",
             "--port", "7077", "--webui-port", "8091"],
            logs / "master.log",
        )
        self.procs.append(m)
        _wait_for(logs / "master.log", "I have been elected leader")
        for i, pin in enumerate(self.worker_pins):
            w = _launch(
                ["org.apache.spark.deploy.worker.Worker",
                 "--cores", str(self.cores_each), "--memory", self.mem_each,
                 "--port", str(7200 + i), "--webui-port", str(8200 + i),
                 "--work-dir", str(WORK / f"work{i}"), MASTER_URL],
                logs / f"worker{i}.log",
                pin=pin,
            )
            self.procs.append(w)
            _wait_for(logs / f"worker{i}.log", "Successfully registered")
        return self

    def __exit__(self, *exc) -> None:
        for p in reversed(self.procs):
            p.send_signal(signal.SIGTERM)
        for p in self.procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        time.sleep(2)


def _run_leg(total_cores: int, n_conversations: int, exec_cores: int) -> dict:
    """Driver subprocess against the running cluster (fresh JVM per leg)."""
    env = _env()
    env["SPARK_GRAFT_EXEC_CORES"] = str(exec_cores)
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "_scaling_worker.py"),
         str(total_cores), str(n_conversations), "42", MASTER_URL],
        capture_output=True, text=True, cwd=str(REPO), env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"leg with {total_cores} cores failed (rc={out.returncode})")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def measure(n_conversations: int, cores_each: int, pins_n: list[str], pins_4n: list[str]) -> dict:
    if (WORK / "logs").exists():
        shutil.rmtree(WORK / "logs")
    with Cluster(pins_n, cores_each):
        lo = _run_leg(cores_each * len(pins_n), n_conversations, cores_each)
    time.sleep(5)
    with Cluster(pins_4n, cores_each):
        hi = _run_leg(cores_each * len(pins_4n), n_conversations, cores_each)
    eff = hi["edges_per_sec"] / (4.0 * lo["edges_per_sec"])
    return {"n_leg": lo, "four_n_leg": hi, "efficiency": round(eff, 3)}


def _pins(cores_each: int, k: int) -> list[str]:
    """k consecutive taskset pin ranges of ``cores_each`` CPUs."""
    out = []
    for i in range(k):
        lo = i * cores_each
        hi = lo + cores_each - 1
        out.append(str(lo) if hi == lo else f"{lo}-{hi}")
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # cores per executor: the granularity dial. 8 = full-machine legs
    # (32 CPUs in the 4N leg — deep in the single-socket bandwidth wall);
    # 1-2 = bandwidth-unsaturated legs (≤8 CPUs total) that measure the
    # ENGINE's N→4N behavior rather than the box's one memory bus.
    cores_each = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    subprocess.run([sys.executable, str(REPO / "scripts" / "make_pyfiles.py")],
                   check=True, cwd=str(REPO))

    # control: a second granularity (half the primary, min 1) — both legs
    # further below the bandwidth ceiling. Either can be skipped
    # (SPARK_GRAFT_SKIP_CONTROL / SPARK_GRAFT_ONLY_CONTROL).
    full = ctrl = None
    if not os.environ.get("SPARK_GRAFT_ONLY_CONTROL"):
        full = measure(n, cores_each, _pins(cores_each, 1), _pins(cores_each, 4))
        print(json.dumps({"protocol": f"1x{cores_each} vs 4x{cores_each} executors", **full}, indent=2))
    if not os.environ.get("SPARK_GRAFT_SKIP_CONTROL"):
        half = max(1, cores_each // 2)
        ctrl = measure(n, half, _pins(half, 1), _pins(half, 4))
        print(json.dumps({"protocol": f"1x{half} vs 4x{half} executors (control)", **ctrl}, indent=2))

    # raw-run record first (record hygiene: every number quoted in
    # BENCH/BASELINE.md must cite a committed machine-clock artifact)
    raw = {
        "script": "bench_scaling_standalone.py",
        "n_conversations": n,
        "cores_each": cores_each,
        "full": full,
        "control": ctrl,
        "wall_clock_end_epoch": round(time.time(), 3),
        "loadavg_at_end": list(os.getloadavg()),
    }
    runs_dir = REPO / "BENCH" / "runs"
    runs_dir.mkdir(parents=True, exist_ok=True)
    (runs_dir / f"scaling_{int(time.time())}.json").write_text(
        json.dumps(raw, indent=1) + "\n"
    )

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    bench_md = REPO / "BENCH" / "BASELINE.md"
    ce = cores_each
    if full is None:
        if ctrl is not None:
            half = max(1, ce // 2)
            clo, chi = ctrl["n_leg"], ctrl["four_n_leg"]
            with bench_md.open("a") as f:
                f.write(f"""
## Control-only run — {stamp} — C={n:,}: 1×{half} vs 4×{half} executors

| cluster | executors | CPUs | seconds | edges-processed/s |
|---|---|---|---|---|
| N  | 1 × {half} cores | {half} | {clo['seconds']} | {clo['edges_per_sec']:,.0f} |
| 4N | 4 × {half} cores | {4 * half} | {chi['seconds']} | {chi['edges_per_sec']:,.0f} |

**Control efficiency: {ctrl['efficiency']}**
""")
        print("appended BENCH/BASELINE.md")
        return
    lo, hi = full["n_leg"], full["four_n_leg"]
    with bench_md.open("a") as f:
        f.write(f"""
## PageRank N vs 4N EXECUTOR scaling — real standalone cluster — {stamp}

Multi-JVM standalone cluster (master + taskset-pinned worker daemons from
the pip pyspark jars). Each executor is its own JVM with its own
heap/GC/shuffle server/Python pool; code ships via
``spark.submit.pyFiles`` (the spark-submit --py-files shape). Input:
deterministic synthetic transcripts (seed 42), {n:,} conversations →
{lo['n_vertices']:,} vertices / {lo['n_edges']:,} edges; PageRank
{PR_ROUNDS} supersteps after a 1-round warm-up. ``seconds`` times the
SUPERSTEPS (the BASELINE.json metric) from the driver's per-round
metrics; the one-time in-operator graph prep (adjacency doubling +
repartition + pin + degree init — amortized over a whole job at scale)
is ``setup``.

| cluster | executors | CPUs | seconds | setup s | supersteps/s | edges-processed/s |
|---|---|---|---|---|---|---|
| N  | 1 × {ce} cores | {ce} | {lo['seconds']} | {lo.get('setup_seconds', '—')} | {lo['supersteps_per_sec']} | {lo['edges_per_sec']:,.0f} |
| 4N | 4 × {ce} cores (pinned consecutive) | {4 * ce} | {hi['seconds']} | {hi.get('setup_seconds', '—')} | {hi['supersteps_per_sec']} | {hi['edges_per_sec']:,.0f} |

**Scaling efficiency (throughput(4N) / (4 × throughput(N))): {full['efficiency']}**
""")
        if ctrl is not None:
            half = max(1, ce // 2)
            clo, chi = ctrl["n_leg"], ctrl["four_n_leg"]
            f.write(f"""
Control at half granularity (1 × {half}-core vs 4 × {half}-core executors):

| cluster | executors | CPUs | seconds | edges-processed/s |
|---|---|---|---|---|
| N  | 1 × {half} cores | {half} | {clo['seconds']} | {clo['edges_per_sec']:,.0f} |
| 4N | 4 × {half} cores | {4 * half} | {chi['seconds']} | {chi['edges_per_sec']:,.0f} |

**Control efficiency: {ctrl['efficiency']}** — all legs on one machine
share the memory bus/LLC that real cluster nodes do not, so low-core
legs (bus unsaturated on both sides) are the faithful ones; full-machine
legs are lower bounds on true N→4N node scaling.
""")
    print("appended BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
