"""Two-cluster-size scaling evidence (north rule).

A real N vs 4N executor comparison is impossible in this sandbox, so per
BASELINE.md the same PageRank job runs on the same deterministic synthetic
transcript graph (seed 42 ⇒ byte-identical input) at two parallelism
levels — ``local[8]`` pinned to CPUs 0-7 via ``taskset`` (a genuine 8-core
machine: JVM GC/netty/IO threads included) vs ``local[32]`` on all 32 CPUs
— and we report throughput at both plus

    efficiency = throughput(4N) / (4 × throughput(N)).

Each leg runs in its own subprocess (own JVM), sequentially, so the legs
never share cache or GC state. Run:

    python scripts/bench_scaling.py [n_conversations]

appends the measured table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PR_ROUNDS = 10


def _run_leg(cores: int, n_conversations: int) -> dict:
    cmd = [sys.executable, str(REPO / "scripts" / "_scaling_worker.py"), str(cores), str(n_conversations)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=str(REPO))
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def measure_scaling(n_conversations: int = 1_000_000) -> dict:
    lo = _run_leg(8, n_conversations)
    time.sleep(20)  # cool-down: let the first leg's JVM fully exit
    hi = _run_leg(32, n_conversations)
    eff = hi["edges_per_sec"] / (4.0 * lo["edges_per_sec"])
    return {"local8": lo, "local32": hi, "efficiency": round(eff, 3)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    res = measure_scaling(n)
    print(json.dumps(res, indent=2))
    # committed raw (record hygiene, VERDICT r7 task 7): every quoted
    # sweep row cites one of these files, loadavgs + quotable included
    runs = REPO / "BENCH" / "runs"
    runs.mkdir(parents=True, exist_ok=True)
    (runs / f"scaling_{int(time.time())}.json").write_text(
        json.dumps({"n_conversations": n, **res}, indent=1) + "\n"
    )
    bench_md = REPO / "BENCH" / "BASELINE.md"
    bench_md.parent.mkdir(exist_ok=True)
    lo, hi = res["local8"], res["local32"]
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with bench_md.open("a") as f:
        f.write(
            f"""
## PageRank scaling run — {stamp}

Input: deterministic synthetic transcripts (seed 42), {n} conversations →
{lo['n_vertices']} vertices / {lo['n_edges']} edges (doubled at runtime);
PageRank {PR_ROUNDS} supersteps after a 1-round warm-up, identical input at
both parallelism levels. The 8-core leg is pinned with ``taskset -c 0-7``
(the JVM's GC/IO threads are bounded like a real 8-core node); each leg is
a separate JVM.

| master | CPUs | shuffle parts | seconds | supersteps/sec | edges-processed/sec |
|---|---|---|---|---|---|
| local[8]  | pinned 0-7 | 8  | {lo['seconds']} | {lo['supersteps_per_sec']} | {lo['edges_per_sec']:,.0f} |
| local[32] | all 32     | 32 | {hi['seconds']} | {hi['supersteps_per_sec']} | {hi['edges_per_sec']:,.0f} |

**Scaling efficiency (throughput(4N) / (4 × throughput(N))): {res['efficiency']}**
""",
        )


if __name__ == "__main__":
    main()
