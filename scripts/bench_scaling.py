"""Two-cluster-size scaling evidence (north rule).

A real N vs 4N executor comparison is impossible in this sandbox, so per
BASELINE.md the same PageRank job runs on the same deterministic synthetic
transcript graph (seed 42 ⇒ byte-identical input) under ``local[8]`` and
``local[32]`` — N vs 4N cores with shuffle partitions scaled to match —
and we report throughput at both plus

    efficiency = throughput(4N) / (4 × throughput(N)).

Run: ``python scripts/bench_scaling.py [n_conversations]`` — appends the
measured table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PR_ROUNDS = 10


def _run_once(cores: int, n_conversations: int, seed: int = 42) -> dict:
    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.functions.edges import build_graph_from_transcripts
    from libgrape_lite_spark.operators import pagerank
    from libgrape_lite_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(
        app_name=f"scaling-local{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # materialize the generator output once — edge derivation scans the
        # transcripts several times (reply/tool/role branches + vertex union)
        t = synthesize_transcripts(spark, n_conversations, seed=seed).localCheckpoint(
            eager=True
        )
        vertices, edges = build_graph_from_transcripts(t)
        vertices = vertices.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
        n_edges = edges.count()
        n_vertices = vertices.count()
        # warm-up superstep machinery (JIT, codegen caches)
        pagerank(vertices, edges, max_rounds=1).count()
        t0 = time.time()
        pagerank(vertices, edges, max_rounds=PR_ROUNDS).count()
        dt = time.time() - t0
        return {
            "cores": cores,
            "n_vertices": n_vertices,
            "n_edges": n_edges,
            "seconds": round(dt, 2),
            "supersteps_per_sec": round(PR_ROUNDS / dt, 3),
            "edges_per_sec": round(2 * n_edges * PR_ROUNDS / dt, 1),
        }
    finally:
        spark.stop()


def measure_scaling(n_conversations: int = 50_000) -> dict:
    lo = _run_once(8, n_conversations)
    hi = _run_once(32, n_conversations)
    eff = hi["edges_per_sec"] / (4.0 * lo["edges_per_sec"])
    return {"local8": lo, "local32": hi, "efficiency": round(eff, 3)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    res = measure_scaling(n)
    print(json.dumps(res, indent=2))
    bench_md = Path(__file__).resolve().parent.parent / "BENCH" / "BASELINE.md"
    bench_md.parent.mkdir(exist_ok=True)
    lo, hi = res["local8"], res["local32"]
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with bench_md.open("a") as f:
        f.write(
            f"""
## PageRank scaling run — {stamp}

Input: deterministic synthetic transcripts (seed 42), {n} conversations →
{lo['n_vertices']} vertices / {lo['n_edges']} edges (doubled at runtime);
PageRank {PR_ROUNDS} supersteps, identical input at both parallelism levels.

| master | shuffle parts | seconds | supersteps/sec | edges-processed/sec |
|---|---|---|---|---|
| local[8]  | 8  | {lo['seconds']} | {lo['supersteps_per_sec']} | {lo['edges_per_sec']:,.0f} |
| local[32] | 32 | {hi['seconds']} | {hi['supersteps_per_sec']} | {hi['edges_per_sec']:,.0f} |

**Scaling efficiency (throughput(4N) / (4 × throughput(N))): {res['efficiency']}**
""",
        )


if __name__ == "__main__":
    main()
