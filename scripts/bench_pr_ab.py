"""Paired interleaved A/B for the PageRank superstep-loop GC cost
(VERDICT r6 task 1).

Round 6 fixed a real leak (one pinned O(V) localCheckpoint block leaked
per superstep) and the fixed-round PageRank headline regressed 4.7 → 5.1 s
warm floor on every record. The confound: PR runs FIRST in bench.py, so
it pays the per-round release cost without the offsetting benefit every
later operator got (no accumulated leak). This script settles causality
with the same paired protocol that settled the r5 BFS dispute
(scripts/bench_bfs_ab.py): both arms run back-to-back inside one JVM,
within-pair order alternates, decision statistic is the median per-pair
delta.

Arms are GC modes of ``IterationDriver._gc`` (SPARK_GRAFT_GC_MODE):
  ids   — r7 default: pinned RDD ids captured at materialize, grandparent
          freed by one ``unpersistRDD`` py4j call (~4 ms/round micro)
  keep2 — the r6-shipped release: full plan-walk release_pinned per round
          (~10 ms/round micro)
  r5    — the round-5 leaky behavior (df.unpersist no-op, keep-1): the
          control arm that measures the leak fix's TOTAL price. Its leak
          is bounded here (n_pairs × rounds × O(V) blocks at sf0.1 ≈
          tens of MB) and hits both arms' later pairs equally.

Usage::

    python scripts/bench_pr_ab.py [mode_a] [mode_b] [n_pairs]
    # default: ids r5 12

Writes BENCH/runs/pr_ab_<epoch>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PR_ROUNDS = int(os.environ.get("SPARK_GRAFT_PR_ROUNDS", "10"))
RUNS_DIR = Path(__file__).resolve().parent.parent / "BENCH" / "runs"


def main() -> None:
    mode_a = sys.argv[1] if len(sys.argv) > 1 else "ids"
    mode_b = sys.argv[2] if len(sys.argv) > 2 else "r5"
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    from bench import build_graph
    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.operators import pagerank
    from libgrape_lite_spark.plans.kernels import prepare_graph
    from libgrape_lite_spark.session import tune_shuffle_partitions
    from libgrape_lite_spark.transients import release_transients

    spark = get_spark(
        app_name="pr-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    wall_start = time.time()
    loadavg_at_start = os.getloadavg()

    vertices, edges = build_graph(spark, SF_DIR)
    n_edges = edges.count()
    shuffle_parts = tune_shuffle_partitions(spark, 2 * n_edges, max_partitions=CPUS)
    prepare_graph(vertices, edges, num_fragments=shuffle_parts, kernel=False)

    def run(mode: str) -> float:
        os.environ["SPARK_GRAFT_GC_MODE"] = mode
        t = time.time()
        pagerank(vertices, edges, max_rounds=PR_ROUNDS).count()
        dt = time.time() - t
        release_transients()
        os.environ.pop("SPARK_GRAFT_GC_MODE", None)
        return round(dt, 3)

    # untimed warm-up of both arms (JIT + codegen caches), not recorded
    run(mode_a)
    run(mode_b)

    pairs: list[tuple[float, float, str]] = []
    for i in range(n_pairs):
        if i % 2 == 0:
            a = run(mode_a)
            b = run(mode_b)
            order = f"{mode_a}_first"
        else:
            b = run(mode_b)
            a = run(mode_a)
            order = f"{mode_b}_first"
        pairs.append((a, b, order))

    deltas = [round(a - b, 3) for a, b, _ in pairs]
    out = {
        "protocol": "paired_interleaved_ab",
        "operator": f"pagerank_{PR_ROUNDS}rounds_gc_mode",
        "mode_a": mode_a,
        "mode_b": mode_b,
        "n_pairs": n_pairs,
        "pairs_a_b_order": pairs,
        "deltas_a_minus_b": deltas,
        "median_delta_a_minus_b": round(statistics.median(deltas), 3),
        "a_wins": sum(1 for d in deltas if d < 0),
        "b_wins": sum(1 for d in deltas if d > 0),
        "a_median": round(statistics.median(a for a, _, _ in pairs), 3),
        "b_median": round(statistics.median(b for _, b, _ in pairs), 3),
        "a_min": min(a for a, _, _ in pairs),
        "b_min": min(b for _, b, _ in pairs),
        "sf": SF_DIR,
        "cpus": CPUS,
        "pr_rounds": PR_ROUNDS,
        "loadavg_at_start": loadavg_at_start,
        "wall_clock_start_epoch": round(wall_start, 3),
        "wall_clock_end_epoch": round(time.time(), 3),
    }
    try:
        out["loadavg_at_end"] = os.getloadavg()
    except OSError:
        pass
    try:
        RUNS_DIR.mkdir(parents=True, exist_ok=True)
        (RUNS_DIR / f"pr_ab_{int(wall_start)}.json").write_text(
            json.dumps(out, indent=1) + "\n"
        )
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
