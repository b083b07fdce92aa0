"""Paired interleaved A/B protocol for impl-default decisions (VERDICT r5
task 1, built for the BFS push-vs-auto question).

Why paired: this box's noise is ±40% and BURSTY — comparing medians taken
in different runs (or even different minutes of one run) attributes the
burst to whichever impl happened to execute inside it. The r5 BFS default
(push) was settled on six morning runs and contradicted by every on-record
run since. A paired design cancels drift: each pair runs both impls
back-to-back inside one JVM, alternating order between pairs so
first-position effects (JIT, page cache) cancel too; the decision statistic
is the MEDIAN of per-pair deltas, which a single burst cannot move.

Usage::

    python scripts/bench_bfs_ab.py [n_pairs]   # default 12

Writes BENCH/runs/bfs_ab_<epoch>.json and prints one JSON line:
{"pairs": [[push_s, auto_s, order], ...], "deltas_push_minus_auto": [...],
 "median_delta": s, "push_wins": n, "auto_wins": n, ...}
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
RUNS_DIR = Path(__file__).resolve().parent.parent / "BENCH" / "runs"


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    from bench import build_graph
    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.operators import bfs
    from libgrape_lite_spark.plans.kernels import prepare_graph
    from libgrape_lite_spark.session import tune_shuffle_partitions
    from libgrape_lite_spark.transients import release_transients

    spark = get_spark(
        app_name="bfs-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    wall_start = time.time()

    vertices, edges = build_graph(spark, SF_DIR)
    n_edges = edges.count()
    shuffle_parts = tune_shuffle_partitions(spark, 2 * n_edges, max_partitions=CPUS)
    prepare_graph(vertices, edges, num_fragments=shuffle_parts, kernel=True)
    source_id = vertices.orderBy("id").limit(1).collect()[0]["id"]

    def run(impl: str) -> float:
        t = time.time()
        bfs(vertices, edges, source=source_id, impl=impl).count()
        dt = time.time() - t
        release_transients()
        return round(dt, 3)

    # untimed warm-up of BOTH impls (JIT + codegen caches), not recorded
    run("dataframe")
    run("auto")

    pairs: list[tuple[float, float, str]] = []
    for i in range(n_pairs):
        if i % 2 == 0:  # alternate within-pair order so position cancels
            p = run("dataframe")
            a = run("auto")
            order = "push_first"
        else:
            a = run("auto")
            p = run("dataframe")
            order = "auto_first"
        pairs.append((p, a, order))

    deltas = [round(p - a, 3) for p, a, _ in pairs]
    out = {
        "protocol": "paired_interleaved_ab",
        "operator": "bfs",
        "impls": {"push": "dataframe", "auto": "auto"},
        "n_pairs": n_pairs,
        "pairs_push_auto_order": pairs,
        "deltas_push_minus_auto": deltas,
        "median_delta_push_minus_auto": round(statistics.median(deltas), 3),
        "push_wins": sum(1 for d in deltas if d < 0),
        "auto_wins": sum(1 for d in deltas if d > 0),
        "push_median": round(statistics.median(p for p, _, _ in pairs), 3),
        "auto_median": round(statistics.median(a for _, a, _ in pairs), 3),
        "sf": SF_DIR,
        "cpus": CPUS,
        "wall_clock_start_epoch": round(wall_start, 3),
        "wall_clock_end_epoch": round(time.time(), 3),
    }
    try:
        out["loadavg_at_end"] = os.getloadavg()
    except OSError:
        pass
    try:
        RUNS_DIR.mkdir(parents=True, exist_ok=True)
        (RUNS_DIR / f"bfs_ab_{int(wall_start)}.json").write_text(
            json.dumps(out, indent=1) + "\n"
        )
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
