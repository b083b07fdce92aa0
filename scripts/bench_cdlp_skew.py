"""CDLP kernel-vs-dataframe on a salted power-law graph (VERDICT r6
task 6 — the decisive test for the kernel path's documented niche).

The r6 profile (BENCH/runs/cdlp_profile_*.json) showed the kernel path's
gap on the uniform transcript graph is the per-round Arrow/cogroup
transfer of the pinned adjacency, and the docstring
(operators/cdlp.py) claims the kernel earns that constant back only on
hub-salted skew, where per-fragment vote pre-counting collapses the
shuffle volume the JVM two-level aggregate cannot. This script TESTS
that claim: a zipf-ish synthetic graph (one mega-hub plus a heavy tail)
with hub salting forced on BOTH paths, decided by the paired
interleaved protocol (bench_bfs_ab.py).

Usage::

    python scripts/bench_cdlp_skew.py [n_pairs] [n_edges] [salts]
    # defaults: 6 pairs, 1_000_000 edges, 8 salts

Writes BENCH/runs/cdlp_skew_<epoch>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS_DIR = Path(__file__).resolve().parent.parent / "BENCH" / "runs"
ROUNDS = 5


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    salts = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.operators import cdlp
    from libgrape_lite_spark.plans.kernels import (
        dst_kernel_adjacency_table,
        gather_adjacency_table,
    )
    from libgrape_lite_spark.transients import release_transients

    spark = get_spark(
        app_name="cdlp-skew", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    wall_start = time.time()
    loadavg_at_start = list(os.getloadavg())

    n_v = max(1000, n_edges // 10)
    # power-law-ish dst: rank = floor(n_v * u^6) piles ~55% of edges onto
    # <1% of vertices and makes vertex 0 a mega-hub; src uniform
    e = (
        spark.range(n_edges)
        .select(
            F.pmod(F.hash(F.col("id")), F.lit(n_v)).alias("src"),
            F.floor(F.lit(n_v) * F.pow(F.rand(seed=42), F.lit(6.0))).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    v = spark.range(n_v).select(F.col("id")).localCheckpoint(eager=True)
    hub_edges = e.where(F.col("dst") == 0).count()

    # warm BOTH layouts outside the timed window (bench protocol parity)
    nf = CPUS
    gather_adjacency_table(e, "dst", directed=False)
    dst_kernel_adjacency_table(e, nf, directed=False, salts=salts)

    def run(impl: str) -> float:
        t = time.time()
        cdlp(
            v, e, max_rounds=ROUNDS, impl=impl, hub_salts=salts, num_fragments=nf
        ).count()
        dt = time.time() - t
        release_transients()
        return round(dt, 3)

    run("dataframe")  # untimed warm-ups
    run("kernel")

    pairs = []
    for i in range(n_pairs):
        if i % 2 == 0:
            k, d = run("kernel"), run("dataframe")
        else:
            d, k = run("dataframe"), run("kernel")
        pairs.append((k, d))
    deltas = [round(k - d, 3) for k, d in pairs]
    k_med = statistics.median(k for k, _ in pairs)
    d_med = statistics.median(d for _, d in pairs)
    out = {
        "protocol": "paired_interleaved_ab",
        "operator": f"cdlp_{ROUNDS}rounds_salted_powerlaw",
        "n_edges": n_edges,
        "n_vertices": n_v,
        "hub_edges_on_vertex0": hub_edges,
        "salts": salts,
        "n_pairs": n_pairs,
        "pairs_kernel_dataframe": pairs,
        "deltas_kernel_minus_dataframe": deltas,
        "median_delta": round(statistics.median(deltas), 3),
        "kernel_wins": sum(1 for x in deltas if x < 0),
        "dataframe_wins": sum(1 for x in deltas if x > 0),
        "kernel_median": k_med,
        "dataframe_median": d_med,
        "kernel_over_dataframe": round(k_med / d_med, 3) if d_med else None,
        "cpus": CPUS,
        "loadavg_at_start": loadavg_at_start,
        "wall_clock_start_epoch": round(wall_start, 3),
        "wall_clock_end_epoch": round(time.time(), 3),
    }
    try:
        out["loadavg_at_end"] = list(os.getloadavg())
    except OSError:
        pass
    RUNS_DIR.mkdir(parents=True, exist_ok=True)
    (RUNS_DIR / f"cdlp_skew_{int(wall_start)}.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
