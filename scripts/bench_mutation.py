"""Rebuild-vs-merge cost of graph mutation (VERDICT r5 task 7).

Compares, on the sf-dir transcript graph in one JVM:

* ``rebuild``          — prepare_graph from scratch on a fresh copy of the
                         mutated edge table (what base+delta reload pays);
* ``merge_weight_only``— merge_edges with a weight-only delta +
                         prepare_graph on the merged table (topology
                         layouts carry over; only PIE + weighted-push
                         rebuild);
* ``merge_topology``   — merge_edges with an add/del delta +
                         prepare_graph (everything but the fragment
                         bounds rebuilds — the honest lower bound for
                         topology changes).

Writes BENCH/runs/mutation_<epoch>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DELTA = 2000


def main() -> None:
    from pyspark.sql import functions as F

    from bench import build_graph
    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.mutation import merge_edges
    from libgrape_lite_spark.operators import wcc
    from libgrape_lite_spark.plans.kernels import (
        cached_edge_balanced_bounds,
        invalidate_prepared,
        prepare_graph,
    )
    from libgrape_lite_spark.session import tune_shuffle_partitions

    spark = get_spark(
        app_name="mutation-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    wall_start = time.time()

    vertices, edges = build_graph(spark, SF_DIR)
    n_edges = edges.count()
    nf = tune_shuffle_partitions(spark, 2 * n_edges, max_partitions=CPUS)
    prepare_graph(vertices, edges, num_fragments=nf, kernel=True)
    cached_edge_balanced_bounds(edges, nf, key="src")

    # deterministic delta: the N_DELTA smallest (src, dst) edges
    sample = edges.orderBy("src", "dst").limit(N_DELTA).localCheckpoint(eager=True)

    def timed(fn):
        t = time.time()
        out = fn()
        return round(time.time() - t, 3), out

    # -- weight-only: merge + prepare (carried layouts are free) ----------
    w_delta = sample.select(
        F.lit("upd").alias("op"), "src", "dst", (F.col("weight") + 0.5).alias("weight")
    )
    t_merge_w, merged_w = timed(lambda: merge_edges(edges, w_delta))
    t_prep_w, _ = timed(
        lambda: prepare_graph(vertices, merged_w, num_fragments=nf, kernel=True)
    )
    carried_w = len(merged_w._lgls_carried_layouts)

    # -- topology: merge + prepare (layouts rebuild, bounds carry) --------
    t_delta = sample.select(F.lit("del").alias("op"), "src", "dst", "weight")
    t_merge_t, merged_t = timed(lambda: merge_edges(edges, t_delta))
    t_prep_t, _ = timed(
        lambda: prepare_graph(vertices, merged_t, num_fragments=nf, kernel=True)
    )

    # -- full rebuild baseline: same mutated table, fresh object, no memos
    rebuilt = merged_t.select("src", "dst", "weight").localCheckpoint(eager=True)
    t_rebuild, _ = timed(
        lambda: prepare_graph(vertices, rebuilt, num_fragments=nf, kernel=True)
    )

    # sanity: operators agree between merged and rebuilt
    a = sorted(map(tuple, wcc(vertices, merged_t).collect()))
    b = sorted(map(tuple, wcc(vertices, rebuilt).collect()))
    assert a == b, "merged vs rebuilt wcc mismatch"

    for e in (merged_w, merged_t, rebuilt, edges):
        invalidate_prepared(e)

    out = {
        "metric": "mutation_merge_vs_rebuild",
        "sf": SF_DIR,
        "n_edges": n_edges,
        "n_delta": N_DELTA,
        "rebuild_prepare_sec": t_rebuild,
        "merge_weight_only_sec": round(t_merge_w + t_prep_w, 3),
        "merge_weight_only_breakdown": {"merge": t_merge_w, "prepare": t_prep_w},
        "carried_layouts_weight_only": carried_w,
        "merge_topology_sec": round(t_merge_t + t_prep_t, 3),
        "merge_topology_breakdown": {"merge": t_merge_t, "prepare": t_prep_t},
        "wcc_equivalence": True,
        "cpus": CPUS,
        "wall_clock_start_epoch": round(wall_start, 3),
        "wall_clock_end_epoch": round(time.time(), 3),
    }
    try:
        out["loadavg_at_end"] = list(os.getloadavg())
    except OSError:
        pass
    runs = REPO / "BENCH" / "runs"
    runs.mkdir(parents=True, exist_ok=True)
    (runs / f"mutation_{int(wall_start)}.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
