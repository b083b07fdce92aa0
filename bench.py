"""Benchmark harness (driver contract): headline queries at $SPARK_GRAFT_SF_DIR
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.json): PageRank supersteps/sec and
edges-processed/sec. Per-query wall times go in "queries". Set
SPARK_GRAFT_SCALING=1 to additionally measure PageRank throughput at
local[8] vs local[32] on the same synthetic transcript graph and report
scaling efficiency (see scripts/bench_scaling.py and BENCH/BASELINE.md for
the recorded protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PR_ROUNDS = 10


def build_graph(spark, sf_dir):
    from libgrape_lite_spark.functions.edges import build_graph_from_transcripts
    from libgrape_lite_spark.sources.events import events_to_transcripts

    t = events_to_transcripts(spark, sf_dir)
    vertices, edges = build_graph_from_transcripts(t)
    vertices = vertices.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    return vertices, edges


def main() -> None:
    from pyspark.sql import functions as F

    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.operators import bfs, cdlp, lcc, pagerank, sssp, wcc

    spark = get_spark(
        app_name="libgrape-lite-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    vertices, edges = build_graph(spark, SF_DIR)
    n_vertices = vertices.count()
    n_edges = edges.count()

    from libgrape_lite_spark.plans.kernels import cached_edge_balanced_bounds
    from libgrape_lite_spark.session import tune_shuffle_partitions

    shuffle_parts = tune_shuffle_partitions(spark, 2 * n_edges, max_partitions=CPUS)
    # fragment bounds belong to the graph, not the operator: one
    # approxQuantile pass here (next to the counts) feeds every auto-impl
    # call below via the per-table memo
    cached_edge_balanced_bounds(edges, shuffle_parts, key="src")
    t_build = time.time() - t0

    source_id = (
        vertices.orderBy("id").limit(1).collect()[0]["id"]
    )

    timings: dict[str, float] = {"graph_build": round(t_build, 3)}

    def timed(name, fn):
        t = time.time()
        df = fn()
        df.count()  # force full evaluation
        timings[name] = round(time.time() - t, 3)

    timed("pagerank", lambda: pagerank(vertices, edges, max_rounds=PR_ROUNDS))

    # convergence-mode PR (the metric's "to 1e-6 convergence" clause)
    from libgrape_lite_spark.plans.superstep import IterationDriver

    conv_drv = IterationDriver(spark)
    timed(
        "pagerank_to_1e6",
        lambda: pagerank(vertices, edges, max_rounds=100, tol=1e-6, driver=conv_drv),
    )
    conv_rounds = len(conv_drv.metrics)

    timed("wcc", lambda: wcc(vertices, edges))  # default impl = auto (PIE)
    timed("wcc_dataframe", lambda: wcc(vertices, edges, impl="dataframe"))
    timed("cdlp", lambda: cdlp(vertices, edges, max_rounds=10))
    timed("cdlp_kernel", lambda: cdlp(vertices, edges, max_rounds=10, impl="kernel"))
    timed("bfs", lambda: bfs(vertices, edges, source=source_id))  # default impl=auto (PIE)
    timed("bfs_push", lambda: bfs(vertices, edges, source=source_id, impl="dataframe"))
    timed("sssp", lambda: sssp(vertices, edges, source=source_id))
    timed("sssp_auto", lambda: sssp(vertices, edges, source=source_id, impl="auto"))
    timed("lcc", lambda: lcc(vertices, edges))

    pr_sec = timings["pagerank"]
    # undirected doubling ⇒ 2E edge traversals per superstep
    edges_per_sec = (2 * n_edges * PR_ROUNDS) / pr_sec if pr_sec > 0 else 0.0

    out = {
        "metric": "pagerank_edges_processed_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "n_vertices": n_vertices,
        "n_edges": n_edges,
        "pr_supersteps_per_sec": round(PR_ROUNDS / pr_sec, 3) if pr_sec else 0.0,
        "pr_rounds_to_1e6": conv_rounds,
        "pr_conv_supersteps_per_sec": round(
            conv_rounds / timings["pagerank_to_1e6"], 3
        )
        if timings.get("pagerank_to_1e6")
        else 0.0,
        "cpus": CPUS,
        "shuffle_partitions": shuffle_parts,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        spark.stop()
        from scripts.bench_scaling import measure_scaling

        out["scaling"] = measure_scaling()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
