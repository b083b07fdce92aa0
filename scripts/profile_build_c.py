"""Graph-build wall time at synthetic scale C (guide §1: measure at the
size the claim is about). Synthesizes C conversations, then times the
bench build protocol — build_graph_from_transcripts + eager checkpoints +
counts — cold (first pass of the JVM) and warm (repeat passes), with the
dictionary-shuffle path (broadcast_dict=False, the 100 TB configuration
the scaling legs use). Sanity-asserts the id dictionary is dense 0..V-1
so an at-scale id-assignment regression cannot hide behind a timing.

Run: python scripts/profile_build_c.py [n_conversations] [repeats]
Writes BENCH/runs/build_c_<epoch>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

C = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS_DIR = Path(__file__).resolve().parent.parent / "BENCH" / "runs"


def main() -> None:
    try:
        loadavg_at_start = list(os.getloadavg())
    except OSError:
        loadavg_at_start = []

    from pyspark.sql import functions as F

    from libgrape_lite_spark import get_spark, transients
    from libgrape_lite_spark.functions.edges import build_graph_from_transcripts
    from libgrape_lite_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(
        app_name=f"profile-build-c{C}", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = synthesize_transcripts(spark, C, seed=42).localCheckpoint(eager=True)

    runs = []
    n_vertices = n_edges = 0
    for i in range(REPEATS):
        spark.sparkContext.setJobDescription(f"build_c#{i}")
        t0 = time.time()
        vertices, edges = build_graph_from_transcripts(t, broadcast_dict=False)
        vertices = vertices.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
        n_vertices = vertices.count()
        n_edges = edges.count()
        runs.append(round(time.time() - t0, 3))
        if i == 0:
            # dense-id sanity: distinct count == count == max id + 1
            row = vertices.agg(
                F.count("id").alias("n"),
                F.countDistinct("id").alias("nd"),
                F.max("id").alias("mx"),
            ).collect()[0]
            assert row["n"] == row["nd"] == row["mx"] + 1 == n_vertices, row
        from libgrape_lite_spark.plans.kernels import release_pinned

        release_pinned(vertices)
        release_pinned(edges)
        transients.release_transients()
    spark.sparkContext.setJobDescription(None)

    try:
        loadavg_at_end = list(os.getloadavg())
    except OSError:
        loadavg_at_end = []
    out = {
        "n_conversations": C,
        "n_vertices": n_vertices,
        "n_edges": n_edges,
        "build_runs_sec": runs,
        "build_cold_sec": runs[0],
        "build_warm_median_sec": round(statistics.median(runs[1:] or runs), 3),
        "cpus": CPUS,
        "loadavg_at_start": loadavg_at_start,
        "loadavg_at_end": loadavg_at_end,
        "quotable_idle_start": bool(loadavg_at_start and loadavg_at_start[0] < 2.0),
    }
    try:
        RUNS_DIR.mkdir(parents=True, exist_ok=True)
        (RUNS_DIR / f"build_c_{int(time.time())}.json").write_text(
            json.dumps(out, indent=1) + "\n"
        )
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
