"""A/B probe: PageRank round time on a RUNNING standalone cluster under
different join/partition confs — localizes the flat-scaling bottleneck.

Usage: python scripts/_cluster_probe.py <total_cores> <n_conversations> <variant>
  variant ∈ {base, nobc, sp2x, nobc_sp2x, shj, shj_w100, shj_w100_comp}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cores = int(sys.argv[1])
    n_conv = int(sys.argv[2])
    variant = sys.argv[3]

    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.functions.edges import build_graph_from_transcripts
    from libgrape_lite_spark.operators import pagerank
    from libgrape_lite_spark.sources.transcripts import synthesize_transcripts

    sp = {"base": cores, "nobc": cores, "sp2x": 2 * cores, "nobc_sp2x": 2 * cores, "shj": cores, "shj_w100": cores, "shj_w100_comp": cores}[variant]
    conf = {
        "spark.executor.cores": "8",
        "spark.executor.memory": "14g",
        "spark.cores.max": str(cores),
        "spark.submit.pyFiles": str(Path(__file__).resolve().parent.parent / "dist" / "libgrape_lite_spark.zip"),
        "spark.locality.wait": "0s",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    }
    if variant.startswith("nobc"):
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    if variant.startswith("shj"):
        # force ShuffledHashJoin: no per-round driver broadcast of the
        # state, no per-round sort of the pre-partitioned adjacency
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
        conf["spark.sql.join.preferSortMergeJoin"] = "false"
    if "w100" in variant:
        conf["spark.locality.wait"] = "100ms"
    if variant.endswith("comp"):
        conf["spark.shuffle.compress"] = "true"
        conf["spark.shuffle.spill.compress"] = "true"
    spark = get_spark(
        app_name=f"probe-{variant}", master="spark://127.0.0.1:7077",
        shuffle_partitions=sp, extra_conf=conf,
    )
    spark.sparkContext.addPyFile(conf["spark.submit.pyFiles"])
    spark.sparkContext.setLogLevel("ERROR")
    t = synthesize_transcripts(spark, n_conv, seed=42).localCheckpoint(eager=True)
    v, e = build_graph_from_transcripts(t)
    v = v.localCheckpoint(eager=True)
    e = e.localCheckpoint(eager=True)
    ne = e.count()
    pagerank(v, e, max_rounds=1).count()
    t0 = time.time()
    pagerank(v, e, max_rounds=10).count()
    dt = time.time() - t0
    print(json.dumps({"variant": variant, "cores": cores, "shuffle_partitions": sp,
                      "seconds": round(dt, 2), "edges_per_sec": round(2 * ne * 10 / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
