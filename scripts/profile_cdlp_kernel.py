"""Profile the CDLP kernel path vs the dataframe path (VERDICT r5 task 6).

cdlp_kernel ran ~1.7-2x the dataframe impl on every r5 record. This
script decomposes ONE 10-round run of each into phases, in one JVM on the
sf-dir transcript graph, plus an offline NumPy micro-profile of the vote
kernel's per-fragment steps (sized to one fragment of this graph) to
separate Python-worker/Arrow overhead from kernel math.

Phases measured per round (median over rounds):

* kernel:   partials = cogroup+applyInPandas count, final agg, join-apply
* dataframe: join+two-level-agg count, top aggregate, join-apply

Writes BENCH/runs/cdlp_profile_<epoch>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = 10


def numpy_microprofile(n_edges_frag: int, n_nodes_frag: int) -> dict:
    """Time the kernel's NumPy steps on one synthetic fragment."""
    import numpy as np

    rng_src = np.arange(n_edges_frag, dtype=np.int64) * 2654435761 % n_nodes_frag
    rng_dst = np.arange(n_edges_frag, dtype=np.int64) * 40503 % n_nodes_frag
    ids = np.arange(n_nodes_frag, dtype=np.int64)
    labels = ids % 97

    out = {}
    t = time.time()
    order = np.argsort(ids, kind="stable")
    ids_sorted, labels_sorted = ids[order], labels[order]
    pos = np.searchsorted(ids_sorted, rng_dst)
    vote = labels_sorted[np.minimum(pos, len(ids_sorted) - 1)]
    out["lookup_ms"] = round((time.time() - t) * 1000, 2)

    t = time.time()
    pairs = np.stack([rng_src, vote], axis=1)
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    out["unique_axis0_ms"] = round((time.time() - t) * 1000, 2)

    t = time.time()
    su, s_inv = np.unique(rng_src, return_inverse=True)
    vu, v_inv = np.unique(vote, return_inverse=True)
    key = s_inv.astype(np.int64) * len(vu) + v_inv
    uk, kcounts = np.unique(key, return_counts=True)
    _ = su[uk // len(vu)], vu[uk % len(vu)], kcounts
    out["factorized_1d_ms"] = round((time.time() - t) * 1000, 2)
    out["n_edges_frag"] = n_edges_frag
    out["n_nodes_frag"] = n_nodes_frag
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from bench import build_graph
    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.plans.kernels import (
        dst_kernel_adjacency_table,
        gather_adjacency_table,
        gather_label_counts,
        partition_state,
        prepare_graph,
    )
    from libgrape_lite_spark.session import static_plans, tune_shuffle_partitions

    spark = get_spark(
        app_name="cdlp-profile", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    wall_start = time.time()

    vertices, edges = build_graph(spark, SF_DIR)
    n_vertices = vertices.count()
    n_edges = edges.count()
    nf = tune_shuffle_partitions(spark, 2 * n_edges, max_partitions=CPUS)
    prepare_graph(vertices, edges, num_fragments=nf, kernel=True)

    k_adj = dst_kernel_adjacency_table(edges, nf, directed=False)
    d_adj = gather_adjacency_table(edges, "dst", directed=False)

    res: dict = {
        "metric": "cdlp_kernel_profile",
        "sf": SF_DIR,
        "n_vertices": n_vertices,
        "n_edges": n_edges,
        "num_fragments": nf,
        "rounds": ROUNDS,
        "cpus": CPUS,
    }

    with static_plans(spark):
        state = vertices.select("id", F.col("id").alias("label")).localCheckpoint(
            eager=True
        )
        k_partials, k_final, k_apply = [], [], []
        for _ in range(ROUNDS):
            t = time.time()
            counts = gather_label_counts(k_adj, state, "label", nf)
            # phase 1: cogroup + kernel + final agg (counts already includes
            # the groupBy-sum; time it as one since they pipeline)
            counts = counts.localCheckpoint(eager=True)
            k_partials.append(time.time() - t)
            t = time.time()
            top = (
                counts.groupBy("id")
                .agg(
                    F.max(
                        F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
                    ).alias("m")
                )
                .select("id", (-F.col("m.neg")).alias("new_label"))
            )
            new_state = state.join(top, "id", "left").select(
                "id", F.coalesce("new_label", "label").alias("label")
            )
            new_state = new_state.localCheckpoint(eager=True)
            k_apply.append(time.time() - t)
            counts.rdd.unpersist(False)
            state.rdd.unpersist(False)
            state = new_state
        res["kernel_gather_sec"] = [round(x, 3) for x in k_partials]
        res["kernel_apply_sec"] = [round(x, 3) for x in k_apply]
        state.rdd.unpersist(False)

        state = vertices.select("id", F.col("id").alias("label")).localCheckpoint(
            eager=True
        )
        d_gather, d_apply = [], []
        for _ in range(ROUNDS):
            t = time.time()
            counts = (
                d_adj.join(state.select(F.col("id").alias("dst"), "label"), "dst")
                .groupBy(F.col("src").alias("id"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            ).localCheckpoint(eager=True)
            d_gather.append(time.time() - t)
            t = time.time()
            top = (
                counts.groupBy("id")
                .agg(
                    F.max(
                        F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
                    ).alias("m")
                )
                .select("id", (-F.col("m.neg")).alias("new_label"))
            )
            new_state = state.join(top, "id", "left").select(
                "id", F.coalesce("new_label", "label").alias("label")
            )
            new_state = new_state.localCheckpoint(eager=True)
            d_apply.append(time.time() - t)
            counts.rdd.unpersist(False)
            state.rdd.unpersist(False)
            state = new_state
        res["dataframe_gather_sec"] = [round(x, 3) for x in d_gather]
        res["dataframe_apply_sec"] = [round(x, 3) for x in d_apply]
        state.rdd.unpersist(False)

    res["kernel_gather_median"] = round(statistics.median(k_partials), 3)
    res["dataframe_gather_median"] = round(statistics.median(d_gather), 3)
    res["kernel_apply_median"] = round(statistics.median(k_apply), 3)
    res["dataframe_apply_median"] = round(statistics.median(d_apply), 3)
    res["numpy_microprofile"] = numpy_microprofile(
        max(1, 2 * n_edges // nf), max(1, n_vertices // nf)
    )
    res["wall_clock_start_epoch"] = round(wall_start, 3)
    res["wall_clock_end_epoch"] = round(time.time(), 3)
    try:
        res["loadavg_at_end"] = list(os.getloadavg())
    except OSError:
        pass
    runs = REPO / "BENCH" / "runs"
    runs.mkdir(parents=True, exist_ok=True)
    (runs / f"cdlp_profile_{int(wall_start)}.json").write_text(
        json.dumps(res, indent=1) + "\n"
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
