"""SSSP — single-source shortest paths (parallel Bellman-Ford, frontier).

Reference (examples/analytical_apps/sssp/sssp.h:37-170): dist starts +∞,
source 0; PEval relaxes the source's out-edges (sssp.h:68-83); each IncEval
merges incoming distance messages with ``atomic_min`` (sssp.h:118-124),
relaxes the out-edges of improved vertices (sssp.h:132-144), terminates
when the frontier is empty (sssp.h:159-163). Edge weight double; unreached
output "infinity" (sssp_auto_context.h:59-73).

Spark plan per superstep:
    cand  = frontier ⋈ edges on src → (dst, dist+w) → groupBy(dst).min
    dist' = dist ⟗ cand, keep improvements → next frontier
The ``groupBy.min`` is the atomic_min; map-side combine pre-shrinks the
shuffle exactly like the reference's per-fragment dedup of messages.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libgrape_lite_spark.functions.edges import undirected
from libgrape_lite_spark.plans.superstep import IterationDriver
from libgrape_lite_spark.session import static_plans


def sssp(
    vertices: DataFrame,
    edges: DataFrame,
    source: int,
    directed: bool = False,
    driver: IterationDriver | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Returns DataFrame(id: long, dist: double); unreached = +inf.

    ``edges(src, dst, weight)``; undirected doubling applied unless
    ``directed`` (run_app.h:204-210 instantiates SSSP with edata=double).
    """
    spark = vertices.sparkSession
    drv = driver or IterationDriver(spark)

    with static_plans(spark):
        adj = (
            edges.select("src", "dst", "weight")
            if directed
            else undirected(edges.select("src", "dst", "weight"))
        )
        # parallel edges: only the min weight per (src,dst) can ever win a
        # relaxation — pre-combining keeps the per-round join minimal
        adj = (
            adj.groupBy("src", "dst").agg(F.min("weight").alias("weight"))
            .repartition("src")
            .localCheckpoint(eager=True)
        )

        resumed = drv.latest_checkpoint()
        if resumed is not None:
            state, step = resumed
        else:
            step = 0
            state = drv.materialize(
                spark.createDataFrame([(source, 0.0, True)], "id long, dist double, improved boolean"),
                step,
            )

        while max_rounds is None or step < max_rounds:
            t0 = time.time()
            step += 1
            frontier = state.where("improved").select("id", "dist")
            cand = (
                adj.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"), (F.col("dist") + F.col("weight")).alias("nd"))
                .groupBy("id")
                .agg(F.min("nd").alias("nd"))
            )
            new_state = (
                state.select("id", "dist")
                .join(cand, "id", "full")
                .select(
                    "id",
                    F.least(
                        F.coalesce("dist", F.lit(float("inf"))),
                        F.coalesce("nd", F.lit(float("inf"))),
                    ).alias("dist"),
                    (
                        F.col("nd").isNotNull()
                        & (F.col("nd") < F.coalesce("dist", F.lit(float("inf"))))
                    ).alias("improved"),
                )
            )
            state = drv.materialize(new_state, step)
            active = state.where("improved").count()
            drv.log(step, active, time.time() - t0, op="sssp")
            if active == 0:
                break

    drv.finish()
    return (
        vertices.select("id")
        .join(state.select("id", "dist"), "id", "left")
        .select("id", F.coalesce("dist", F.lit(float("inf"))).alias("dist"))
    )
