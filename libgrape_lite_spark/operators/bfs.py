"""BFS — level-synchronous breadth-first search.

Reference (examples/analytical_apps/bfs/bfs.h:36-213): source gets depth 0,
its neighbors depth 1 (bfs.h:68-82); each round assigns ``depth = k`` to
newly reached vertices; messages carry no payload (EmptyType, bfs.h:111-117)
— the level counter lives in the driver. Unreached vertices output
``int64 max`` (bfs_auto_context.h:44; golden p2p-31-BFS-directed).

The reference's bottom-up/top-down direction switching (bfs.h:126-178) is a
shared-memory scan optimization; the Spark frontier join with AQE partition
coalescing achieves the sparse-frontier goal declaratively, so only
top-down is implemented (identical results).

Spark plan per superstep:
    next = frontier ⋈ edges on src → distinct(dst) ▷ visited (left_anti)
Frontiers shrink: AQE coalesces the near-empty shuffle partitions;
late-stage frontiers below the broadcast threshold get broadcast-hash
joins automatically.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libgrape_lite_spark.functions.edges import undirected
from libgrape_lite_spark.plans.superstep import IterationDriver
from libgrape_lite_spark.session import static_plans

INT64_MAX = (1 << 63) - 1


def bfs(
    vertices: DataFrame,
    edges: DataFrame,
    source: int,
    directed: bool = False,
    driver: IterationDriver | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Returns DataFrame(id: long, depth: long); unreached depth = int64 max."""
    spark = vertices.sparkSession
    drv = driver or IterationDriver(spark)

    with static_plans(spark):
        adj = edges.select("src", "dst") if directed else undirected(edges.select("src", "dst"))
        adj = adj.dropDuplicates(["src", "dst"]).repartition("src").localCheckpoint(eager=True)

        resumed = drv.latest_checkpoint()
        if resumed is not None:
            visited, step = resumed
            frontier = visited.where(F.col("depth") == step).select("id")
        else:
            step = 0
            visited = drv.materialize(
                spark.createDataFrame([(source, 0)], "id long, depth long"), step
            )
            frontier = visited.select("id")

        # Per round only the (usually tiny) frontier is materialized; the
        # visited set accumulates lazily as a union of cached frontiers and
        # is compacted every few rounds — one cheap job per superstep
        # instead of rewriting O(V) state every level (deep chains ⇒ many
        # near-empty levels; cf. the reference's bitset frontier,
        # vertex_set.h).
        since_compact = 0
        while max_rounds is None or step < max_rounds:
            t0 = time.time()
            step += 1
            nxt = (
                adj.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("id"), "id", "left_anti")
                .select("id", F.lit(step).cast("long").alias("depth"))
            ).localCheckpoint(eager=True)
            active = nxt.count()
            visited = visited.unionByName(nxt)
            since_compact += 1
            if since_compact >= 8:
                visited = drv.materialize(visited, step)
                since_compact = 0
            frontier = nxt.select("id")
            drv.log(step, active, time.time() - t0, op="bfs")
            if active == 0:
                break
        visited = drv.materialize(visited, step)

    drv.finish()
    return (
        vertices.select("id")
        .join(visited, "id", "left")
        .select("id", F.coalesce("depth", F.lit(INT64_MAX)).alias("depth"))
    )
