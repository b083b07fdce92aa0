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
    next = frontier ⋈ edges on src → distinct(dst)
           ▷ visited_compacted (hash-partitioned anti-join, no re-exchange)
           ▷ recent frontiers (broadcast anti-joins — tiny)
Frontiers shrink: AQE coalesces the near-empty shuffle partitions;
late-stage frontiers below the broadcast threshold get broadcast-hash
joins automatically. The visited set is two-tier: a compacted,
id-partitioned localCheckpoint (re-built every 8 rounds) plus the small
per-round deltas since — so the O(V) side of the anti-join is never
re-shuffled inside the loop.
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
    impl: str = "dataframe",
    num_fragments: int | None = None,
) -> DataFrame:
    """Returns DataFrame(id: long, depth: long); unreached depth = int64 max.

    ``impl="auto"`` — bfs_auto parity (bfs_auto.h: depth is the unit-weight
    shortest distance, same fixpoint as level-synchronous BFS): range-
    partitioned fragments settle their local levels in one superstep via
    the Bellman-Ford kernel with w=1; global rounds count cross-fragment
    hops — the win on deep chains (a 61-level directed reply chain takes 61
    frontier rounds but ~2-3 auto supersteps). ``"dataframe"`` (default) is
    the frontier push — cheaper per round when frontiers are tiny.
    """
    if impl not in ("dataframe", "auto"):
        raise ValueError(f"impl must be dataframe|auto, got {impl!r}")
    spark = vertices.sparkSession
    drv = driver or IterationDriver(spark)

    if impl == "auto":
        from libgrape_lite_spark.operators.sssp import _sssp_auto

        unit = edges.select("src", "dst", F.lit(1.0).alias("weight"))
        d = _sssp_auto(vertices, unit, source, directed, drv, max_rounds, num_fragments)
        return d.select(
            "id",
            F.when(F.col("dist") == float("inf"), F.lit(INT64_MAX))
            .otherwise(F.col("dist").cast("long"))
            .alias("depth"),
        )

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
        # visited set accumulates lazily and is compacted every few rounds
        # — one cheap job per superstep instead of rewriting O(V) state
        # every level (deep chains ⇒ many near-empty levels; cf. the
        # reference's bitset frontier, vertex_set.h).
        #
        # The visited check is SPLIT: candidates anti-join (a) the big
        # compacted set — kept hash-partitioned on id and localCheckpointed,
        # so the exchange on that side happens once per compaction, not per
        # round — then (b) the union of the few post-compaction frontiers,
        # which is small enough for a broadcast anti-join. Without the
        # split, every round re-shuffles the ever-growing visited union.
        visited_big = visited.repartition("id").localCheckpoint(eager=True)
        recent: list[DataFrame] = []  # post-compaction (id, depth) deltas
        while max_rounds is None or step < max_rounds:
            t0 = time.time()
            step += 1
            cand = (
                adj.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited_big.select("id"), "id", "left_anti")
            )
            for r in recent:
                cand = cand.join(F.broadcast(r.select("id")), "id", "left_anti")
            nxt = cand.select(
                "id", F.lit(step).cast("long").alias("depth")
            ).localCheckpoint(eager=True)
            active = nxt.count()
            recent.append(nxt)
            if len(recent) >= 8:
                merged = visited_big
                for r in recent:
                    merged = merged.unionByName(r)
                visited_big = drv.materialize(merged.repartition("id"), step)
                recent = []
            frontier = nxt.select("id")
            drv.log(step, active, time.time() - t0, op="bfs")
            if active == 0:
                break
        visited = visited_big
        for r in recent:
            visited = visited.unionByName(r)
        visited = drv.materialize(visited, step)

    drv.finish()
    return (
        vertices.select("id")
        .join(visited, "id", "left")
        .select("id", F.coalesce("depth", F.lit(INT64_MAX)).alias("depth"))
    )
