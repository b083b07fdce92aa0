"""VertexProgram — the engine's public "plug in a sequential algorithm" API.

Parity target: the reference's PIE app surface, where a user supplies
PEval/IncEval plus a message aggregator and the runtime drives the fixpoint
(grape/app/auto_app_base.h:38-73; aggregator lambdas in sync_buffer.h:78-84;
worker loop worker.h:87-133). The Spark-native contract:

* ``init(vertices, edges) -> state``          (PEval's ctx.Init)
* ``message(edges ⋈ state) -> Column``        (what an edge sends to dst)
* ``merge ∈ {min, max, sum, count}``          (the aggregator — exactly the
  decomposable set the reference's auto message manager supports,
  auto_parallel_message_manager.h:125-144)
* ``apply(state, msgs) -> state'`` with a boolean ``changed`` column
  (IncEval's per-vertex update; the changed-count is the termination test —
  "no messages sent" ⇔ no vertex changed)

The driver loop, lineage truncation, checkpoint/resume and metrics come
from :class:`~libgrape_lite_spark.plans.superstep.IterationDriver` — user
code never touches iteration mechanics, exactly like the reference.

``tests/test_vertex_program.py`` re-expresses WCC and SSSP as programs and
checks them against the dedicated operators.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libgrape_lite_spark.functions.edges import undirected
from libgrape_lite_spark.plans.superstep import IterationDriver
from libgrape_lite_spark.session import static_plans

_MERGE = {"min": F.min, "max": F.max, "sum": F.sum, "count": F.count}


@dataclass
class VertexProgram:
    """A declarative PIE program.

    ``message`` receives the joined frame where each row is an edge with
    its source's state columns attached (edge cols + state cols except
    ``id``) and returns the message value column sent to ``dst``.
    ``apply`` receives (state, msgs(id, msg)) and returns the new state
    including a boolean ``changed``.
    """

    init: Callable[[DataFrame, DataFrame], DataFrame]
    message: Callable[[DataFrame], Column]
    merge: str
    apply: Callable[[DataFrame, DataFrame], DataFrame]
    directed: bool = False
    frontier_only: bool = True  # only changed vertices emit messages (IncEval)


def run_vertex_program(
    vertices: DataFrame,
    edges: DataFrame,
    program: VertexProgram,
    driver: IterationDriver | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Drive ``program`` to its fixpoint; returns the final state
    (without the ``changed`` bookkeeping column)."""
    spark = vertices.sparkSession
    drv = driver or IterationDriver(spark)

    with static_plans(spark):
        adj = edges if program.directed else undirected(edges)
        adj = adj.repartition("src").localCheckpoint(eager=True)

        resumed = drv.latest_checkpoint()
        if resumed is not None:
            state, step = resumed
        else:
            step = 0
            init = program.init(vertices, edges)
            if "changed" not in init.columns:
                init = init.withColumn("changed", F.lit(True))
            state = drv.materialize(init, step)

        merge_fn = _MERGE[program.merge]
        while max_rounds is None or step < max_rounds:
            t0 = time.time()
            step += 1
            senders = state.where("changed") if program.frontier_only else state
            joined = adj.join(senders.withColumnRenamed("id", "src"), "src")
            msgs = (
                joined.select(F.col("dst").alias("id"), program.message(joined).alias("m"))
                .groupBy("id")
                .agg(merge_fn("m").alias("msg"))
            )
            new_state = program.apply(state, msgs)
            state = drv.materialize(new_state, step)
            active = state.where("changed").count()
            drv.log(step, active, time.time() - t0, op="vertex_program")
            if active == 0:
                break

    drv.finish()
    return state.drop("changed")


# ---------------------------------------------------------------- examples
def wcc_program() -> VertexProgram:
    """Hash-min WCC as a plug-in program (wcc_auto.h's aggregator is min,
    wcc_auto_context.h:56-67)."""

    def init(vertices, edges):
        return vertices.select("id", F.col("id").alias("comp"))

    def apply(state, msgs):
        return (
            state.select("id", "comp")
            .join(msgs, "id", "left")
            .select(
                "id",
                F.least("comp", F.coalesce("msg", "comp")).alias("comp"),
                (F.col("msg") < F.col("comp")).alias("changed"),
            )
        )

    return VertexProgram(init=init, message=lambda j: F.col("comp"), merge="min", apply=apply)


def sssp_program(source: int, directed: bool = False) -> VertexProgram:
    """Frontier Bellman-Ford as a plug-in program (sssp_auto aggregator =
    min, sssp_auto_context.h:46-54)."""

    def init(vertices, edges):
        return vertices.select(
            "id",
            F.when(F.col("id") == source, 0.0)
            .otherwise(float("inf"))
            .alias("dist"),
            (F.col("id") == source).alias("changed"),
        )

    def apply(state, msgs):
        return (
            state.select("id", "dist")
            .join(msgs, "id", "left")
            .select(
                "id",
                F.least("dist", F.coalesce("msg", "dist")).alias("dist"),
                (F.col("msg") < F.col("dist")).alias("changed"),
            )
        )

    return VertexProgram(
        init=init,
        message=lambda j: F.col("dist") + F.col("weight"),
        merge="min",
        apply=apply,
        directed=directed,
    )
