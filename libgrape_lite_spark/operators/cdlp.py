"""CDLP — community detection by synchronous label propagation (LDBC).

Reference (examples/analytical_apps/cdlp/cdlp.h:37-162 + cdlp_utils.h:28-60):

* label starts as the vertex id (cdlp.h:116-129);
* exactly ``max_rounds`` (``--cdlp_mr``, default 10) synchronous rounds —
  new labels go to a separate array applied after the round (cdlp.h:52-88);
* update rule (cdlp_utils.h:34-59): the most frequent label among the
  vertex's out-neighbors — on the undirected doubled table that is all
  neighbors, and **each parallel edge contributes one count** (the loop
  iterates the adjacency list, not a set); **ties break to the smallest
  label** (list sorted ascending + strict ``>`` keeps the earliest run);
* vertices with no neighbors keep their current label (cdlp.h:64-65).

Spark plan per round:
    counts = edges ⋈ labels on dst → groupBy(src, label).count()
    top    = max_by over (count desc, label asc)  — expressed as
             groupBy(src).agg(max(struct(cnt, negated-tiebreak...)))
We use ``F.max(F.struct(cnt, -label))`` instead of a window: a window with
``row_number`` would sort every group; max-of-struct is a plain aggregate
with map-side partial aggregation (one shuffle, no sort) — strictly better
at scale, identical result: max over (cnt, -label) == (max count, then min
label).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libgrape_lite_spark.plans.kernels import graph_op
from libgrape_lite_spark.plans.superstep import IterationDriver
from libgrape_lite_spark.session import static_plans


@graph_op
def cdlp(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int = 10,
    directed: bool = False,
    driver: IterationDriver | None = None,
    impl: str = "dataframe",
    num_fragments: int | None = None,
    hub_salts: int | str = "auto",
    hub_degree_factor: float = 8.0,
    min_hub_degree: int = 1_000_000,
) -> DataFrame:
    """Returns DataFrame(id: long, label: long).

    ``impl="kernel"`` — per-fragment vote pre-counting (factorized pair
    counting, plans/kernels.py::gather_label_counts); only partial counts
    shuffle. ``"dataframe"`` (default) — join + two-level aggregate.

    WHEN TO USE WHICH (profiled round 6,
    BENCH/runs/cdlp_profile_1787008995.json): at sf0.1 the kernel gather
    runs ~3× the dataframe gather per round (1.28 vs 0.38 s median) and
    the gap is NOT kernel math — it is the per-round Arrow/cogroup
    transfer of the pinned adjacency into stateless Python workers, a
    constant the dataframe path's all-JVM join never pays. The kernel
    path earns that constant back only when per-fragment pre-counting
    collapses shuffle volume the JVM aggregate cannot: hub-salted skew
    (a hub dst's votes pre-merge inside each salted sub-fragment) or
    heavy parallel-edge multiplicity. Default to ``dataframe``; the auto
    hub-salting handles moderate skew there too — reach for ``kernel``
    only on salted power-law graphs where the dataframe two-level
    aggregate's first-level fan-out is itself the bottleneck.

    ``hub_salts`` — hub-skew protection behind the SAME auto detection
    PageRank uses (plans/kernels.py::hub_salt_verdict, reading the
    per-graph memoized degree stats — zero extra jobs after the first
    operator on a graph). When engaged: the dataframe path counts votes
    two-level, per (voter, label, salt-of-dst) then per (voter, label) —
    sum of counts is associative, identical result; the kernel path swaps
    in the salted fragment layout (a hub dst's edges spread over ~salts
    fragments, labels replicated to match — a hub dst is otherwise ONE
    cogroup key and its whole adjacency lands on one task). Verdict at
    ``driver.info["cdlp_hub_salts"]``.
    """
    if impl not in ("dataframe", "kernel"):
        raise ValueError(f"impl must be dataframe|kernel, got {impl!r}")
    if not (hub_salts == "auto" or isinstance(hub_salts, int)):
        raise ValueError(f"hub_salts must be an int or 'auto', got {hub_salts!r}")
    spark = vertices.sparkSession
    drv = driver or IterationDriver(spark)

    with static_plans(spark):
        from libgrape_lite_spark.plans.kernels import (
            cached_degree_stats,
            gather_adjacency_table,
            hub_salt_verdict,
        )

        if hub_salts == "auto":
            # degree stats come from the shared per-graph memo (one
            # aggregate per graph, shared with pagerank); the degree input
            # is layout-invariant, so a plain doubled projection suffices —
            # no pinned layout is forced just for detection
            from libgrape_lite_spark.functions.edges import undirected

            e = edges.select("src", "dst")
            _, max_deg, sum_deg = cached_degree_stats(
                edges, vertices, e if directed else undirected(e), directed
            )
            hub_salts = hub_salt_verdict(
                spark, max_deg, sum_deg, hub_degree_factor, min_hub_degree
            )
        drv.info["cdlp_hub_salts"] = hub_salts

        # keep parallel edges — multiplicity affects the vote
        # (cdlp_utils.h:31-33); gather joins on dst each round, so
        # pre-partition the edge side once — the table is memoized per
        # edge table and SHARED with pagerank_local (identical layout;
        # plans/kernels.py gather_adjacency_table)
        if impl == "kernel":
            from libgrape_lite_spark.plans.kernels import (
                dst_kernel_adjacency_table,
                gather_label_counts,
            )

            nf = num_fragments or int(spark.conf.get("spark.sql.shuffle.partitions"))
            k_salts = max(1, hub_salts)
            adj = dst_kernel_adjacency_table(edges, nf, directed, salts=k_salts)
        else:
            adj = gather_adjacency_table(edges, "dst", directed)

        resumed = drv.latest_checkpoint()
        if resumed is not None:
            state, step = resumed
        else:
            step = 0
            state = drv.materialize(vertices.select("id", F.col("id").alias("label")), step)

        while step < max_rounds:
            t0 = time.time()
            step += 1
            # gather over out-adjacency: vertex u sees labels of its out-nbrs
            if impl == "kernel":
                counts = gather_label_counts(adj, state, "label", nf, salts=k_salts)
            elif hub_salts > 0:
                # two-level vote count: per (voter, label, salt-of-dst)
                # partials first, spreading a hub voter's rows over
                # hub_salts reducers, then the exact per-(voter, label)
                # sum — count is associative, identical result
                counts = (
                    adj.join(state.select(F.col("id").alias("dst"), "label"), "dst")
                    .groupBy(
                        F.col("src").alias("id"),
                        "label",
                        F.pmod(F.hash("dst"), F.lit(hub_salts)).alias("_salt"),
                    )
                    .agg(F.count(F.lit(1)).alias("pc"))
                    .groupBy("id", "label")
                    .agg(F.sum("pc").alias("cnt"))
                )
            else:
                counts = (
                    adj.join(state.select(F.col("id").alias("dst"), "label"), "dst")
                    .groupBy(F.col("src").alias("id"), "label")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                )
            top = counts.groupBy("id").agg(
                F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m")
            ).select("id", (-F.col("m.neg")).alias("new_label"))
            new_state = state.join(top, "id", "left").select(
                "id", F.coalesce("new_label", "label").alias("label")
            )
            state = drv.materialize(new_state, step)
            drv.log(step, -1, time.time() - t0, op="cdlp")

    drv.finish()
    return state.select("id", "label")
