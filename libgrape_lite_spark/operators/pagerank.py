"""PageRank — LDBC formulation, exact semantics of the reference app.

Reference (examples/analytical_apps/pagerank/pagerank.h:52-219 +
pagerank_context.h:30-92), replicated step for step:

* ``p = 1/|V|``; iterating state stores rank ÷ out-degree:
  ``r0[u] = outdeg(u) > 0 ? p/outdeg : p`` (pagerank.h:70-81).
* ``dangling_sum = p * #dangling`` (pagerank.h:83-88).
* each of ``max_round`` rounds (pagerank.h:107-109, 159-195):
    base          = (1-d)/|V| + d * dangling_sum / |V|
    dangling_sum' = base * #dangling
    gathered[u]   = Σ_{(v,u) ∈ E} r[v]         # receive from IN-neighbors
    r'[u]         = outdeg > 0 ? (d*gathered + base)/outdeg : base
* after the last round multiply back ``r[u] *= outdeg(u)`` for
  non-dangling vertices (pagerank.h:202-214).

Direction note: rank flows ALONG edge direction — u receives Σ r[v] from
its in-neighbors and divides by its own out-degree (classic LDBC PR; the
golden p2p-31-PR-directed validates exactly this combination — verified
against a NumPy oracle over all four gather/degree direction pairings).
On the undirected doubled table in-adjacency == out-adjacency, so the
reference's adjacency-scan formulation coincides.

Stop rules: fixed ``max_rounds`` (LDBC/golden parity, default 10 =
``--pr_mr``) AND optional ``tol`` — stop early when max|Δ(final-scale
rank)| < tol (the north rule's 1e-6 convergence criterion), whichever
first.

Spark plan per superstep: one join (edges ⋈ ranks on dst) + one shuffle
groupBy(src).sum — map-side partial sums are the analog of the reference's
per-fragment combine. ``base``/``dangling_sum`` are driver scalars like the
reference's ``Sum()`` AllReduce (communicator.h:99-113). The degree column
rides inside the state DataFrame so no extra join per round.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libgrape_lite_spark.functions.edges import undirected
from libgrape_lite_spark.plans.kernels import graph_op
from libgrape_lite_spark.plans.superstep import IterationDriver
from libgrape_lite_spark.session import static_plans


@graph_op
def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    max_rounds: int = 10,
    directed: bool = False,
    tol: float | None = None,
    driver: IterationDriver | None = None,
    impl: str = "dataframe",
    num_fragments: int | None = None,
    hub_salts: int | str = "auto",
    hub_degree_factor: float = 8.0,
    min_hub_degree: int = 1_000_000,
) -> DataFrame:
    """Returns DataFrame(id: long, rank: double).

    ``impl``:
      * ``"dataframe"`` — pure join + groupBy supersteps (Catalyst picks
        broadcast vs shuffled join; best when state broadcasts).
      * ``"kernel"`` — per-fragment Arrow gather-scatter over
        hash-co-partitioned edge blocks (plans/kernels.py): NumPy
        ``searchsorted`` lookup + ``bincount`` pre-combine per fragment,
        shuffle only per-fragment partial sums — the CSR-fragment path of
        the reference (SURVEY.md §4.5), best when state exceeds the
        broadcast threshold.

    ``hub_salts`` — two-level salted gather (SURVEY.md §4.4, the skew
    fix the reference's Rebalancer approximates): contributions are first
    summed per (dst, salt) where salt spreads each destination's incoming
    mass over ``hub_salts`` reducers, then per dst. Protects the combine
    against hub vertices whose in-degree exceeds one reducer's capacity;
    identical results (sum is associative), one extra vertex-sized shuffle.

    ``hub_salts="auto"`` (default) decides from the degree table the
    operator builds anyway (zero extra passes): salting engages — with
    ``shuffle.partitions`` salts — when the max degree exceeds BOTH
    ``hub_degree_factor``× the mean per-partition edge share (relative
    skew: one vertex out-weighs whole fragments) and ``min_hub_degree``
    (absolute floor: below ~10^6 messages per hub, map-side partial
    aggregation alone absorbs the skew and the extra shuffle would only
    cost). Detection reads the out-degree column, which on the doubled
    undirected table IS the in-degree the gather aggregates over; directed
    callers with known in-degree hubs should pass an explicit int. The
    verdict is observable at ``driver.info["pagerank_hub_salts"]``.
    """
    if impl not in ("dataframe", "kernel"):
        raise ValueError(f"impl must be dataframe|kernel, got {impl!r}")
    if not (hub_salts == "auto" or isinstance(hub_salts, int)):
        raise ValueError(f"hub_salts must be an int or 'auto', got {hub_salts!r}")
    spark = vertices.sparkSession
    drv = driver or IterationDriver(spark)

    with static_plans(spark):
        from libgrape_lite_spark.plans.kernels import cached_degree_table, cached_prepared

        if impl == "kernel":
            from libgrape_lite_spark.plans.kernels import gather_scatter, partition_edges

            nf = num_fragments or int(spark.conf.get("spark.sql.shuffle.partitions"))

            def _build_kernel_adj() -> DataFrame:
                a = (
                    edges.select("src", "dst")
                    if directed
                    else undirected(edges.select("src", "dst"))
                )
                return partition_edges(a, nf).localCheckpoint(eager=True)

            adj = cached_prepared(edges, ("pr_kernel", nf, directed), _build_kernel_adj)
        else:
            # pre-partition by the gather join key once — shared across
            # pagerank calls on this edge table (fixed-round + convergence
            # runs build it once); supersteps then shuffle only
            # vertex-sized data (state join + groupBy combine). Layout +
            # serialized-storage rationale: plans/kernels.py
            # gather_adjacency_table.
            from libgrape_lite_spark.plans.kernels import gather_adjacency_table

            adj = gather_adjacency_table(edges, "src", directed)

        n = vertices.count()
        p = 1.0 / n
        d = damping

        # counts parallel edges (GetLocalOutDegree); memoized per graph
        deg = cached_degree_table(edges, vertices, adj, directed)
        state = deg.select(
            "id",
            "degree",
            F.when(F.col("degree") > 0, p / F.col("degree")).otherwise(p).alias("r"),
        )
        step = 0
        resumed = drv.latest_checkpoint()
        if resumed is not None:
            state, step = resumed
        else:
            state = drv.materialize(state, step)
        # one aggregate pass PER GRAPH (memoized) yields the dangling count
        # AND the degree stats the auto hub-salt decision needs
        from libgrape_lite_spark.plans.kernels import cached_degree_stats, hub_salt_verdict

        n_dangling, max_deg, sum_deg = cached_degree_stats(
            edges, vertices, adj, directed
        )
        if hub_salts == "auto":
            hub_salts = hub_salt_verdict(
                spark, max_deg, sum_deg, hub_degree_factor, min_hub_degree
            )
        drv.info["pagerank_hub_salts"] = hub_salts
        dangling_sum = p * n_dangling
        # replay the driver-side scalar recurrence up to the resumed superstep
        for _ in range(step):
            base = (1.0 - d) / n + d * dangling_sum / n
            dangling_sum = base * n_dangling

        while step < max_rounds:
            t0 = time.time()
            step += 1
            base = (1.0 - d) / n + d * dangling_sum / n
            dangling_sum = base * n_dangling

            if impl == "kernel":
                gathered = gather_scatter(adj, state, "r", nf, reduce_fn="sum")
            elif hub_salts > 0:
                contrib = adj.join(
                    state.select(F.col("id").alias("src"), "r"), "src"
                ).select(
                    F.col("dst").alias("id"),
                    "r",
                    F.pmod(F.hash("src"), F.lit(hub_salts)).alias("_salt"),
                )
                gathered = (
                    contrib.groupBy("id", "_salt")
                    .agg(F.sum("r").alias("partial"))
                    .groupBy("id")
                    .agg(F.sum("partial").alias("gathered"))
                )
            else:
                gathered = (
                    adj.join(
                        state.select(F.col("id").alias("src"), "r"), "src"
                    )
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.sum("r").alias("gathered"))
                )
            new_r = (
                F.when(
                    F.col("degree") > 0,
                    (d * F.coalesce("gathered", F.lit(0.0)) + base) / F.col("degree"),
                )
                .otherwise(base)
                .alias("r")
            )
            # prev_r only materialized when the convergence stop rule needs it —
            # it widens every superstep's checkpointed state by 25% otherwise
            prev_cols = [F.col("r").alias("prev_r")] if tol is not None else []
            new_state = (
                state.select("id", "degree", *prev_cols)
                .join(gathered, "id", "left")
                .select("id", "degree", new_r, *(["prev_r"] if tol is not None else []))
            )
            if tol is not None:
                # convergence on final-scale ranks: |Δ(r*deg)| for non-dangling,
                # |Δr| for dangling (degree multiplier applied at output).
                # The max-delta scalar rides the materializing job
                # (observe) instead of a second per-round collect job.
                scale = F.when(F.col("degree") > 0, F.col("degree")).otherwise(F.lit(1.0))
                state, m = drv.materialize_observed(
                    new_state, step,
                    F.max(F.abs((F.col("r") - F.col("prev_r")) * scale)).alias("md"),
                )
                max_delta = m["md"]
                drv.log(step, n, time.time() - t0, op="pagerank", max_delta=max_delta)
                if max_delta is not None and max_delta < tol:
                    break
            else:
                state = drv.materialize(new_state, step)
                drv.log(step, n, time.time() - t0, op="pagerank")

    drv.finish()
    # multiply back by degree for non-dangling (pagerank.h:202-214)
    return state.select(
        "id",
        F.when(F.col("degree") > 0, F.col("r") * F.col("degree"))
        .otherwise(F.col("r"))
        .alias("rank"),
    )


@graph_op
def pagerank_local(
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    max_rounds: int = 10,
    directed: bool = False,
    driver: IterationDriver | None = None,
) -> DataFrame:
    """PageRankLocal parity — the GeminiGraph-style alternative formulation
    the reference ships for cross-system comparison
    (examples/analytical_apps/pagerank/pagerank_local.h:48-220):

    * ``r0[u] = outdeg(u) > 0 ? 1/outdeg(u) : 1.0`` (pagerank_local.h:57-60)
      — NOT 1/|V|-scaled, and no dangling-mass redistribution;
    * each round gathers over the vertex's OUT-adjacency
      (``GetOutgoingAdjList``, pagerank_local.h:85-99):
      ``nxt[u] = 1 - d + d · Σ_{(u,w) ∈ E} r[w]``;
    * every round except the last divides by the local out-degree
      (pagerank_local.h:199-206); the last round keeps the unscaled value
      (the analog of the LDBC app's multiply-back).

    Returns DataFrame(id, rank) after exactly ``max_rounds`` rounds.

    Spark plan per round: adjacency pre-partitioned ONCE by ``dst`` (the
    gather join key here — state attaches to the edge's head), one
    vertex-sized shuffle for the groupBy(src) sum.
    """
    spark = vertices.sparkSession
    drv = driver or IterationDriver(spark)

    with static_plans(spark):
        from libgrape_lite_spark.plans.kernels import (
            cached_degree_table,
            gather_adjacency_table,
        )

        # same layout CDLP gathers over — one shared cache entry
        adj = gather_adjacency_table(edges, "dst", directed)
        # parallel edges count (GetLocalOutDegree); memoized per graph —
        # degree is layout-invariant, so this shares pagerank's entry
        deg = cached_degree_table(edges, vertices, adj, directed)
        d = damping
        state = deg.select(
            "id",
            "degree",
            F.when(F.col("degree") > 0, 1.0 / F.col("degree")).otherwise(1.0).alias("r"),
        )
        step = 0
        resumed = drv.latest_checkpoint()
        if resumed is not None:
            state, step = resumed
        else:
            state = drv.materialize(state, step)

        while step < max_rounds:
            t0 = time.time()
            step += 1
            last = step == max_rounds
            gathered = (
                adj.join(state.select(F.col("id").alias("dst"), "r"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("r").alias("g"))
            )
            nxt = F.lit(1.0) - d + d * F.coalesce("g", F.lit(0.0))
            if not last:
                nxt = F.when(F.col("degree") > 0, nxt / F.col("degree")).otherwise(nxt)
            new_state = (
                state.select("id", "degree")
                .join(gathered, "id", "left")
                .select("id", "degree", nxt.alias("r"))
            )
            state = drv.materialize(new_state, step)
            drv.log(step, 0, time.time() - t0, op="pagerank_local")

    drv.finish()
    return state.select("id", F.col("r").alias("rank"))


def pagerank_auto(
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    max_rounds: int = 10,
    directed: bool = False,
    **kwargs,
) -> DataFrame:
    """PageRankAuto parity (pagerank_auto.h:47-121): the auto-parallel
    rendition of the SAME fixpoint as the LDBC app — identical init
    (p/outdeg, dangling p), identical round
    (``base = (1-d)/|V| + d·dangling/|V|``; pull over the incoming
    adjacency; divide by out-degree), identical multiply-back after the
    final round (verified line-by-line against pagerank_auto.h IncEval).
    The reference variants differ only in MESSAGING machinery (auto sync
    buffers vs explicit batch shuffle), which Spark's shuffle subsumes —
    so this delegates to :func:`pagerank` and exists for API parity."""
    return pagerank(
        vertices, edges, damping=damping, max_rounds=max_rounds,
        directed=directed, **kwargs,
    )


def pagerank_parallel(vertices: DataFrame, edges: DataFrame, **kwargs) -> DataFrame:
    """PageRankParallel parity (pagerank_parallel.h:63-204): same fixpoint
    as the LDBC app — same init, round recurrence (base/dangling scalars,
    pull over incoming adjacency, divide by out-degree) and multiply-back —
    differing only in intra-fragment threading (``ForEach`` over vertex
    chunks) and message batching, both of which Spark's task parallelism
    and shuffle subsume. Delegates to :func:`pagerank`; exists so every
    reference app name resolves."""
    return pagerank(vertices, edges, **kwargs)


def pagerank_local_parallel(
    vertices: DataFrame, edges: DataFrame, **kwargs
) -> DataFrame:
    """PageRankLocalParallel parity (pagerank_local_parallel.h:57-214):
    the GeminiGraph ``1-d+d·Σ`` formulation of :func:`pagerank_local` with
    the reference's thread-parallel messaging machinery, which Spark
    subsumes. Delegates to :func:`pagerank_local`; exists for API parity."""
    return pagerank_local(vertices, edges, **kwargs)
