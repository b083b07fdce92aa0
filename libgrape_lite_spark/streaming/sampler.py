"""Streaming GNN neighbor sampler — parity with examples/gnn_sampler/.

The reference consumes Kafka batches of edge updates (``e src dst w``) and
queries (``q v``), appends edges to an append-only fragment, runs a k-hop
sampling app (sampler.h:34-151: per hop, pick up to ``fanout`` neighbors by
random / edge-weight / top-k strategy), and emits result paths to Kafka
(gnn_sampler/README.md "Message format").

Spark-native shape:

* the batch kernel :func:`khop_sample` is a pure DataFrame function —
  queries × edges joins per hop, top-k by deterministic hash order
  (reproducible "random"), weight, or top-weight strategy;
* :func:`stream_khop_sampler` wires it into Structured Streaming via
  ``foreachBatch``: each micro-batch of edge updates is unioned into the
  running edge state (append-only fragment analog) and pending queries are
  answered with the same batch kernel. Kafka in/out is a config swap
  (``format("kafka")``) — tested here with file/memory sources since this
  sandbox has no broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def khop_sample(
    edges: DataFrame,
    queries: DataFrame,
    hops: int = 2,
    fanout: int = 3,
    strategy: str = "hash",
) -> DataFrame:
    """k-hop neighbor sampling.

    ``edges(src, dst, weight)``, ``queries(root)`` →
    (root, hop, src, dst) sampled edges, ≤ fanout per expanded vertex.

    Strategies (sampler.h sampling conditions: Random / EdgeWeight / TopK):
      hash     — deterministic pseudo-random: order by h(root, src, dst)
      topk     — highest edge weight first (ties → smallest dst)
      weighted — weight-proportional sampling without replacement via the
                 exponential-sort trick (Efraimidis-Spirakis): key =
                 -u^(1/w) with u a deterministic hash-uniform in (0,1)
    """
    u = (F.pmod(F.xxhash64("root", "src", "dst"), F.lit(1_000_000_007)) + 1) / 1_000_000_008.0
    order = {
        "hash": [F.xxhash64("root", "src", "dst").asc()],
        "topk": [F.col("weight").desc(), F.col("dst").asc()],
        "weighted": [(-F.pow(u, 1.0 / F.col("weight"))).asc(), F.col("dst").asc()],
    }[strategy]

    frontier = queries.select(F.col("root"), F.col("root").alias("src"))
    out = None
    for hop in range(1, hops + 1):
        cand = frontier.join(edges, "src").select("root", "src", "dst", "weight")
        w = Window.partitionBy("root", "src").orderBy(*order)
        sampled = (
            cand.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= fanout)
            .select("root", F.lit(hop).alias("hop"), "src", "dst")
        )
        out = sampled if out is None else out.unionByName(sampled)
        frontier = sampled.select("root", F.col("dst").alias("src")).distinct()
    return out


def stream_khop_sampler(
    spark,
    edge_stream: DataFrame,
    queries: DataFrame | None,
    sink_path: str,
    checkpoint_path: str,
    hops: int = 2,
    fanout: int = 3,
    initial_edges: DataFrame | None = None,
    compact_every: int = 8,
    trigger: dict | None = None,
):
    """Wire the batch kernel into Structured Streaming with foreachBatch.

    ``edge_stream`` — streaming DataFrame of edge updates (Kafka in
    production: ``readStream.format('kafka')`` + parse). Two schemas:

    * ``(src, dst, weight)`` — pure edge updates; the static ``queries``
      DataFrame is (re-)answered every micro-batch;
    * ``(kind, src, dst, weight)`` — the reference's interleaved Kafka feed
      (kafka_consumer.h:104: ``e src dst w`` and ``q v`` messages on one
      topic): rows with ``kind='e'`` are edge updates, rows with
      ``kind='q'`` are queries (root in ``src``) that arrive mid-stream
      and are answered ONCE, against the graph as of their own batch
      (edges in the same batch apply first — batch-granularity ordering).

    State is the accumulated edge table (append-only fragment analog,
    gnn_sampler AppendOnlyEdgecutFragment); results append to
    ``sink_path`` as parquet (Kafka producer analog).

    State growth is bounded two ways: every batch localCheckpoints the
    union (cuts lineage), and every ``compact_every`` batches the edge
    state is compacted to parquet under ``checkpoint_path`` and re-read —
    so executor-memory block usage stays one table's worth instead of an
    ever-growing union of per-batch blocks, and a restarted job recovers
    the graph from the last compaction instead of replaying the stream:
    on start with ``initial_edges=None`` the newest committed
    ``edge_state_<gen>`` dir (tracked by the ``edge_state_CURRENT``
    marker, written after each compaction commit) is loaded and the
    ping-pong generation resumes from it — the restarted run never
    overwrites the compaction it just recovered from. (The marker is a
    plain file next to the parquet — the seam where an Iceberg catalog
    commit would go in production.)
    """
    import os

    state = {"edges": initial_edges, "since_compact": 0, "gen": 0}
    marker = os.path.join(checkpoint_path, "edge_state_CURRENT")
    if initial_edges is None:
        try:
            with open(marker) as fh:
                g = int(fh.read().strip())
            d = os.path.join(checkpoint_path, f"edge_state_{g}")
            if os.path.exists(os.path.join(d, "_SUCCESS")):
                state["edges"] = spark.read.parquet(d)
                state["gen"] = g
        except (FileNotFoundError, ValueError, OSError):
            pass

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if "kind" in batch_df.columns:
            new_edges = batch_df.where(F.col("kind") == "e").select(
                "src", "dst", "weight"
            )
            batch_queries = batch_df.where(F.col("kind") == "q").select(
                F.col("src").alias("root")
            )
        else:
            new_edges = batch_df.select("src", "dst", "weight")
            batch_queries = None
        acc = state["edges"]
        acc = new_edges if acc is None else acc.unionByName(new_edges)
        state["since_compact"] += 1
        if state["since_compact"] >= compact_every:
            # durable compaction: one parquet table replaces the union
            # tower. Ping-pong between two dirs — the current state's plan
            # may still read the previous compaction, and Spark (rightly)
            # refuses to overwrite a path it is reading from.
            state["gen"] ^= 1
            compact_dir = f"{checkpoint_path}/edge_state_{state['gen']}"
            acc.write.mode("overwrite").parquet(compact_dir)
            acc = spark.read.parquet(compact_dir)
            with open(marker, "w") as fh:  # commit point for restart recovery
                fh.write(str(state["gen"]))
            state["since_compact"] = 0
        else:
            acc = acc.localCheckpoint(eager=True)  # bound lineage across batches
        state["edges"] = acc
        roots = queries
        if batch_queries is not None:
            roots = (
                batch_queries
                if roots is None
                else roots.unionByName(batch_queries)
            )
        if roots is None:
            return
        result = khop_sample(acc, roots, hops=hops, fanout=fanout)
        (
            result.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sink_path)
        )

    # availableNow drains bounded sources (files) then stops — the test
    # default; continuous sources (rate, Kafka) want a processing-time
    # trigger instead: pass e.g. trigger={"processingTime": "2 seconds"}
    return (
        edge_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
