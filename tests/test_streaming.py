"""Structured-Streaming parity: the GNN k-hop sampler over a stream of
edge updates (reference examples/gnn_sampler; Kafka swapped for a file
source in this sandbox — the foreachBatch kernel is identical)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_khop_sample_batch_kernel(spark):
    from libgrape_lite_spark.streaming import khop_sample

    edges = spark.createDataFrame(
        [(0, i, float(i)) for i in range(1, 6)] + [(1, 10, 1.0), (2, 20, 1.0)],
        "src long, dst long, weight double",
    )
    queries = spark.createDataFrame([(0,)], "root long")
    out = khop_sample(edges, queries, hops=2, fanout=3, strategy="topk")
    rows = out.collect()
    hop1 = {r["dst"] for r in rows if r["hop"] == 1}
    assert hop1 == {5, 4, 3}  # top-3 by weight
    hop2 = {r["dst"] for r in rows if r["hop"] == 2}
    assert hop2 == set()  # sampled hop-1 vertices {3,4,5} have no out-edges

    out_hash = khop_sample(edges, queries, hops=2, fanout=3, strategy="hash")
    a = sorted((r["hop"], r["src"], r["dst"]) for r in out_hash.collect())
    b = sorted((r["hop"], r["src"], r["dst"]) for r in out_hash.collect())
    assert a == b  # deterministic pseudo-random sampling

    out_w = khop_sample(edges, queries, hops=1, fanout=3, strategy="weighted")
    rows_w = out_w.collect()
    assert len(rows_w) == 3 and len({r["dst"] for r in rows_w}) == 3
    again = sorted((r["src"], r["dst"]) for r in out_w.collect())
    assert again == sorted((r["src"], r["dst"]) for r in rows_w)  # deterministic


def test_stream_khop_sampler_foreachbatch(spark, tmp_path):
    from libgrape_lite_spark.streaming import stream_khop_sampler

    src_dir = tmp_path / "edge_updates"
    src_dir.mkdir()
    spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / "batch0"))

    stream = spark.readStream.schema("src long, dst long, weight double").parquet(
        str(src_dir / "*")
    )
    queries = spark.createDataFrame([(0,)], "root long")
    sink = str(tmp_path / "paths")
    q = stream_khop_sampler(
        spark,
        stream,
        queries,
        sink_path=sink,
        checkpoint_path=str(tmp_path / "sck"),
        hops=2,
        fanout=2,
    )
    q.awaitTermination(120)
    got = sorted(
        (r["root"], r["hop"], r["src"], r["dst"]) for r in spark.read.parquet(sink).collect()
    )
    assert got == [(0, 1, 0, 1), (0, 2, 1, 2)]
