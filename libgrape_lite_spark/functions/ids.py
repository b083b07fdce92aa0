"""Vertex-id densification: string oid → dense long id.

The reference does this with a per-worker hashmap + ring exchange
(``grape/graph/id_indexer.h:135``, ``grape/vertex_map/global_vertex_map.h:
69-103``). Spark-native equivalent: a dictionary DataFrame.

The assignment is **order-preserving** (id order == oid lexicographic
order) so min-id semantics (WCC component = min vertex, CDLP tie → smallest
label) are stable across the string/dense representations.

Scale note: a naive ``row_number().over(Window.orderBy('oid'))`` collapses
to ONE partition — a driver-killer at 10^12 rows. Instead we do a
distributed order-preserving zip-with-index:

1. ``repartitionByRange('oid')`` + ``sortWithinPartitions`` (range shuffle,
   fully parallel — same machinery as a distributed sort),
2. collect only the tiny per-partition row counts,
3. broadcast-join the cumulative offsets and assign
   ``id = offset[partition] + (row_number over partition-id) - 1`` — a
   JVM window whose groups are the individual sorted partitions (never a
   single global partition).

This mirrors the reference's fid-partitioned id space (id_parser.h packs
fid‖lid; we keep plain longs, SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

VERTEX_SCHEMA = StructType(
    [StructField("id", LongType(), False), StructField("oid", StringType(), False)]
)


def encode_vertices(oids: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """DataFrame with column ``oid`` → dictionary DataFrame(id, oid),
    ids dense 0..N-1 in oid order. Distributed (no single-partition window).

    The per-partition position is assigned with a JVM window partitioned
    by the range-partition id (each window group is one sorted partition,
    so the sort inside the window is over already-ordered data), plus a
    broadcast join against the tiny per-partition offset table. This
    replaced the r1-r7 ``mapInPandas`` assignment (identical ids): the
    graph build is the first job of a session, and the Python pass made it
    pay the whole executor Python-worker pool spin-up + an O(V) JVM→Python
    →JVM round trip that a window over ≤ a-partition-per-group does not
    (guide §4.1: prefer built-ins; measured r8 in OPTIMIZATION_r08.md).
    """
    spark = oids.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    sorted_oids = (
        oids.select("oid").distinct().repartitionByRange(n, "oid").sortWithinPartitions("oid")
    )
    # cached: the counts pass and the assignment pass must see identical
    # partitions; registered as a transient so oracle/bench sessions
    # release the O(V) cache once the dictionary is consumed (pre-r8 it
    # stayed pinned for the session)
    from libgrape_lite_spark import transients

    sorted_oids = transients.register(sorted_oids.cache())
    # tiny collect: one row per partition
    counts = (
        sorted_oids.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    count_by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: list[tuple[int, int]] = []
    acc = 0
    for pid in range(max(count_by_pid, default=-1) + 1):
        offsets.append((pid, acc))
        acc += count_by_pid.get(pid, 0)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, off long")

    from pyspark.sql.window import Window

    w = Window.partitionBy("pid").orderBy("oid")
    out = (
        sorted_oids.withColumn("pid", F.spark_partition_id())
        .join(F.broadcast(off_df), "pid")
        .select(
            (F.row_number().over(w) - 1 + F.col("off")).alias("id"),
            "oid",
        )
    )
    return out


def encode_edges(
    edges_oid: DataFrame, vertices: DataFrame, broadcast_dict: bool = True
) -> DataFrame:
    """edges(src_oid, dst_oid, weight, ...) × dict(id, oid) → edges(src, dst, ...).

    Two hash joins on the dictionary — the Spark analog of the reference's
    oid→gid translation pass (basic_fragment_loader.h:199-267).

    ``broadcast_dict=True`` mirrors ``GlobalVertexMap`` (every worker holds
    the full map, global_vertex_map.h:69-103) — right when the dictionary
    fits in executor memory. At 10^12-vertex scale pass ``False`` for plain
    shuffle joins, the ``LocalVertexMap`` analog (local_vertex_map.h:126).
    """
    maybe_b = F.broadcast if broadcast_dict else (lambda df: df)
    src_dict = maybe_b(vertices.select(F.col("oid").alias("src_oid"), F.col("id").alias("src")))
    dst_dict = maybe_b(vertices.select(F.col("oid").alias("dst_oid"), F.col("id").alias("dst")))
    extra = [c for c in edges_oid.columns if c not in ("src_oid", "dst_oid")]
    return (
        edges_oid.join(src_dict, "src_oid")
        .join(dst_dict, "dst_oid")
        .select("src", "dst", *extra)
    )
