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
3. broadcast the cumulative offsets into an Arrow-batched kernel that
   assigns ``id = offset[partition] + local_position``.

This mirrors the reference's fid-partitioned id space (id_parser.h packs
fid‖lid; we keep plain longs, SURVEY.md §1.4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

VERTEX_SCHEMA = StructType(
    [StructField("id", LongType(), False), StructField("oid", StringType(), False)]
)


def encode_vertices(oids: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """DataFrame with column ``oid`` → dictionary DataFrame(id, oid),
    ids dense 0..N-1 in oid order. Distributed (no single-partition window).
    """
    spark = oids.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    sorted_oids = (
        oids.select("oid").distinct().repartitionByRange(n, "oid").sortWithinPartitions("oid")
    )
    sorted_oids = sorted_oids.cache()
    # tiny collect: one row per partition
    counts = (
        sorted_oids.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    count_by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(count_by_pid, default=-1) + 1):
        offsets[pid] = acc
        acc += count_by_pid.get(pid, 0)

    def assign(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        pos = 0
        for pdf in iterator:
            ids = pd.RangeIndex(base + pos, base + pos + len(pdf)).to_numpy()
            pos += len(pdf)
            yield pd.DataFrame({"id": ids, "oid": pdf["oid"].to_numpy()})

    out = sorted_oids.mapInPandas(assign, schema=VERTEX_SCHEMA)
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
