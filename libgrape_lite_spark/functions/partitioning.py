"""Explicit edge partitioning & skew handling (SURVEY.md §4.4, north rule).

The reference offers hash partitioning (``HashPartitioner::GetPartitionId``,
grape/fragment/partitioner.h:39-41), contiguous-range partitioning
(``SegmentedPartitioner``, partitioner.h:144-199) and an edge-count
``Rebalancer`` (grape/fragment/rebalancer.h:28-45). Spark equivalents here:

* ``hash_partition``  — ``pmod(hash(key), n)`` column + repartition;
* ``range_partition`` — ``repartitionByRange`` (the SegmentedPartitioner);
* ``salted_aggregate`` — the hub-vertex fix the reference does NOT have:
  two-level aggregation that splits heavy keys across S salts, partially
  aggregates per (key, salt), then finishes per key. AQE's skew-join
  splitting covers joins; this covers aggregation hot keys deterministically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_partition(df: DataFrame, key: str, n: int) -> DataFrame:
    """HashPartitioner analog: co-locates rows of one vertex."""
    out = df.withColumn("part", F.pmod(F.hash(F.col(key)), F.lit(n)))
    return out.repartition(n, "part")


def range_partition(df: DataFrame, key: str, n: int) -> DataFrame:
    """SegmentedPartitioner analog: contiguous key ranges per partition
    (locality for id-ordered scans; Spark samples range bounds — the
    built-in equivalent of the reference's Rebalancer pass)."""
    return df.repartitionByRange(n, key)


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: Sequence[tuple[str, str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-level (salted) aggregation for skewed keys.

    ``aggs`` = [(col, fn, alias)] with fn ∈ {sum, min, max, count} — the
    decomposable aggregates the reference's message combiners use
    (auto_parallel_message_manager.h:125-144 supports exactly these).

    Level 1 groups by (key, salt) — hub keys spread over ``num_salts``
    reducers; level 2 re-combines per key (count re-combines via sum).
    For most workloads Spark's map-side partial aggregation already does
    this implicitly; explicit salting matters when a single key's partials
    exceed one reducer's memory — the 10^12-turn hub-tool-vertex case.
    """
    salt = F.pmod(F.spark_partition_id() + F.crc32(F.col(key).cast("string")), F.lit(num_salts))
    level1 = []
    level2 = []
    for col, fn, alias in aggs:
        f1 = getattr(F, fn)
        level1.append(f1(col).alias(alias))
        f2 = F.sum if fn in ("sum", "count") else f1
        level2.append(f2(alias).alias(alias))
    return (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*level1)
        .groupBy(key)
        .agg(*level2)
    )


def top_degree_keys(edges: DataFrame, key: str = "dst", threshold: int = 100_000) -> DataFrame:
    """Hub detector: keys whose degree exceeds ``threshold`` — the input to
    a salting decision (the reference's ``--rebalance_vertex_factor`` twin)."""
    return (
        edges.groupBy(key).agg(F.count(F.lit(1)).alias("degree")).where(F.col("degree") > threshold)
    )
