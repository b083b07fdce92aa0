"""Loaders for the reference's LDBC-style ``.v`` / ``.e`` TSV graph files.

Parity with ``grape/io/tsv_line_parser.h:35-74`` (whitespace-separated
columns, first 2-3 used) and ``grape/fragment/ev_fragment_loader.h:110-111,
156-157`` (lines starting with ``#`` are comments). The reference splits the
edge file by byte ranges per worker (``SetPartialRead``); Spark's file-source
split does the same thing natively — no custom code needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


def _read_tsv(spark: SparkSession, path: str) -> DataFrame:
    # The reference format is space- or tab-separated with a variable number
    # of trailing columns; split on arbitrary whitespace.
    lines = spark.read.text(path)
    return (
        lines.where(~F.col("value").startswith("#"))
        .where(F.length(F.trim(F.col("value"))) > 0)
        .select(F.split(F.trim(F.col("value")), r"\s+").alias("cols"))
    )


def load_vertex_tsv(spark: SparkSession, vfile: str) -> DataFrame:
    """``vertex_id [vdata]`` → DataFrame(oid: long, vdata: string|null)."""
    return _read_tsv(spark, vfile).select(
        F.col("cols")[0].cast(LongType()).alias("oid"),
        F.col("cols")[1].alias("vdata"),
    )


def load_edge_tsv(spark: SparkSession, efile: str, weighted: bool = True) -> DataFrame:
    """``src dst [weight]`` → DataFrame(src: long, dst: long, weight: double).

    Missing weight defaults to 1.0 (the reference instantiates
    ``edata_t=EmptyType`` for unweighted apps — run_app.h:216-263 — which we
    model as a constant weight).
    """
    df = _read_tsv(spark, efile).select(
        F.col("cols")[0].cast(LongType()).alias("src"),
        F.col("cols")[1].cast(LongType()).alias("dst"),
        (
            F.col("cols")[2].cast(DoubleType()) if weighted else F.lit(None).cast(DoubleType())
        ).alias("weight"),
    )
    return df.withColumn("weight", F.coalesce(F.col("weight"), F.lit(1.0)))


def load_graph_tsv(
    spark: SparkSession, efile: str, vfile: str, weighted: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Returns (vertices, edges) like ``LoadGraph`` (grape/fragment/loader.h:46)."""
    return load_vertex_tsv(spark, vfile), load_edge_tsv(spark, efile, weighted)


def load_mutable_graph_tsv(
    spark: SparkSession, base_efile: str, delta_efile: str, vfile: str
) -> tuple[DataFrame, DataFrame]:
    """Base + delta edge files → final graph, mirroring ``LoadGraphAndMutate``
    (grape/fragment/loader.h:59-68) / ``EVFragmentMutator``.

    Delta line formats (dataset/p2p-31.e.mutable_delta):
      ``a src dst w`` add edge, ``d src dst`` delete edge,
      ``u src dst w`` update weight.
    Expressed as DataFrame set-algebra (the Spark-native equivalent of an
    Iceberg ``MERGE INTO`` on the edge table).
    """
    vertices = load_vertex_tsv(spark, vfile)
    base = load_edge_tsv(spark, base_efile, weighted=True)

    delta = _read_tsv(spark, delta_efile).select(
        F.col("cols")[0].alias("op"),
        F.col("cols")[1].cast(LongType()).alias("src"),
        F.col("cols")[2].cast(LongType()).alias("dst"),
        F.col("cols")[3].cast(DoubleType()).alias("weight"),
    )
    dels = delta.where(F.col("op").isin("d", "u")).select("src", "dst")
    adds = delta.where(F.col("op").isin("a", "u")).select(
        "src", "dst", F.coalesce("weight", F.lit(1.0)).alias("weight")
    )
    edges = base.join(dels, ["src", "dst"], "left_anti").unionByName(adds)
    return vertices, edges
