"""Iceberg table IO with parquet fallback.

The production deployment (north rule) reads transcripts from and writes
state/results to Apache Iceberg tables; this sandbox has no Iceberg runtime
jar, so every call degrades gracefully to parquet paths with the same
layout. The switch is purely configuration:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=glue|hive|hadoop ...

and table identifiers like ``lake.db.transcripts`` route through the
catalog. Iceberg gives the engine: snapshot-isolated superstep checkpoints
(replacing the parquet ``_SUCCESS`` protocol in plans/superstep.py),
``MERGE INTO`` for the mutable-graph delta path (sources/tsv.py
load_mutable_graph_tsv is the DataFrame equivalent), and partition pruning
on (conv_id-bucket, ts-day) for the 10^12-turn source scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """``identifier`` = catalog table name (``lake.db.transcripts``) or a
    filesystem path (parquet fallback)."""
    if "/" not in identifier and iceberg_available(spark):
        return spark.read.table(identifier)
    return spark.read.parquet(identifier)


def write_table(df: DataFrame, identifier: str, mode: str = "overwrite") -> None:
    if "/" not in identifier and iceberg_available(df.sparkSession):
        df.writeTo(identifier).createOrReplace() if mode == "overwrite" else df.writeTo(
            identifier
        ).append()
        return
    df.write.mode(mode).parquet(identifier)
