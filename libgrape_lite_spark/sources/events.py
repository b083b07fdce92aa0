"""Adapter: the test-harness ``events`` table → the transcripts shape.

The engine's contract input is an Iceberg table of conversation transcripts
(conv_id, turn_idx, role, text, tool, ts). The driver's correctness gate only
exposes TPC-H-ish parquet, so we deterministically re-shape ``events``
(event_id, ts, user_id, event_type, value, props) into that exact schema:

* conv_id  = 'conv_' || user_id          (a user's event stream = a conversation)
* turn_idx = row_number over (user_id order by ts, event_id) - 1
* role     = event_type
* text     = props
* tool     = 'tool::' || event_type when value >= 10 else NULL
  (deterministic numeric predicate → Zipf-ish hub vertices)

This mapping is intentionally expressible in ANSI SQL so the DuckDB oracle
can reproduce it bit-for-bit (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def events_to_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Also carries ``prev_idx``/``prev_role`` lag columns computed in the
    SAME window pass as ``turn_idx`` (one exchange + sort total): the edge
    derivation needs lag over (conv_id, turn_idx), and within a user the
    (ts, event_id) order IS the turn_idx order, so the lags coincide —
    computing them here saves the derivation's second full exchange+sort
    over the transcript table (r8, guide §2.4; consumers that only want
    the transcript shape simply don't select them)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    turn_idx = (F.row_number().over(w) - 1).cast("int")
    return ev.select(
        F.concat(F.lit("conv_"), F.col("user_id").cast("string")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("value") >= 10.0, F.col("event_type")).alias("tool"),
        F.col("ts"),
        # turn_idx is row_number-1, dense per conversation, so the lagged
        # index is exactly turn_idx-1 (no nested window needed)
        F.when(turn_idx > 0, turn_idx - 1).cast("int").alias("prev_idx"),
        F.lag("event_type").over(w).alias("prev_role"),
    )
