"""Deterministic synthetic transcripts table (BASELINE.json ``input_hint``).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string|null, ts timestamp). Generation is *distributed*: one task
generates a contiguous range of conversations, seeded per-conversation, so
the output is byte-identical regardless of parallelism or partitioning —
the property the reference gets from deterministic file parsing and that we
need for the local[8]-vs-local[32] scaling benchmark (same seed ⇒ same input).

Per FIXTURES.md §1: conversation length ``L ~ 2 + Zipf(a=2.1)`` capped at 64,
roles alternate user/assistant with ~10% tool turns after an assistant turn,
tool names drawn from a 20-name Zipf-skewed vocabulary (intentional hub
vertices), ``text = f"{conv_id}:{turn_idx}:{role}:" + stable hash suffix``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

_TOOLS = [f"tool_{i:02d}" for i in range(20)]
_EPOCH = np.datetime64("2026-01-01T00:00:00")


def _gen_conversation(conv_idx: int, seed: int):
    """One conversation's rows as plain lists (cheap; no per-conv pandas).

    Per-conversation seeding makes output independent of batching and
    partitioning; the call sequence (zipf, random, zipf, integers) is the
    determinism contract — do not reorder."""
    rng = np.random.default_rng((seed, conv_idx))
    conv_id = f"conv_{conv_idx:06d}"
    length = int(min(2 + rng.zipf(2.1), 64))
    roles: list[str] = []
    tools: list[str | None] = []
    role_cycle = ("user", "assistant")
    i = 0
    while len(roles) < length:
        role = role_cycle[i % 2]
        roles.append(role)
        tools.append(None)
        i += 1
        # ~10% of assistant turns are followed by a tool turn (FIXTURES.md §1)
        if role == "assistant" and len(roles) < length and rng.random() < 0.10:
            roles.append("tool")
            # Zipf-skewed tool choice → deliberate hub vertices
            tools.append(_TOOLS[int(min(rng.zipf(1.5), 20) - 1)])
    n = len(roles)
    suffix = rng.integers(0, 2**63 - 1, size=n)
    texts = [f"{conv_id}:{t}:{r}:{s:016x}" for t, (r, s) in enumerate(zip(roles, suffix))]
    return conv_id, n, roles, tools, texts


def synthesize_transcripts(
    spark: SparkSession, n_conversations: int = 200, seed: int = 42
) -> DataFrame:
    """Distributed deterministic generator — scale-parameterized upward.

    Uses ``spark.range`` + ``mapInPandas`` (Arrow-batched, no per-row
    Python); per-conversation seeding makes output independent of the
    partitioning, so sf can grow to billions of turns without a driver
    bottleneck.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            conv_ids: list[str] = []
            turn_idx: list[np.ndarray] = []
            roles: list[str] = []
            tools: list[str | None] = []
            texts: list[str] = []
            conv_nums: list[np.ndarray] = []
            for c in pdf["id"]:
                cid, n, r, tl, tx = _gen_conversation(int(c), seed)
                conv_ids.extend([cid] * n)
                turn_idx.append(np.arange(n, dtype=np.int32))
                roles.extend(r)
                tools.extend(tl)
                texts.extend(tx)
                conv_nums.append(np.full(n, int(c), dtype=np.int64))
            if not conv_ids:
                continue
            ti = np.concatenate(turn_idx)
            cn = np.concatenate(conv_nums)
            ts = _EPOCH + np.timedelta64(1, "s") * (cn * 1000 + ti.astype("int64"))
            yield pd.DataFrame(
                {
                    "conv_id": conv_ids,
                    "turn_idx": ti,
                    "role": roles,
                    "text": texts,
                    "tool": pd.array(tools, dtype="string"),
                    "ts": ts,
                }
            )

    n_parts = max(1, min(n_conversations // 64 + 1, 256))
    return (
        spark.range(n_conversations, numPartitions=n_parts)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )
