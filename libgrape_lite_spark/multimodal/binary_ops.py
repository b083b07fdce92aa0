"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride as binary columns with a metadata struct
(modality, width/height or sample-rate, codec). The Spark-side plumbing —
schema, partitioning, Arrow batch shape, UDF signatures — is real and
tested; the actual codec work is STUBBED (this container has no
image/audio libraries): ``decode_image_stub`` produces a deterministic
fake pixel tensor derived from the payload bytes, and raises
``NotImplementedError`` when asked for a real codec.

At 100 TB the pattern matters more than the codec: ``mapInPandas`` over
size-bounded Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch``
tuned down for fat rows), binary columns pruned unless selected, and
feature extraction emitting narrow rows so downstream shuffles never carry
the payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_SCHEMA = "modality string, width int, height int, codec string"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload + metadata from a text column —
    the test stand-in for reading real image/audio bytes from object
    storage. Payload = UTF-8 bytes; metadata sized from the byte length."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.length(payload)
    meta = F.struct(
        F.lit("image").alias("modality"),
        (n % 64 + 1).cast("int").alias("width"),
        (n % 48 + 1).cast("int").alias("height"),
        F.lit("fake-rgb8").alias("codec"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: tile payload bytes into (h, w, 3)."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    reps = int(np.ceil(need / max(len(buf), 1)))
    return np.tile(buf, reps)[:need].reshape(height, width, 3)


def decode_image_stub(codec: str) -> None:
    """Real codecs are not available in this environment."""
    raise NotImplementedError(
        f"codec {codec!r}: real image/audio decoding requires Pillow/ffmpeg; "
        "wire the decoder into extract_features()'s kernel when available"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """(id, payload, meta) → (id, mean_r, mean_g, mean_b, n_bytes).

    Arrow-batched mapInPandas kernel; NumPy per batch, no per-row Python.
    The payload column never survives past this operator — downstream
    shuffles carry only narrow feature rows.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if meta["codec"] != "fake-rgb8":
                    decode_image_stub(meta["codec"])
                img = _fake_decode(payload, meta["width"], meta["height"])
                m = img.reshape(-1, 3).mean(axis=0)
                rows.append((did, float(m[0]), float(m[1]), float(m[2]), len(payload)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "mean_r", "mean_g", "mean_b", "n_bytes"]
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(
        kernel,
        schema="doc_id long, mean_r double, mean_g double, mean_b double, n_bytes long",
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the binary payload: one row per sampled offset
    (id, frame_idx, byte) — the video-frame-sampling plumbing pattern
    (explode to frames, process, aggregate) with a byte stand-in."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                sampled = payload[::every_n_bytes]
                for i, b in enumerate(sampled):
                    ids.append(did)
                    idxs.append(i)
                    vals.append(int(b))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "byte": vals})

    return df.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, frame_idx int, byte int"
    )
