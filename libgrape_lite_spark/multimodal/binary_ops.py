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


def extract_features(df: DataFrame, tiled_bytes_cap: int = 8 << 20) -> DataFrame:
    """(id, payload, meta) → (id, mean_r, mean_g, mean_b, n_bytes).

    Arrow-batched mapInPandas kernel; NumPy per sub-batch, no per-row
    Python. The payload column never survives past this operator —
    downstream shuffles carry only narrow feature rows.

    ``tiled_bytes_cap``: transient memory is ~26× the tiled (decoded) byte
    count — three int64 index arrays plus the float64 bincount input — so
    each Arrow batch is processed in sub-batches tiling at most this many
    bytes (~220 MB transient at the default), bounding executor memory
    regardless of Arrow batch size or payload fatness (an uncapped 10k-row
    batch of 1 MB images would otherwise need ~0.8 TB). A single row whose
    decoded size exceeds the cap is itself processed in cap-sized slices
    of its tiled index space, accumulating per-channel sums — so the bound
    holds even for one pathologically fat payload (ADVICE r3).
    """

    def _oversized_row_means(buf: np.ndarray, need: int, cap: int) -> np.ndarray:
        """Per-channel byte sums of one row's tiled stream, sliced so each
        slice covers ≤ cap tiled byte positions (sequential slices, O(3)
        carry). Like the chunk path, each slice's transient arrays are ~26×
        its tiled byte count (three int64 index arrays + the float64
        bincount weights), so the effective bound is ~26× cap — the same
        multiplier the batch splitter's cap is sized against, NOT cap raw
        bytes (ADVICE r4)."""
        length = len(buf)
        sums = np.zeros(3, dtype=np.float64)
        step = max(int(cap), 3)
        for s in range(0, need, step):
            j = np.arange(s, min(s + step, need))
            sums += np.bincount(j % 3, weights=buf[j % length], minlength=3)
        return sums

    def _chunk_means(payloads, widths, heights, lens, need) -> np.ndarray:
        """Vectorized channel means for one bounded chunk of rows."""
        n = len(lens)
        # batch-flat buffer (one C-level join), then pure index math:
        # row i's tiled byte j is flat[flat_start_i + (j mod len_i)]
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        flat_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        tiled_starts = np.concatenate([[0], np.cumsum(need)[:-1]])
        row = np.repeat(np.arange(n), need)
        j = np.arange(int(need.sum())) - tiled_starts[row]
        tiled = flat[flat_starts[row] + (j % lens[row])]
        # one bincount for all (row, channel) cells
        code = row * 3 + (j % 3)
        sums = np.bincount(code, weights=tiled, minlength=3 * n).reshape(n, 3)
        return sums / (widths * heights)[:, None]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            codecs = pdf["meta"].map(lambda m: m["codec"])
            bad = codecs[codecs != "fake-rgb8"]
            if len(bad):
                decode_image_stub(bad.iloc[0])
            # the fake decode tiles payload bytes to w*h*3, so channel
            # means are means over byte positions ≡ c mod 3 of the tiled
            # stream — segment-reduced per bounded sub-batch
            n = len(pdf)
            widths = pdf["meta"].map(lambda m: m["width"]).to_numpy(np.int64)
            heights = pdf["meta"].map(lambda m: m["height"]).to_numpy(np.int64)
            # empty payloads decode as a single zero byte (all-zero tensor) —
            # keeps the flat-buffer index math total
            payloads = pdf["payload"].map(lambda p: p if len(p) else b"\x00")
            lens = payloads.map(len).to_numpy(np.int64)
            need = widths * heights * 3
            # split rows so each sub-batch tiles ≤ tiled_bytes_cap bytes
            # (a single oversized row becomes its own sub-batch, then is
            # sliced internally so even IT stays under the cap)
            cuts = [0]
            acc = 0
            for i, nd in enumerate(need):
                if acc + nd > tiled_bytes_cap and i > cuts[-1]:
                    cuts.append(i)
                    acc = 0
                acc += int(nd)
            cuts.append(n)
            means = np.empty((n, 3), dtype=np.float64)
            for s, e in zip(cuts[:-1], cuts[1:]):
                if e - s == 1 and need[s] > tiled_bytes_cap:
                    buf = np.frombuffer(payloads.iloc[s], dtype=np.uint8)
                    sums = _oversized_row_means(buf, int(need[s]), tiled_bytes_cap)
                    means[s] = sums / (widths[s] * heights[s])
                else:
                    means[s:e] = _chunk_means(
                        payloads.iloc[s:e], widths[s:e], heights[s:e], lens[s:e], need[s:e]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "n_bytes": pdf["payload"].map(len).to_numpy(np.int64),
                }
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
            if pdf.empty:
                continue
            lens = pdf["payload"].map(len).to_numpy(np.int64)
            flat = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
            flat_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            counts = -(-lens // every_n_bytes)  # ceil — samples per row
            row = np.repeat(np.arange(len(pdf)), counts)
            frame_idx = np.arange(int(counts.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
            )
            sampled = flat[flat_starts[row] + frame_idx * every_n_bytes]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[row],
                    "frame_idx": frame_idx.astype(np.int32),
                    "byte": sampled.astype(np.int32),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, frame_idx int, byte int"
    )
