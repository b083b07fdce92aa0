"""One-off profile: where does dedup_minhash spend its time at C=1M?

Stages timed separately (xxhash64 hash family, the scale path):
  1. signatures via the explode+groupBy plan
  2. signatures via the narrow one-pass fold plan (zero shuffle)
  3. LSH candidates (banding + self-join + distinct), from cached sigs
  4. full dedup_minhash (sig + candidates + semi-join verify), as a thunk
     so the operator's eager candidate checkpoint is inside the window

Signature evaluation is FORCED through an aggregate over the sig
elements: a bare count() lets Catalyst prune the whole signature
expression out of the narrow plan (there is no shuffle boundary to
stop it), which silently times just the shingle size filter — the
methodology bug that made the first narrow-plan measurement here look
4.5 s cheaper than the explode plan while the real cost was >10x.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.bench_pipeline import synth_documents  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.functions.similarity import (
        minhash_bands,
        minhash_signatures,
    )
    from libgrape_lite_spark.operators.dedup import dedup_minhash

    spark = get_spark(
        app_name="profile-minhash",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_documents(spark, n_docs).localCheckpoint(eager=True)
    print(f"corpus: {docs.count()} docs", flush=True)

    H, B, SHN = 16, 4, 3

    def timed(name, fn):
        t = time.time()
        out = fn()
        print(f"{name}: {time.time() - t:.1f}s -> {out}", flush=True)

    # forces every element of every signature to be computed (XOR: no
    # ANSI long-overflow, unlike sum over full-range hash values)
    force = F.bit_xor(
        F.element_at("sig", 1)
        .bitwiseXOR(F.element_at("sig", H // 2))
        .bitwiseXOR(F.element_at("sig", H))
    )

    def sigs(plan):
        df = minhash_signatures(
            docs, num_hashes=H, shingle_n=SHN, hash_fn="xxhash64", plan=plan
        )
        return df.agg(force).collect()[0][0]

    timed("sig_explode", lambda: sigs("explode"))
    timed("sig_narrow", lambda: sigs("narrow"))

    # candidates from cached signatures (isolates band join + distinct)
    cached = minhash_signatures(
        docs, num_hashes=H, shingle_n=SHN, hash_fn="xxhash64"
    ).localCheckpoint(eager=True)

    def cands_only():
        rows = H // B
        banded = cached.select(
            "id", F.explode(minhash_bands(F.col("sig"), B, rows)).alias("bk")
        ).select("id", "bk.band", "bk.key")
        a = banded.select(F.col("id").alias("a"), "band", "key")
        b = banded.select(F.col("id").alias("b"), "band", "key")
        return (
            a.join(b.hint("shuffle_hash"), ["band", "key"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .count()
        )

    timed("cands_from_cached_sigs", cands_only)

    # full operator — thunk includes the eager candidate checkpoint
    timed(
        "dedup_minhash_total",
        lambda: dedup_minhash(docs, hash_fn="xxhash64").count(),
    )

    spark.stop()


if __name__ == "__main__":
    main()
