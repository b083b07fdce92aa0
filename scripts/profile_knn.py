"""One-off profile: where does knn_ivf spend its time at V=1M?

Stages timed cumulatively (each includes the prior work recomputed,
since intermediate frames are not cached by the operator):
  1. kmeans_fit alone (checkpoint + seed + iters x (assign+join+mean))
  2. corpus assignment pass (argmax kernel over the corpus)
  3. candidate pairs (probe join + distinct)
  4. full knn_ivf
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.bench_pipeline import synth_embeddings  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.operators import knn as K

    spark = get_spark(
        app_name="profile-knn",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = synth_embeddings(spark, n_vecs).localCheckpoint(eager=True)
    queries = emb.where(F.pmod(F.col("vec_id"), F.lit(n_vecs // 500)) == 7)
    print(f"base: {emb.count()} vecs, {queries.count()} queries", flush=True)

    def timed(name, fn):
        t = time.time()
        out = fn()
        print(f"{name}: {time.time() - t:.1f}s -> {out}", flush=True)

    timed(
        "kmeans_fit",
        lambda: K.kmeans_fit(emb, 256, 2).shape,
    )

    cents = K.kmeans_fit(emb, 256, 2)

    def corpus_assign():
        cb = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        return cb.mapInPandas(
            K._batch_argmax_cosine(cents), schema="id long, cell int"
        ).count()

    timed("corpus_assign_pass", corpus_assign)

    timed(
        "knn_ivf_total",
        lambda: K.knn_ivf(emb, queries, k=10, n_centroids=256, n_probe=8, kmeans_iters=2).count(),
    )

    spark.stop()


if __name__ == "__main__":
    main()
