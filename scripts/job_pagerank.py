"""spark-submit job entry: PageRank (or any operator) over a transcript
table — the production invocation shape of the north rule:

    python scripts/make_pyfiles.py          # builds dist/libgrape_lite_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/libgrape_lite_spark.zip \\
        scripts/job_pagerank.py \\
        --input /path/to/transcripts.parquet \\
        --output /path/to/ranks \\
        --algorithm pagerank --rounds 10 --tol 1e-6 \\
        --checkpoint-dir /path/to/ckpt --run-id nightly-2026-08-16

On a cluster ``--input`` is the Iceberg transcript table
(``spark.read.table(...)`` — swap the reader below); in this sandbox it is
parquet or ``synthetic:<n_conversations>``. The job is resumable: re-submit
with the same ``--run-id``/``--checkpoint-dir`` and it continues from the
last committed superstep (plans/superstep.py).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path / synthetic:<n_conversations>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--algorithm", default="pagerank",
                    choices=["pagerank", "wcc", "cdlp", "bfs", "sssp", "lcc"])
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--source", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--metrics-path", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from libgrape_lite_spark.functions.edges import build_graph_from_transcripts
    from libgrape_lite_spark.operators import bfs, cdlp, lcc, pagerank, sssp, wcc
    from libgrape_lite_spark.plans.superstep import IterationDriver
    from libgrape_lite_spark.session import tune_shuffle_partitions

    spark = SparkSession.builder.appName(f"graphlite-{args.algorithm}").getOrCreate()

    if args.input.startswith("synthetic:"):
        from libgrape_lite_spark.sources.transcripts import synthesize_transcripts

        t = synthesize_transcripts(spark, int(args.input.split(":", 1)[1]))
        t = t.localCheckpoint(eager=True)
    else:
        t = spark.read.parquet(args.input)

    vertices, edges = build_graph_from_transcripts(t)
    vertices = vertices.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    tune_shuffle_partitions(spark, 2 * edges.count())

    drv = IterationDriver(
        spark,
        run_id=args.run_id,
        checkpoint_dir=args.checkpoint_dir,
        metrics_path=args.metrics_path,
        verbose=True,
    )
    if args.algorithm == "pagerank":
        out = pagerank(vertices, edges, max_rounds=args.rounds, tol=args.tol, driver=drv)
    elif args.algorithm == "wcc":
        out = wcc(vertices, edges, driver=drv)
    elif args.algorithm == "cdlp":
        out = cdlp(vertices, edges, max_rounds=args.rounds, driver=drv)
    elif args.algorithm == "bfs":
        out = bfs(vertices, edges, source=args.source, driver=drv)
    elif args.algorithm == "sssp":
        out = sssp(vertices, edges, source=args.source, driver=drv)
    else:
        out = lcc(vertices, edges)

    out.join(vertices, "id").write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
