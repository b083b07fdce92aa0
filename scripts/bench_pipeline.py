"""Pipeline-operator benchmark at corpus scale (C >= 1M) — VERDICT r4 #5.

The LLM-data-pipeline operators (dedup_minhash, dedup_simhash, knn_ivf)
are oracle-exact at sf0.01/sf0.1 but those inputs are 500-5k documents;
this script runs them on a DETERMINISTIC synthetic corpus of C documents
(default 1,000,000) and E embedding vectors (default 1,000,000 x 32),
generated entirely with JVM-side expressions (seeded hashes - no Python
row loops, no external data), so their scale posture is measured, not
argued from plan shape alone.

Corpus shape: ~2.4% of documents are near-duplicate perturbations of
their predecessor (one token mutated + one appended), giving the dedup
operators real positives; token frequencies are skewed (u^3 over a 50k
vocabulary) like natural text. Embeddings are 85% cluster centroid + 15%
noise over 64 latent clusters, giving IVF real structure.

Each operator's executed plan is audited inline: no CartesianProduct, no
row-at-a-time Python (BatchEvalPython); ArrowEvalPython/ FlatMapsInPandas
(vectorized) are allowed. Results (wall times + plan booleans + machine
clock + loadavg) go to BENCH/runs/pipeline_<epoch>.json and one JSON
line on stdout.

Round 6 (VERDICT r5 task 3): every operator is timed THREE times inside
this one invocation and the quoted capability number is that median
("seconds"; raw triple in "runs_sec") — replacing the r5 "per-op BEST
across committed runs" convention, which systematically selected noise
minima on a ±40% box (dedup_simhash's best-of record spanned 16.3-46.6 s
on identical code).

Run:  python scripts/bench_pipeline.py [n_docs] [n_vectors]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DIM = 32
N_QUERIES = 500
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = 3


def synth_documents(spark, n: int):
    """(doc_id, text): deterministic, skewed vocabulary, ~2.4% near-dups."""
    from pyspark.sql import functions as F

    base = F.when(F.col("id") % 41 == 1, F.col("id") - 1).otherwise(F.col("id"))
    length = (F.pmod(F.xxhash64(base, F.lit("len")), F.lit(51)) + 30).cast("int")
    # token at position p: u^3 skew over a 50k vocabulary — low word-ids
    # are common, the tail is rare (Zipf-ish)
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), length),
            lambda p: F.concat(
                F.lit("w"),
                F.floor(
                    F.lit(50_000)
                    * F.pow(
                        F.pmod(F.xxhash64(base, p), F.lit(1_000_003)) / 1_000_003.0,
                        F.lit(3.0),
                    )
                ).cast("string"),
            ),
        ),
        " ",
    )
    text = F.when(
        F.col("id") % 41 == 1,
        # perturbed copy: same body with one extra unique token appended
        F.concat(body, F.lit(" mut"), F.col("id").cast("string")),
    ).otherwise(body)
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def synth_embeddings(spark, n: int, dim: int = DIM, clusters: int = 64):
    """(vec_id, embedding float[dim]): 85% cluster centroid + 15% noise."""
    from pyspark.sql import functions as F

    c = F.pmod(F.col("id"), F.lit(clusters))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            0.85 * ((F.pmod(F.xxhash64(c, j, F.lit("c")), F.lit(2001)) - 1000) / 1000.0)
            + 0.15
            * ((F.pmod(F.xxhash64(F.col("id"), j, F.lit("n")), F.lit(2001)) - 1000) / 1000.0)
        ).cast("float"),
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def plan_audit(df) -> dict:
    """Scale red-flags from the EXECUTED plan string."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "cartesian": "CartesianProduct" in plan,
        "row_python": "BatchEvalPython" in plan,  # per-row Python UDF
        "codegen_stages": plan.count("WholeStageCodegen"),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from pyspark.sql import functions as F

    from libgrape_lite_spark import get_spark
    from libgrape_lite_spark.functions.similarity import simhash_bits
    from libgrape_lite_spark.operators.dedup import dedup_minhash, dedup_simhash
    from libgrape_lite_spark.operators.knn import knn_ivf

    spark = get_spark(
        app_name="libgrape-lite-spark-pipeline-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    wall_start = time.time()

    t0 = time.time()
    docs = synth_documents(spark, n_docs).localCheckpoint(eager=True)
    emb = synth_embeddings(spark, n_vecs).localCheckpoint(eager=True)
    queries = emb.where(F.pmod(F.col("vec_id"), F.lit(n_vecs // N_QUERIES)) == 7)
    n_q = queries.count()
    build_s = round(time.time() - t0, 3)

    out: dict = {
        "metric": "pipeline_ops_at_corpus_scale",
        "n_docs": n_docs,
        "n_vectors": n_vecs,
        "dim": DIM,
        "n_queries": n_q,
        "cpus": CPUS,
        "corpus_build_sec": build_s,
        "ops": {},
    }

    def timed(name, thunk, force_agg=None, rate_key="docs_per_sec", rate_n=None):
        # count() lets Catalyst prune unreferenced projections — a pure
        # per-doc map op must be forced through an aggregate over its
        # computed column instead. Operators that materialize eagerly at
        # call time (dedup_minhash checkpoints its candidate set) are
        # passed as thunks so their construction is INSIDE the window.
        # Median of REPEATS back-to-back runs in this one JVM (r6
        # convention — see module docstring).
        from libgrape_lite_spark.transients import release_transients

        # thunks only (ADVICE r6): a non-callable frame re-counted after
        # release_transients() would recompute — or fail — if its plan read
        # a registered localCheckpoint whose lineage is truncated
        assert callable(thunk), f"{name}: pass a thunk, not a DataFrame"
        runs: list[float] = []
        n = 0
        audit: dict = {}
        for _ in range(REPEATS):
            t = time.time()
            df = thunk()
            n = (
                df.agg(force_agg).collect()[0][0]
                if force_agg is not None
                else df.count()
            )
            runs.append(round(time.time() - t, 3))
            # free operator-internal checkpoints so one run's pinned blocks
            # don't degrade the next (measured: a pinned text-stats
            # temporary made dedup_minhash 24s -> 87-109s later in the
            # same session)
            release_transients()
            audit = plan_audit(df)
        med = statistics.median(runs)
        out["ops"][name] = {
            "seconds": med,
            "runs_sec": runs,
            "rows": n,
            rate_key: round((rate_n if rate_n is not None else n_docs) / med, 1),
            **audit,
        }

    from libgrape_lite_spark.functions.text import text_stats_table

    timed(
        "text_stats",
        lambda: text_stats_table(docs),
        # xxhash64 over every output column: forces the full stat row
        # (count() would let Catalyst prune the unreferenced stats)
        force_agg=F.bit_xor(
            F.xxhash64(
                "doc_id", "n_tokens", "n_pieces", "stopword_ratio",
                "quality", "lang_guess", "fp",
            )
        ),
    )
    # hash_fn="xxhash64" throughout: the native scale path (the md5-based
    # h64 exists for DuckDB-oracle bit-parity; at C=1M the num_hashes x
    # shingles md5 evaluation dominated the minhash wall time)
    timed(
        "simhash_signatures",
        lambda: docs.select(
            "doc_id", simhash_bits(F.col("text"), 64, hash_fn="xxhash64").alias("sh")
        ),
        force_agg=F.count_distinct(F.col("sh")),
    )
    timed(
        "dedup_simhash",
        lambda: dedup_simhash(docs, max_hamming=3, bits=64, hash_fn="xxhash64"),
    )
    timed(
        "dedup_minhash",
        lambda: dedup_minhash(
            docs, threshold=0.5, num_hashes=16, bands=4, shingle_n=3,
            hash_fn="xxhash64",
        ),
    )
    timed(
        "knn_ivf",
        lambda: knn_ivf(
            emb, queries, k=10, n_centroids=256, n_probe=8, kmeans_iters=2
        ),
        rate_key="vectors_per_sec",
        rate_n=n_vecs,
    )

    out["wall_clock_start_epoch"] = round(wall_start, 3)
    out["wall_clock_end_epoch"] = round(time.time(), 3)
    try:
        out["loadavg_at_end"] = list(os.getloadavg())
    except OSError:
        pass

    runs = REPO / "BENCH" / "runs"
    runs.mkdir(parents=True, exist_ok=True)
    (runs / f"pipeline_{int(wall_start)}.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
