"""Round-6 regression tests: degenerate-input semantics, lifecycle,
incremental mutation, Iceberg seam.

Reference anchors cited per-test; see VERDICT.md round-5 task list and
ADVICE.md round-5 items.
"""

from __future__ import annotations

import warnings

import pytest


def _zero_norm_fixture(spark):
    rows = [(i, [float(i + 1), float(2 * i + 1), 1.0]) for i in range(20)]
    rows.append((99, [0.0, 0.0, 0.0]))  # zero-norm corpus+query vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, df.where("vec_id in (0, 99)")


def test_knn_zero_norm_vectors_excluded_everywhere(spark):
    """ADVICE r5 (medium): a zero-norm vector must never reach the ranking
    window. Before the fix: knn_bruteforce THREW DIVIDE_BY_ZERO under
    Spark 4's default ANSI mode, and knn_ivf's NumPy kernel emitted NaN
    cosines which sort ABOVE all doubles in the desc window — the zero
    vector became rank-1 neighbor of every query in its cell. Now all
    three impls agree: undefined cosine → excluded from ranking."""
    from libgrape_lite_spark.operators.knn import knn_bruteforce, knn_ivf, knn_lsh

    corpus, queries = _zero_norm_fixture(spark)
    bf = knn_bruteforce(corpus, queries, k=5).collect()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        iv = knn_ivf(corpus, queries, k=5, n_centroids=4, n_probe=4).collect()
    ls = knn_lsh(corpus, queries, k=5).collect()

    for rows in (bf, iv, ls):
        assert rows, "non-degenerate query must still get neighbors"
        assert all(r.neighbor_id != 99 for r in rows)
        assert all(r.query_id != 99 for r in rows)
        assert all(r.cos == r.cos for r in rows)  # no NaN survives
    assert not any(issubclass(w.category, RuntimeWarning) for w in caught)


def test_cosine_null_on_zero_norm_under_ansi(spark):
    """functions.similarity.cosine uses try_divide: NULL (not a throw, not
    NaN) for zero-norm inputs regardless of spark.sql.ansi.enabled."""
    from pyspark.sql import functions as F

    from libgrape_lite_spark.functions.similarity import cosine

    df = spark.createDataFrame(
        [([1.0, 2.0], [0.0, 0.0]), ([1.0, 2.0], [2.0, 4.0])],
        "a array<double>, b array<double>",
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    vals = sorted((r.c is None, r.c) for r in got)
    assert vals[0][0] is False and vals[0][1] == pytest.approx(1.0)
    assert vals[1][0] is True


def test_entry_queries_release_prior_transients(spark):
    """ADVICE r5: a sequential oracle session over __spark_entry__.queries()
    must not accumulate operator-internal localCheckpoint blocks — each
    callable releases the previous query's transients on entry."""
    import __spark_entry__ as entry_mod
    from libgrape_lite_spark import transients

    sf = "/root/testdata/sf0.001"
    qs = entry_mod.queries()
    pos = transients.mark()
    qs["dedup_minhash"](spark, sf).collect()
    q1_blocks = transients._TRANSIENTS[pos:]
    assert q1_blocks, "dedup_minhash should register transient checkpoints"
    sc = spark.sparkContext
    q1_ids = set()
    for df in q1_blocks:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                q1_ids.add(leaf.rdd().id())
    assert q1_ids & set(sc._jsc.getPersistentRDDs().keys())

    # building the NEXT query frees query 1's pinned blocks
    qs["ngram_jaccard_pairs"](spark, sf).collect()
    live = set(sc._jsc.getPersistentRDDs().keys())
    assert not (q1_ids & live)
    transients.release_transients()
