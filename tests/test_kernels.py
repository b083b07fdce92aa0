"""Fragment gather-scatter kernels (plans/kernels.py) vs DataFrame results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_edges, make_vertices


def test_gather_scatter_sum_matches_join(spark):
    from libgrape_lite_spark.plans.kernels import gather_scatter, partition_edges

    e = make_edges(spark, [(i, (i * 3) % 50) for i in range(200)] + [(0, 1)] * 5)
    state = spark.range(200).select(
        F.col("id"), (F.col("id") * 0.5 + 1.0).alias("val")
    )
    want = {
        r["id"]: r["g"]
        for r in e.join(state.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("val").alias("g"))
        .collect()
    }
    ep = partition_edges(e, 4).localCheckpoint(eager=True)
    got = {r["id"]: r["gathered"] for r in gather_scatter(ep, state, "val", 4).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_gather_scatter_min(spark):
    from libgrape_lite_spark.plans.kernels import gather_scatter, partition_edges

    e = make_edges(spark, [(1, 3), (2, 3), (4, 3), (1, 5)])
    state = spark.createDataFrame(
        [(1, 9.0), (2, 4.0), (4, 7.0)], "id long, val double"
    )
    ep = partition_edges(e, 3).localCheckpoint(eager=True)
    got = {r["id"]: r["gathered"] for r in
           gather_scatter(ep, state, "val", 3, reduce_fn="min").collect()}
    assert got == {3: 4.0, 5: 9.0}


def test_wcc_kernel_equals_dataframe(spark):
    from libgrape_lite_spark.operators import wcc

    v = make_vertices(spark, range(20))
    e = make_edges(spark, [(i, i + 1) for i in range(8)] + [(12, 13), (13, 14), (17, 18)])
    a = {r["id"]: r["comp"] for r in wcc(v, e).collect()}
    b = {r["id"]: r["comp"] for r in wcc(v, e, impl="kernel", num_fragments=4).collect()}
    assert a == b


def test_lcc_wedge_equals_intersect(spark):
    from libgrape_lite_spark.operators.lcc import triangle_counts

    v = make_vertices(spark, range(12))
    e = make_edges(
        spark,
        [(i, (i + 1) % 12) for i in range(12)] + [(i, (i + 2) % 12) for i in range(12)],
    )
    a = {r["id"]: r["tri"] for r in triangle_counts(v, e, impl="wedge").collect()}
    b = {r["id"]: r["tri"] for r in triangle_counts(v, e, impl="intersect").collect()}
    assert a == b


def test_cdlp_kernel_equals_dataframe(spark):
    from libgrape_lite_spark.operators import cdlp

    v = make_vertices(spark, range(15))
    e = make_edges(
        spark,
        [(i, (i + 1) % 15) for i in range(15)]
        + [(0, 5), (5, 0), (3, 3), (7, 8), (7, 8)],  # self-loop + parallel edge
    )
    a = {r["id"]: r["label"] for r in cdlp(v, e, max_rounds=4).collect()}
    b = {r["id"]: r["label"] for r in
         cdlp(v, e, max_rounds=4, impl="kernel", num_fragments=4).collect()}
    assert a == b


def test_pagerank_kernel_equals_dataframe(spark):
    from libgrape_lite_spark.operators import pagerank

    v = make_vertices(spark, range(30))
    e = make_edges(
        spark, [(i, (i + 1) % 30) for i in range(30)] + [(i, (i * 7) % 30) for i in range(30)]
    )
    a = {r["id"]: r["rank"] for r in pagerank(v, e, max_rounds=6).collect()}
    b = {r["id"]: r["rank"] for r in
         pagerank(v, e, max_rounds=6, impl="kernel", num_fragments=4).collect()}
    for k in a:
        assert b[k] == pytest.approx(a[k], rel=1e-10)


def test_wcc_auto_equals_dataframe(spark):
    """PIE local-fixpoint kernel (impl='auto') matches the join fixpoint on
    a multi-chain + cross-link graph (chains exercise the local collapse)."""
    from libgrape_lite_spark.operators import wcc
    from tests.conftest import make_edges, make_vertices

    # two long chains + a bridge + an isolated pair + a self-loop
    edges = [(i, i + 1) for i in range(0, 19)] + [(30, 31), (5, 40), (40, 41), (7, 7)]
    ids = sorted({x for e in edges for x in e})
    v, e = make_vertices(spark, ids), make_edges(spark, edges)
    want = {r["id"]: r["comp"] for r in wcc(v, e, impl="dataframe").collect()}
    got = {r["id"]: r["comp"] for r in wcc(v, e, impl="auto", num_fragments=4).collect()}
    assert got == want


def test_wcc_kernel_long_ids_past_2_53(spark):
    """Long-typed gather: component ids above 2^53 survive exactly (the
    old double path would round them)."""
    from libgrape_lite_spark.operators import wcc

    base = (1 << 53) + 1  # odd; double would round to 2^53
    ids = [base, base + 1, base + 3]
    edges = [(base, base + 1)]
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame([(s, d, 1.0) for s, d in edges], "src long, dst long, weight double")
    got = {r["id"]: r["comp"] for r in wcc(v, e, impl="kernel", num_fragments=2).collect()}
    assert got == {base: base, base + 1: base, base + 3: base + 3}


def test_wcc_jump_off_equals_on(spark):
    from libgrape_lite_spark.operators import wcc
    from tests.conftest import make_edges, make_vertices

    edges = [(i, i + 1) for i in range(0, 12)] + [(3, 20), (20, 21)]
    ids = sorted({x for e in edges for x in e})
    v, e = make_vertices(spark, ids), make_edges(spark, edges)
    a = {r["id"]: r["comp"] for r in wcc(v, e, jump=True).collect()}
    b = {r["id"]: r["comp"] for r in wcc(v, e, jump=False).collect()}
    assert a == b


def test_sssp_auto_equals_dataframe(spark):
    """sssp_auto local-relaxation kernel matches the frontier fixpoint on a
    weighted multi-chain graph with a shortcut that flips the best path."""
    from libgrape_lite_spark.operators import sssp
    from tests.conftest import make_edges, make_vertices

    edges = (
        [(i, i + 1, 1.0) for i in range(0, 15)]
        + [(0, 10, 3.5)]          # shortcut beats the 10-hop chain
        + [(20, 21, 2.0), (21, 22, 2.0)]  # unreachable from 0? no — connect:
        + [(14, 20, 0.5)]
        + [(5, 5, 9.0)]           # self loop no-op
    )
    ids = sorted({x for e in edges for x in e[:2]})
    v = make_vertices(spark, ids)
    e = make_edges(spark, edges)
    want = {r["id"]: r["dist"] for r in sssp(v, e, source=0).collect()}
    got = {r["id"]: r["dist"] for r in
           sssp(v, e, source=0, impl="auto", num_fragments=4).collect()}
    assert got == want
    # directed variant too
    want_d = {r["id"]: r["dist"] for r in sssp(v, e, source=0, directed=True).collect()}
    got_d = {r["id"]: r["dist"] for r in
             sssp(v, e, source=0, directed=True, impl="auto", num_fragments=4).collect()}
    assert got_d == want_d
