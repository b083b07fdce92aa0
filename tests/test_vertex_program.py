"""The VertexProgram plug-in API reproduces the dedicated operators."""

from __future__ import annotations

import math

from tests.conftest import make_edges, make_vertices


def test_wcc_as_vertex_program(spark):
    from libgrape_lite_spark.operators import wcc
    from libgrape_lite_spark.plans.vertex_program import run_vertex_program, wcc_program

    v = make_vertices(spark, range(12))
    e = make_edges(
        spark, [(i, i + 1) for i in range(5)] + [(7, 8), (8, 9), (10, 11)]
    )
    want = {r["id"]: r["comp"] for r in wcc(v, e).collect()}
    got = {r["id"]: r["comp"] for r in run_vertex_program(v, e, wcc_program()).collect()}
    assert got == want


def test_sssp_as_vertex_program(spark):
    from libgrape_lite_spark.operators import sssp
    from libgrape_lite_spark.plans.vertex_program import run_vertex_program, sssp_program

    v = make_vertices(spark, range(8))
    e = make_edges(
        spark,
        [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 10.0), (2, 3, 1.0), (5, 6, 1.0)],
    )
    want = {r["id"]: r["dist"] for r in sssp(v, e, source=0).collect()}
    got = {r["id"]: r["dist"] for r in run_vertex_program(v, e, sssp_program(0)).collect()}
    for k in want:
        if math.isinf(want[k]):
            assert math.isinf(got[k])
        else:
            assert got[k] == want[k]
