"""Kill-resume (north rule): a killed iterative job resumes mid-iteration
from the last committed checkpoint and produces identical results."""

from __future__ import annotations

import pytest

from tests.conftest import make_edges, make_vertices


def _ring(spark, n=30):
    v = make_vertices(spark, range(n))
    e = make_edges(spark, [(i, (i + 1) % n) for i in range(n)])
    return v, e


def test_wcc_resume_equals_uninterrupted(spark, tmp_path):
    from libgrape_lite_spark.operators import wcc
    from libgrape_lite_spark.plans.superstep import IterationDriver

    v, e = _ring(spark)
    # num_fragments pinned to 8: the mid-run precondition below needs the
    # ring split across enough fragments that 3 supersteps cannot reach
    # the fixed point (fewer fragments → bigger local fixpoints → faster
    # global convergence; the session default is 4 partitions since r7)
    nf = 8
    want = {r["id"]: r["comp"] for r in wcc(v, e, num_fragments=nf).collect()}

    ckpt = str(tmp_path / "ckpt")
    run_id = "killrun"
    # phase 1: "killed" after 3 supersteps (checkpoint every superstep)
    d1 = IterationDriver(spark, run_id=run_id, checkpoint_dir=ckpt, checkpoint_every=1)
    partial = wcc(v, e, driver=d1, max_rounds=3, num_fragments=nf)
    assert {r["id"]: r["comp"] for r in partial.collect()} != want  # genuinely mid-run

    # phase 2: fresh driver with the same run id resumes from step 3
    d2 = IterationDriver(spark, run_id=run_id, checkpoint_dir=ckpt, checkpoint_every=1)
    resumed_state, resumed_step = d2.latest_checkpoint()
    assert resumed_step == 3
    got = {r["id"]: r["comp"] for r in wcc(v, e, driver=d2, num_fragments=nf).collect()}
    assert got == want
    # and the resumed run did fewer supersteps than a cold run would
    cold_rounds = len(IterationDriver(spark).metrics)  # 0, just for clarity
    assert d2.metrics[0].superstep == 4
    del cold_rounds


def test_pagerank_resume(spark, tmp_path):
    from libgrape_lite_spark.operators import pagerank
    from libgrape_lite_spark.plans.superstep import IterationDriver

    v, e = _ring(spark, n=12)
    want = {r["id"]: r["rank"] for r in pagerank(v, e, max_rounds=10).collect()}

    ckpt = str(tmp_path / "ckpt_pr")
    d1 = IterationDriver(spark, run_id="pr", checkpoint_dir=ckpt, checkpoint_every=1)
    pagerank(v, e, max_rounds=4, driver=d1)
    d2 = IterationDriver(spark, run_id="pr", checkpoint_dir=ckpt, checkpoint_every=1)
    got = {r["id"]: r["rank"] for r in pagerank(v, e, max_rounds=10, driver=d2).collect()}
    assert d2.metrics[0].superstep == 5  # resumed, not restarted
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_metrics_lineage_written(spark, tmp_path):
    from libgrape_lite_spark.operators import wcc
    from libgrape_lite_spark.plans.superstep import IterationDriver

    v, e = _ring(spark, n=10)
    mpath = str(tmp_path / "metrics")
    d = IterationDriver(spark, metrics_path=mpath)
    wcc(v, e, driver=d)
    m = spark.read.parquet(mpath)
    rows = m.collect()
    assert {r["superstep"] for r in rows} == set(range(1, len(rows) + 1))
    assert all(r["t_ms"] > 0 for r in rows)
    assert rows[0]["run_id"] == d.run_id
