"""Round-4 operator behaviors: auto hub-salting, parallel-app API parity,
BFS max_rounds depth-bound semantics, WCC adaptive push/pull rounds."""

from __future__ import annotations

import pytest

from tests.conftest import make_edges, make_vertices


def as_dict(df, key="id"):
    rows = df.collect()
    (vcol,) = [c for c in df.columns if c != key]
    return {r[key]: r[vcol] for r in rows}


# ------------------------------------------------- auto hub-salting (PR)
def test_pagerank_auto_hub_salting_power_law(spark):
    """Power-law fixture: a hub whose degree out-weighs whole fragments.
    With detection thresholds scaled to the fixture, hub_salts='auto' must
    ENGAGE (observable via driver.info) and produce ranks identical to the
    unsalted run (sum is associative — salting is plan-only)."""
    from libgrape_lite_spark.operators import pagerank
    from libgrape_lite_spark.plans.superstep import IterationDriver

    n_leaves = 200
    v = make_vertices(spark, range(n_leaves + 1))
    e = make_edges(spark, [(0, i) for i in range(1, n_leaves + 1)])

    drv = IterationDriver(spark)
    salted = as_dict(
        pagerank(
            v, e, max_rounds=5, driver=drv,
            hub_degree_factor=1.0, min_hub_degree=0,
        )
    )
    assert drv.info["pagerank_hub_salts"] > 0  # auto-engaged
    plain = as_dict(pagerank(v, e, max_rounds=5, hub_salts=0))
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], abs=1e-12)


def test_pagerank_auto_hub_salting_stays_off_without_skew(spark):
    """Default thresholds: a skew-free chain must NOT engage salting (the
    extra shuffle would only cost)."""
    from libgrape_lite_spark.operators import pagerank
    from libgrape_lite_spark.plans.superstep import IterationDriver

    v = make_vertices(spark, range(10))
    e = make_edges(spark, [(i, i + 1) for i in range(9)])
    drv = IterationDriver(spark)
    pagerank(v, e, max_rounds=2, driver=drv).collect()
    assert drv.info["pagerank_hub_salts"] == 0


# ------------------------------------- parallel-variant API parity
def test_pagerank_parallel_aliases_match_base(spark):
    """pagerank_parallel.h / pagerank_local_parallel.h differ from the base
    apps only in messaging machinery Spark subsumes — the aliases must
    reproduce the base impls exactly."""
    from libgrape_lite_spark.operators import (
        pagerank,
        pagerank_local,
        pagerank_local_parallel,
        pagerank_parallel,
    )

    v = make_vertices(spark, range(6))
    e = make_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4)])

    base = as_dict(pagerank(v, e, max_rounds=4))
    alias = as_dict(pagerank_parallel(v, e, max_rounds=4))
    assert alias == base

    base_l = as_dict(pagerank_local(v, e, max_rounds=4))
    alias_l = as_dict(pagerank_local_parallel(v, e, max_rounds=4))
    assert alias_l == base_l


# --------------------------------------- BFS max_rounds is a depth bound
def test_bfs_max_rounds_depth_bound_all_impls(spark):
    """One PIE superstep settles many levels; max_rounds must still bound
    the returned DEPTHS (clamped back to unreached) so impl='auto', the
    dense-switched push, and plain push agree (ADVICE r3)."""
    from libgrape_lite_spark.operators import bfs
    from libgrape_lite_spark.operators.bfs import INT64_MAX

    v = make_vertices(spark, range(6))
    e = make_edges(spark, [(i, i + 1) for i in range(5)])
    expect = {0: 0, 1: 1, 2: 2, 3: INT64_MAX, 4: INT64_MAX, 5: INT64_MAX}
    assert as_dict(bfs(v, e, source=0, max_rounds=2, impl="auto")) == expect
    assert as_dict(bfs(v, e, source=0, max_rounds=2, impl="dataframe")) == expect
    # and without a budget both settle the full chain
    full = {i: i for i in range(6)}
    assert as_dict(bfs(v, e, source=0, impl="auto")) == full
    assert as_dict(bfs(v, e, source=0, impl="dataframe")) == full


# --------------------------------------------- WCC adaptive push ↔ pull
def test_wcc_pull_and_push_rounds_agree(spark):
    """Forced always-pull (pull_fraction=0) and effectively-always-push
    (pull_fraction=1) must both reach the reference fixpoint — the switch
    is a cost trade, never a semantics change (wcc.h:198-209)."""
    from libgrape_lite_spark.operators import wcc

    v = make_vertices(spark, range(8))
    e = make_edges(spark, [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6)])
    expect = {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7}
    assert as_dict(wcc(v, e, impl="dataframe", pull_fraction=0.0)) == expect
    assert as_dict(wcc(v, e, impl="dataframe", pull_fraction=1.0)) == expect
