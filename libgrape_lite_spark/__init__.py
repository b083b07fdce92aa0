"""libgrape_lite_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-creates the query semantics of libgrape-lite (GRAPE's PIE model:
PEval/IncEval supersteps over edge-cut fragments, reference
``grape/worker/worker.h:87-133``) as iterative DataFrame passes:

* a *fragment* is a Spark partition of the edge DataFrame,
* *message passing* is the shuffle performed by ``groupBy(dst).agg(...)``,
* the *superstep loop* is a driver-side ``while`` with checkpointed state,
* per-vertex kernels are vectorized (built-in SQL functions / Arrow batches),
  never row-at-a-time Python.

All algorithms (PageRank, WCC, CDLP, BFS, SSSP, LCC) match the reference's
golden outputs on ``dataset/p2p-31`` (see tests/test_golden_p2p31.py).
"""

from libgrape_lite_spark.session import get_spark


def prepared_session(*edge_tables):
    """Scope the per-graph prepared-table cache (see plans/kernels.py)."""
    from libgrape_lite_spark.plans.kernels import prepared_session as _ps

    return _ps(*edge_tables)


__all__ = ["get_spark", "prepared_session"]
__version__ = "0.1.0"
