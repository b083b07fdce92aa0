"""Per-partition gather-scatter kernels (the CSR-fragment compute path).

The reference's per-fragment compute is a scan over a local CSR with
atomic reductions (ImmutableCSR, grape/graph/immutable_csr.h; atomic_min/
add, grape/utils/atomic_ops.h). The Spark-native equivalent implemented
here:

* the edge table is hash-partitioned by ``src`` into P *fragments*
  (``part = pmod(hash(src), P)`` — HashPartitioner parity,
  grape/fragment/partitioner.h:39-41);
* vertex state is co-partitioned by ``id`` with the same function;
* one superstep = ``cogroup(edges_by_part, state_by_part).applyInPandas``
  running a NumPy kernel per fragment: map local src → state value
  (sorted-id ``searchsorted``, the dense-lid lookup), then pre-aggregate
  per destination with ``np.bincount`` over factorized dst codes — the
  map-side combine the reference gets from per-fragment message dedup
  (SURVEY.md §2.4) — then a narrow shuffle-reduce ``groupBy(dst)``
  finishes cross-fragment sums.

Shuffle volume per superstep: O(distinct dst per fragment), never O(E) —
exactly the reference's "one message per (vertex, dest fragment)"
guarantee (csr_edgecut_fragment_base.h:226-258).

Everything is Arrow-batched NumPy; no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REDUCERS = {
    "sum": (np.add, 0.0),
    "min": (np.minimum, np.inf),
    "max": (np.maximum, -np.inf),
}


def partition_edges(edges: DataFrame, num_fragments: int, key: str = "src") -> DataFrame:
    """Assign each edge to its ``key``-endpoint's fragment and co-locate —
    the one-time `PrepareToRunApp` stage; cache the result across
    supersteps. ``key="src"`` for gathers that read source state (PR, WCC
    push); ``key="dst"`` for gathers that read destination state (CDLP
    out-adjacency votes)."""
    withp = edges.withColumn("part", F.pmod(F.hash(key), F.lit(num_fragments)))
    return withp.repartition(num_fragments, "part")


def partition_state(state: DataFrame, num_fragments: int) -> DataFrame:
    return state.withColumn("part", F.pmod(F.hash("id"), F.lit(num_fragments)))


def gather_scatter(
    edges_p: DataFrame,
    state: DataFrame,
    value_col: str,
    num_fragments: int,
    reduce_fn: str = "sum",
    weight_col: str | None = None,
) -> DataFrame:
    """One message superstep: for every edge (v→u), send
    ``state[v].value (op weight)`` to u; combine with ``reduce_fn``.

    Returns DataFrame(id, gathered). ``edges_p`` must come from
    :func:`partition_edges` (and be cached by the caller).
    """
    np_op, init = _REDUCERS[reduce_fn]
    use_weight = weight_col is not None

    def kernel(key, edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if edges_pdf.empty or state_pdf.empty:
            return pd.DataFrame({"id": np.array([], dtype=np.int64),
                                 "gathered": np.array([], dtype=np.float64)})
        ids = state_pdf["id"].to_numpy(dtype=np.int64)
        vals = state_pdf[value_col].to_numpy(dtype=np.float64)
        order = np.argsort(ids, kind="stable")
        ids_sorted, vals_sorted = ids[order], vals[order]

        src = edges_pdf["src"].to_numpy(dtype=np.int64)
        dst = edges_pdf["dst"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(ids_sorted, src)
        # guard: srcs without state (shouldn't happen — same partitioner)
        valid = (pos < len(ids_sorted)) & (ids_sorted[np.minimum(pos, len(ids_sorted) - 1)] == src)
        pos, dst = pos[valid], dst[valid]
        contrib = vals_sorted[pos]
        if use_weight:
            contrib = contrib + edges_pdf[weight_col].to_numpy(dtype=np.float64)[valid]

        # per-fragment combine: factorize dst → dense codes → bincount/reduceat
        dst_unique, codes = np.unique(dst, return_inverse=True)
        if reduce_fn == "sum":
            partial = np.bincount(codes, weights=contrib, minlength=len(dst_unique))
        else:
            partial = np.full(len(dst_unique), init)
            np_op.at(partial, codes, contrib)
        return pd.DataFrame({"id": dst_unique, "gathered": partial})

    state_p = partition_state(state.select("id", value_col), num_fragments)
    partials = (
        edges_p.groupBy("part")
        .cogroup(state_p.groupBy("part"))
        .applyInPandas(kernel, schema="id long, gathered double")
    )
    agg = {"sum": F.sum, "min": F.min, "max": F.max}[reduce_fn]
    return partials.groupBy("id").agg(agg("gathered").alias("gathered"))


def gather_label_counts(
    edges_p: DataFrame,
    state: DataFrame,
    label_col: str,
    num_fragments: int,
) -> DataFrame:
    """CDLP's vote gather as a fragment kernel: for every edge (u→v), u
    receives one vote for label(v); per-fragment the kernel pre-counts
    (u, label) pairs with ``np.unique`` — the per-fragment combine — and
    only partial counts shuffle.

    ``edges_p`` must be partitioned by **dst** owner
    (``partition_edges`` on the flipped table or
    ``pmod(hash(dst), P)``) so label lookups are fragment-local.
    Returns DataFrame(id, label, cnt).
    """

    def kernel(key, edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if edges_pdf.empty or state_pdf.empty:
            return pd.DataFrame(
                {"id": np.array([], dtype=np.int64),
                 "label": np.array([], dtype=np.int64),
                 "cnt": np.array([], dtype=np.int64)}
            )
        ids = state_pdf["id"].to_numpy(dtype=np.int64)
        labels = state_pdf[label_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids_sorted, labels_sorted = ids[order], labels[order]

        src = edges_pdf["src"].to_numpy(dtype=np.int64)
        dst = edges_pdf["dst"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(ids_sorted, dst)
        valid = (pos < len(ids_sorted)) & (
            ids_sorted[np.minimum(pos, len(ids_sorted) - 1)] == dst
        )
        src = src[valid]
        vote = labels_sorted[pos[valid]]
        pairs = np.stack([src, vote], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        return pd.DataFrame(
            {"id": uniq[:, 0], "label": uniq[:, 1], "cnt": counts.astype(np.int64)}
        )

    state_p = partition_state(state.select("id", label_col), num_fragments)
    partials = (
        edges_p.groupBy("part")
        .cogroup(state_p.groupBy("part"))
        .applyInPandas(kernel, schema="id long, label long, cnt long")
    )
    return partials.groupBy("id", "label").agg(F.sum("cnt").alias("cnt"))
