"""Incremental graph mutation — the Spark analog of
``MutableEdgecutFragment::Mutate`` (mutable_edgecut_fragment.h:191).

The reference applies a ``Mutation`` (edges_to_add / edges_to_remove /
edges_to_update / vertices_to_remove) to a LOADED fragment in place,
keeping the CSR and vertex maps it already built. The existing Spark
parity path (sources/tsv.py load_mutable_graph_tsv) rebuilds the graph
from base+delta — correct and golden-verified, but it re-pays every
layout shuffle. :func:`merge_edges` closes the gap:

* the merged edge table is derived from the BASE's pinned table with
  **zero wide shuffles** — removal is an anti-join against the
  (broadcastable, delta-sized) removal set, weight update a
  delta-broadcast left join, addition a union — then pinned;
* prepared layouts whose inputs the delta did not touch are **carried
  over** into the merged table's cache instead of rebuilt: a weight-only
  delta keeps every topology-derived layout (push-unweighted, gather
  src/dst, CDLP kernel layout, degree table, fragment bounds, degree
  stats) — only the weighted layouts (PIE fragment table, weighted push
  adjacency) rebuild on next use;
* a topology delta invalidates (by not carrying) every layout, because
  they all derive from the edge set — but the fragment BOUNDS still
  carry: they are a layout choice, not semantics (any strictly-increasing
  boundaries give correct fragments), and approximate edge-count
  quantiles stay balanced under a small delta, so the merged graph skips
  the O(E) approxQuantile pass. Degree stats do NOT carry on topology
  change (they feed PageRank's dangling-mass scalar — semantics).

Ownership: carried layouts stay owned by the base table's cache
(``_PrepCache.borrowed``) — the merged table never unpersists them, and
it holds a strong reference to the base so the base's drop-time finalizer
cannot fire while the merged table is alive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libgrape_lite_spark.plans.kernels import (
    _BOUNDS_CACHE_ATTR,
    _DEGREE_STATS_ATTR,
    _PREP_CACHE_ATTR,
    _prep_cache,
    _prep_put,
)

#: ops understood by merge_edges, mirroring the reference Mutation fields:
#: add → edges_to_add, del → edges_to_remove, upd → edges_to_update,
#: delv → vertices_to_remove (drops every incident edge; ``src`` carries
#: the vertex id, ``dst``/``weight`` ignored)
MUTATION_OPS = ("add", "del", "upd", "delv")


def _weight_dependent(key: tuple) -> bool:
    """True for cache keys whose layout bakes in edge weights."""
    if key[0] == "pie":
        return True
    return key[0] == "push" and bool(key[2])


def merge_edges(base_edges: DataFrame, delta: DataFrame) -> DataFrame:
    """Apply an edge delta to a normalized edge table; returns the merged
    table (pinned via eager localCheckpoint, like a freshly loaded graph).

    ``delta`` columns: ``op`` ∈ {add, del, upd, delv}, ``src``, ``dst``,
    ``weight`` (required for add/upd when the base is weighted). ``del``
    removes every parallel copy of (src, dst); ``delv`` removes every edge
    incident to the vertex in ``src``. Deltas are assumed small relative
    to the base (the reference's in-place Mutate makes the same
    assumption); each delta set joins broadcast-or-hash as Catalyst
    chooses.

    The merged result is row-identical to rebuilding from the mutated
    edge list (pytest-pinned equivalence, test_round6_ops.py), but the
    derivation is shuffle-free and unaffected prepared layouts carry over
    — see module docstring for the dependency classification.
    """
    if "op" not in delta.columns:
        raise ValueError("delta needs an 'op' column (add|del|upd|delv)")
    ops = {r["op"] for r in delta.select("op").distinct().collect()}
    unknown = ops - set(MUTATION_OPS)
    if unknown:
        raise ValueError(f"unknown mutation ops: {sorted(unknown)}")
    has_w = "weight" in base_edges.columns
    if "upd" in ops and not has_w:
        raise ValueError("weight updates on an unweighted edge table")

    cols = ["src", "dst"] + (["weight"] if has_w else [])
    merged = base_edges.select(*cols)
    if "delv" in ops:
        vids = delta.where(F.col("op") == "delv").select(
            F.col("src").alias("vid")
        ).dropDuplicates()
        merged = (
            merged.join(vids.withColumnRenamed("vid", "src"), "src", "left_anti")
            .join(vids.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            .select(*cols)
        )
    if "del" in ops:
        dels = delta.where(F.col("op") == "del").select("src", "dst").dropDuplicates()
        merged = merged.join(dels, ["src", "dst"], "left_anti")
    if "upd" in ops:
        upds = (
            delta.where(F.col("op") == "upd")
            .select("src", "dst", F.col("weight").alias("_nw"))
            .dropDuplicates(["src", "dst"])
        )
        merged = merged.join(upds, ["src", "dst"], "left").select(
            "src", "dst", F.coalesce("_nw", "weight").alias("weight")
        )
    if "add" in ops:
        adds = delta.where(F.col("op") == "add")
        w = (F.col("weight") if "weight" in delta.columns else F.lit(1.0)).alias(
            "weight"
        )
        adds = adds.select("src", "dst", w) if has_w else adds.select("src", "dst")
        merged = merged.unionByName(adds)
    merged = merged.localCheckpoint(eager=True)

    topo_changed = bool(ops & {"add", "del", "delv"})
    carried: list[tuple] = []
    base_cache = getattr(base_edges, _PREP_CACHE_ATTR, None)
    if base_cache and not topo_changed:
        mcache = _prep_cache(merged)  # also registers the drop finalizer
        for key, val in list(base_cache.items()):
            if _weight_dependent(key):
                continue
            _prep_put(mcache, key, val, owned=False)
            carried.append(key)
        stats = getattr(base_edges, _DEGREE_STATS_ATTR, None)
        if stats is not None:  # degrees are weight-invariant
            setattr(merged, _DEGREE_STATS_ATTR, dict(stats))
        # the base must outlive the merged table: carried layouts' blocks
        # are owned (and drop-finalized) by the base's cache
        merged._lgls_mutation_base = base_edges
    bounds = getattr(base_edges, _BOUNDS_CACHE_ATTR, None)
    if bounds is not None:  # valid either way — layout choice, not semantics
        setattr(merged, _BOUNDS_CACHE_ATTR, dict(bounds))
    merged._lgls_carried_layouts = tuple(carried)
    return merged
