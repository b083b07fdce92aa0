"""Round-7: targeted layout re-prepare under topology deltas
(VERDICT r6 task 4) and vertex-data mutation parity (task 5).

The reference's ``MutableEdgecutFragment::Mutate``
(mutable_edgecut_fragment.h:191-260) patches only the CSR segments a
delta touches. The Spark analog (mutation.py): ``merge_edges`` registers
a PENDING patch thunk per prepared layout that derives the new layout
from the base's pinned layout — broadcast anti-joins for removals, a
delta-sized touched-pair recompute from the merged table for
additions/updates — instead of a full O(E) rebuild. Every test here pins
patched layouts row-identical to a from-scratch build on an equivalent
fresh edge table.
"""

from __future__ import annotations

import pytest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _fresh_copy(spark, merged):
    """A brand-new edge table with the merged table's exact rows — the
    from-scratch rebuild target the patched layouts must match."""
    return spark.createDataFrame(merged.collect(), merged.schema)


MIXED_DELTA = [
    # touches every op kind; exercises parallel adds, reverse-orientation
    # adds, self-loop adds, and an upd on the orientation the base does
    # NOT store (must be a no-op, exactly like the merged table)
    ("add", 1, 6, 0.3),     # brand-new pair (new vertex 6)
    ("add", 1, 2, 5.0),     # parallel copy of an existing pair
    ("add", 1, 2, 0.2),     # second parallel copy, lower weight
    ("add", 3, 2, 0.7),     # reverse orientation of stored (2, 3)
    ("add", 4, 4, 1.0),     # self-loop
    ("del", 3, 4, 0.0),     # removes every parallel copy of (3, 4)
    ("del", 2, 1, 0.0),     # reverse of stored (1, 2): no stored copy of
                            # this orientation, so the table keeps (1, 2) —
                            # undirected layouts must keep the pair's
                            # doubled rows too (the hypothesis-found r7
                            # bug, here exercised on EVERY layout kind
                            # including pie and the cogroup kernel)
    ("delv", 5, 0, 0.0),    # removes every edge incident to vertex 5
    ("upd", 2, 3, 9.0),     # weight update on a stored pair
    ("upd", 4, 1, 9.9),     # reverse of stored (1, 4): must not match
]

BASE_PAIRS = [
    (1, 2, 1.0),
    (2, 3, 2.0),
    (3, 4, 1.5),
    (3, 4, 4.0),   # parallel copy
    (2, 5, 4.0),
    (5, 1, 2.5),
    (1, 4, 0.9),
]


def _mutated_graph(spark, directed):
    from tests.conftest import make_edges, make_vertices
    from libgrape_lite_spark.mutation import merge_edges
    from libgrape_lite_spark.plans.kernels import prepare_graph

    base = make_edges(spark, BASE_PAIRS)
    v = make_vertices(spark, range(1, 7))
    prepare_graph(v, base, num_fragments=4, directed=directed, kernel=True)
    delta = spark.createDataFrame(
        MIXED_DELTA, "op string, src long, dst long, weight double"
    )
    merged = merge_edges(base, delta)
    return v, base, merged


@pytest.mark.parametrize("directed", [False, True])
def test_patched_layouts_match_full_rebuild(spark, directed):
    """Every pending-patched layout must be row-identical (multiset — the
    gather layouts keep parallel copies) to the same builder run from
    scratch on a fresh table with the merged rows."""
    from libgrape_lite_spark.plans.kernels import (
        _PREP_CACHE_ATTR,
        dst_kernel_adjacency_table,
        gather_adjacency_table,
        pie_fragment_table,
        push_adjacency_table,
    )

    v, base, merged = _mutated_graph(spark, directed)
    pending = set(merged._lgls_pending_patches)
    kinds = {k[0] for k in pending}
    assert {"push", "gather", "pie", "gather_dst_kernel"} <= kinds
    assert merged._lgls_carried_layouts == ()

    fresh = _fresh_copy(spark, merged)
    pie_key = next(k for k in pending if k[0] == "pie")
    nf, bounds = pie_key[1], list(pie_key[2])

    comparisons = [
        (
            push_adjacency_table(merged, directed=directed, weighted=False),
            push_adjacency_table(fresh, directed=directed, weighted=False),
        ),
        (
            push_adjacency_table(merged, directed=directed, weighted=True),
            push_adjacency_table(fresh, directed=directed, weighted=True),
        ),
        (
            gather_adjacency_table(merged, "src", directed),
            gather_adjacency_table(fresh, "src", directed),
        ),
        (
            gather_adjacency_table(merged, "dst", directed),
            gather_adjacency_table(fresh, "dst", directed),
        ),
        (
            pie_fragment_table(merged, nf, bounds, directed=directed),
            pie_fragment_table(fresh, nf, bounds, directed=directed),
        ),
        (
            dst_kernel_adjacency_table(merged, nf, directed=directed),
            dst_kernel_adjacency_table(fresh, nf, directed=directed),
        ),
    ]
    for patched, rebuilt in comparisons:
        # columns too: a USING-column join can hoist its key to the front
        # (the r7 delv column-swap bug) while by-name rows still agree
        assert patched.columns == rebuilt.columns
        assert _rows(patched) == _rows(rebuilt)

    # consumed patches became OWNED cache entries (fresh checkpoints, not
    # borrowed from the base)
    mcache = getattr(merged, _PREP_CACHE_ATTR)
    assert not mcache.pending
    assert not (set(mcache.keys()) & mcache.borrowed - {("outdeg", directed)})

    from libgrape_lite_spark.plans.kernels import invalidate_prepared

    invalidate_prepared(merged)
    invalidate_prepared(fresh)
    invalidate_prepared(base)


def test_operators_agree_on_patched_graph(spark):
    """End-to-end: every algorithm app over the patched merged graph must
    equal the same app over a from-scratch rebuild."""
    from pyspark.sql import functions as F

    from libgrape_lite_spark.operators import cdlp, lcc, pagerank, sssp, wcc
    from libgrape_lite_spark.plans.kernels import invalidate_prepared

    v, base, merged = _mutated_graph(spark, directed=False)
    fresh = _fresh_copy(spark, merged)

    def pr_rows(e):
        return _rows(
            pagerank(v, e, max_rounds=8).select("id", F.round("rank", 9).alias("r"))
        )

    assert pr_rows(merged) == pr_rows(fresh)
    assert _rows(wcc(v, merged)) == _rows(wcc(v, fresh))
    assert _rows(cdlp(v, merged, max_rounds=5)) == _rows(cdlp(v, fresh, max_rounds=5))
    assert _rows(sssp(v, merged, source=1)) == _rows(sssp(v, fresh, source=1))
    assert _rows(lcc(v, merged)) == _rows(lcc(v, fresh))
    invalidate_prepared(merged)
    invalidate_prepared(fresh)
    invalidate_prepared(base)


def test_pure_removal_delta_patches_without_touched_recompute(spark):
    """A removal delta resolvable by anti-join alone — delv, directed
    del, or undirected del with no reverse-stored survivor — patches
    layouts without the touched-pair recompute, so the base layout's
    partitioning survives un-shuffled."""
    from tests.conftest import make_edges, make_vertices
    from libgrape_lite_spark.mutation import merge_edges
    from libgrape_lite_spark.plans.kernels import (
        invalidate_prepared,
        prepare_graph,
        push_adjacency_table,
    )

    base = make_edges(spark, BASE_PAIRS)
    v = make_vertices(spark, range(1, 7))
    prepare_graph(v, base, num_fragments=4)
    delta = spark.createDataFrame(
        [("delv", 4, 0, 0.0)], "op string, src long, dst long, weight double"
    )
    merged = merge_edges(base, delta)
    assert merged._lgls_pending_patches
    fresh = _fresh_copy(spark, merged)
    assert _rows(push_adjacency_table(merged)) == _rows(push_adjacency_table(fresh))

    base_d = make_edges(spark, BASE_PAIRS)
    prepare_graph(v, base_d, num_fragments=4, directed=True)
    delta_d = spark.createDataFrame(
        [("del", 2, 3, 0.0), ("delv", 4, 0, 0.0)],
        "op string, src long, dst long, weight double",
    )
    merged_d = merge_edges(base_d, delta_d)
    assert merged_d._lgls_pending_patches
    fresh_d = _fresh_copy(spark, merged_d)
    assert _rows(push_adjacency_table(merged_d, directed=True)) == _rows(
        push_adjacency_table(fresh_d, directed=True)
    )
    for t in (merged, fresh, base, merged_d, fresh_d, base_d):
        invalidate_prepared(t)


def test_undirected_del_of_unstored_orientation_keeps_surviving_pair(spark):
    """Hypothesis-found (round 7): on an undirected graph, del (2, 1)
    must NOT empty the doubled layout rows of pair {1, 2} when the base
    stores (1, 2) — only exact-orientation copies leave the table, so the
    patched layout must keep both doubled rows AND re-derive the pair-min
    weight when the deleted orientation held the min."""
    from tests.conftest import make_edges, make_vertices
    from libgrape_lite_spark.mutation import merge_edges
    from libgrape_lite_spark.plans.kernels import (
        gather_adjacency_table,
        invalidate_prepared,
        prepare_graph,
        push_adjacency_table,
    )

    # (2, 1, 0.2) holds the pair min; deleting it must bump {1,2} to 1.0
    base = make_edges(spark, [(1, 2, 1.0), (2, 1, 0.2), (1, 5, 0.5), (4, 2, 2.5)])
    v = make_vertices(spark, range(1, 6))
    prepare_graph(v, base, num_fragments=4)
    delta = spark.createDataFrame(
        [("del", 2, 1, 0.0)], "op string, src long, dst long, weight double"
    )
    merged = merge_edges(base, delta)
    assert _rows(merged) == [(1, 2, 1.0), (1, 5, 0.5), (4, 2, 2.5)]
    fresh = _fresh_copy(spark, merged)
    for build in (
        lambda t: push_adjacency_table(t, weighted=True),
        lambda t: push_adjacency_table(t, weighted=False),
        lambda t: gather_adjacency_table(t, "src", False),
    ):
        assert _rows(build(merged)) == _rows(build(fresh))
    got = {(r["src"], r["dst"]): r["weight"]
           for r in push_adjacency_table(merged, weighted=True).collect()}
    assert got[(1, 2)] == 1.0 and got[(2, 1)] == 1.0
    for t in (merged, fresh, base):
        invalidate_prepared(t)


@pytest.mark.parametrize(
    "delta_rows",
    [
        [("delv", 1, 0, 0.0)],                       # delv only
        [("delv", 1, 0, 0.0), ("add", 2, 6, 0.4)],   # delv + add, no del
    ],
)
def test_delv_only_directed_patch_preserves_column_order(spark, delta_rows):
    """Pinned regression (judge-found, round 7): a delta with delv but no
    del rows used to come back with patched layouts column-swapped to
    (dst, src, ...) — the second single-key anti-join in _apply_removals
    hoisted "dst" to the front of the schema. By-name access hid it; this
    test compares schema AND positional rows against a fresh rebuild on
    every layout kind, directed (the undirected case is swap-invariant by
    symmetry, and a paired del's list-key join restores order — the two
    coincidences that hid the bug)."""
    from libgrape_lite_spark.mutation import merge_edges
    from libgrape_lite_spark.plans.kernels import (
        dst_kernel_adjacency_table,
        gather_adjacency_table,
        invalidate_prepared,
        pie_fragment_table,
        prepare_graph,
        push_adjacency_table,
    )
    from tests.conftest import make_edges, make_vertices

    base = make_edges(spark, [(1, 1, 0.5), (2, 3, 0.5), (3, 4, 1.5), (4, 2, 2.0)])
    v = make_vertices(spark, range(1, 7))
    prepare_graph(v, base, num_fragments=4, directed=True, kernel=True)
    delta = spark.createDataFrame(
        delta_rows, "op string, src long, dst long, weight double"
    )
    merged = merge_edges(base, delta)
    assert merged._lgls_pending_patches
    fresh = _fresh_copy(spark, merged)
    pie_key = next(k for k in merged._lgls_pending_patches if k[0] == "pie")
    nf, bounds = pie_key[1], list(pie_key[2])
    for build in (
        lambda t: push_adjacency_table(t, directed=True, weighted=False),
        lambda t: push_adjacency_table(t, directed=True, weighted=True),
        lambda t: gather_adjacency_table(t, "src", True),
        lambda t: gather_adjacency_table(t, "dst", True),
        lambda t: pie_fragment_table(t, nf, bounds, directed=True),
        lambda t: dst_kernel_adjacency_table(t, nf, directed=True),
    ):
        patched, rebuilt = build(merged), build(fresh)
        assert patched.columns == rebuilt.columns
        # positional tuples — by-name access would mask a schema swap
        assert sorted(tuple(r) for r in patched.collect()) == sorted(
            tuple(r) for r in rebuilt.collect()
        )
    for t in (merged, fresh, base):
        invalidate_prepared(t)


def test_weight_only_delta_patches_weighted_layouts(spark):
    """r6 carried topology layouts across weight-only deltas but rebuilt
    PIE + weighted push from scratch; r7 patches them too."""
    from tests.conftest import make_edges, make_vertices
    from libgrape_lite_spark.mutation import merge_edges
    from libgrape_lite_spark.operators import sssp
    from libgrape_lite_spark.plans.kernels import invalidate_prepared, prepare_graph

    base = make_edges(spark, BASE_PAIRS)
    v = make_vertices(spark, range(1, 7))
    prepare_graph(v, base, num_fragments=4)
    delta = spark.createDataFrame(
        [("upd", 2, 3, 0.1), ("upd", 5, 1, 7.0)],
        "op string, src long, dst long, weight double",
    )
    merged = merge_edges(base, delta)
    pend_kinds = {k[0] for k in merged._lgls_pending_patches}
    assert "pie" in pend_kinds
    assert ("push", False, True) in set(merged._lgls_pending_patches)
    carried_kinds = {k[0] for k in merged._lgls_carried_layouts}
    assert {"push", "gather"} <= carried_kinds  # topology layouts still carry

    fresh = _fresh_copy(spark, merged)
    assert _rows(sssp(v, merged, source=1)) == _rows(sssp(v, fresh, source=1))
    invalidate_prepared(merged)
    invalidate_prepared(fresh)
    invalidate_prepared(base)


def test_merge_vertices_upsert_update_remove(spark):
    """Vertex-data mutation parity (VERDICT r6 task 5): addv upserts
    (existing id's vdata replaced, new id appended), updv replaces vdata
    for existing ids only, delv removes — mirroring Mutate's
    vertices_to_add / vertices_to_update / vertices_to_remove
    (mutable_edgecut_fragment.h:191-236)."""
    from libgrape_lite_spark.mutation import merge_vertices

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, oid string"
    )
    delta = spark.createDataFrame(
        [
            ("addv", 5, "e"),      # new vertex
            ("addv", 2, "B"),      # existing id → vdata overwritten
            ("updv", 3, "C"),      # vdata update
            ("updv", 99, "zzz"),   # absent id → ignored
            ("delv", 4, None),     # removed
        ],
        "op string, id long, oid string",
    )
    merged = merge_vertices(base, delta)
    assert _rows(merged) == [(1, "a"), (2, "B"), (3, "C"), (5, "e")]


def test_merge_vertices_id_only_and_validation(spark):
    """An id-only vertex table (no vdata) supports addv/delv; updv with
    missing vdata columns and unknown ops raise."""
    from tests.conftest import make_vertices
    from libgrape_lite_spark.mutation import merge_vertices

    base = make_vertices(spark, [1, 2, 3])
    delta = spark.createDataFrame(
        [("addv", 4), ("addv", 2), ("delv", 1)], "op string, id long"
    )
    merged = merge_vertices(base, delta)
    assert _rows(merged) == [(2,), (3,), (4,)]

    with pytest.raises(ValueError, match="unknown vertex mutation ops"):
        merge_vertices(base, spark.createDataFrame([("zap", 1)], "op string, id long"))
    vbase = spark.createDataFrame([(1, "a")], "id long, oid string")
    with pytest.raises(ValueError, match="lacks vdata columns"):
        merge_vertices(vbase, spark.createDataFrame([("updv", 1)], "op string, id long"))


def test_merged_vertices_drive_operators(spark):
    """A vertex added via merge_vertices participates in algorithms
    exactly like a loaded one (isolated vertex → its own wcc component,
    degree 0 → PageRank dangling mass)."""
    from tests.conftest import make_edges, make_vertices
    from libgrape_lite_spark.mutation import merge_vertices
    from libgrape_lite_spark.operators import wcc
    from libgrape_lite_spark.plans.kernels import invalidate_prepared

    edges = make_edges(spark, [(1, 2, 1.0), (2, 3, 1.0)])
    base_v = make_vertices(spark, [1, 2, 3])
    delta = spark.createDataFrame([("addv", 7)], "op string, id long")
    v2 = merge_vertices(base_v, delta)
    comp = {r["id"]: r["comp"] for r in wcc(v2, edges).collect()}
    assert comp[7] == 7  # isolated → own component
    assert comp[1] == comp[2] == comp[3]
    invalidate_prepared(edges)


def test_mutate_single_call_routes_both_tables(spark):
    """``mutate`` is the literal one-call Mutate shape
    (mutable_edgecut_fragment.h:191): one delta mixing vertex and edge
    ops applied to both tables, with ``delv`` routed to BOTH — vertex row
    dropped AND incident edges removed, like vertices_to_remove."""
    from tests.conftest import make_edges
    from libgrape_lite_spark.mutation import mutate
    from libgrape_lite_spark.plans.kernels import invalidate_prepared

    base_v = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")], "id long, oid string"
    )
    base_e = make_edges(spark, BASE_PAIRS)
    delta = spark.createDataFrame(
        [
            ("addv", 6, "f", None, None, None),
            ("updv", 2, "B", None, None, None),
            ("delv", 5, None, None, None, None),
            ("add", None, None, 1, 6, 0.3),
            ("del", None, None, 3, 4, None),
            ("upd", None, None, 2, 3, 9.0),
        ],
        "op string, id long, oid string, src long, dst long, weight double",
    )
    v2, e2 = mutate(base_v, base_e, delta)
    assert _rows(v2) == [(1, "a"), (2, "B"), (3, "c"), (4, "d"), (6, "f")]
    # delv 5 removed (2,5) and (5,1); del removed both parallel (3,4);
    # upd rewrote (2,3); add appended (1,6)
    assert _rows(e2) == [(1, 2, 1.0), (1, 4, 0.9), (1, 6, 0.3), (2, 3, 9.0)]
    invalidate_prepared(base_e)
    invalidate_prepared(e2)


def test_mutate_untouched_side_is_returned_unchanged(spark):
    """A side with no ops for it comes back as the SAME object — prepared
    layouts and pins untouched."""
    from tests.conftest import make_edges, make_vertices
    from libgrape_lite_spark.mutation import mutate
    from libgrape_lite_spark.plans.kernels import invalidate_prepared

    base_v = make_vertices(spark, [1, 2, 3])
    base_e = make_edges(spark, [(1, 2, 1.0), (2, 3, 2.0)])
    v2, e2 = mutate(
        base_v,
        base_e,
        spark.createDataFrame(
            [("add", 3, 1, 0.5)], "op string, src long, dst long, weight double"
        ),
    )
    assert v2 is base_v
    assert _rows(e2) == [(1, 2, 1.0), (2, 3, 2.0), (3, 1, 0.5)]
    v3, e3 = mutate(
        base_v, base_e, spark.createDataFrame([("addv", 9)], "op string, id long")
    )
    assert e3 is base_e
    assert _rows(v3) == [(1,), (2,), (3,), (9,)]
    with pytest.raises(ValueError, match="unknown mutation ops"):
        mutate(base_v, base_e, spark.createDataFrame([("zap", 1)], "op string, id long"))
    with pytest.raises(ValueError, match="need an 'id' column"):
        mutate(
            base_v,
            base_e,
            spark.createDataFrame([("delv", 1)], "op string, src long"),
        )
    invalidate_prepared(base_e)
    invalidate_prepared(e2)


def test_patch_falls_back_to_rebuild_when_base_layout_released(spark):
    """If the base's pinned layout is gone by the time the pending thunk
    runs (invalidate/LRU), cached_prepared falls back to the full build —
    correctness is never hostage to the patch path."""
    from tests.conftest import make_edges, make_vertices
    from libgrape_lite_spark.mutation import merge_edges
    from libgrape_lite_spark.plans.kernels import (
        invalidate_prepared,
        prepare_graph,
        push_adjacency_table,
    )

    base = make_edges(spark, BASE_PAIRS)
    v = make_vertices(spark, range(1, 7))
    prepare_graph(v, base, num_fragments=4)
    delta = spark.createDataFrame(
        [("add", 1, 6, 0.3)], "op string, src long, dst long, weight double"
    )
    merged = merge_edges(base, delta)
    assert merged._lgls_pending_patches
    invalidate_prepared(base)  # thunks' inputs vanish before first use
    fresh = _fresh_copy(spark, merged)
    assert _rows(push_adjacency_table(merged)) == _rows(push_adjacency_table(fresh))
    invalidate_prepared(merged)
    invalidate_prepared(fresh)
