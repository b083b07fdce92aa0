"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 over the
driver's parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent ANSI
SQL. The graph queries run on the transcript-shaped table derived
deterministically from ``events`` (see libgrape_lite_spark/sources/events.py)
so both engines compute over identical input.

Column names and types are aligned pairwise; floating-point outputs are
rounded identically on both sides so order-insensitive value-hashes match.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

PR_ROUNDS = 10
CDLP_ROUNDS = 10
WCC_JUMP_ROUNDS = 10
BFS_CAP = 120
SOURCE_OID = "conv_0:0"
JACCARD_N = 2
JACCARD_TAU = 0.35
JACCARD_DF_CAP = 32  # shingle document-frequency cap (bounds the self-join)
EMB_LSH_PLANES = 8
EMB_LSH_TABLES = 8
EMB_LSH_MULTIPROBE = 1

# --------------------------------------------------------------------------
# shared Spark-side graph construction (cached per sf_dir within a session)
# --------------------------------------------------------------------------
_GRAPH_CACHE: dict = {}


def _graph(spark: SparkSession, sf_dir: str):
    key = (id(spark.sparkContext), sf_dir)
    if key not in _GRAPH_CACHE:
        from libgrape_lite_spark.functions.edges import build_graph_from_transcripts
        from libgrape_lite_spark.sources.events import events_to_transcripts

        t = events_to_transcripts(spark, sf_dir)
        vertices, edges = build_graph_from_transcripts(t)
        _GRAPH_CACHE[key] = (
            vertices.localCheckpoint(eager=True),
            edges.localCheckpoint(eager=True),
        )
    return _GRAPH_CACHE[key]


def _with_oid(result: DataFrame, vertices: DataFrame, value_cols: list[str]) -> DataFrame:
    return result.join(vertices, "id").select("oid", *value_cols)


def _oid_of(vertices: DataFrame, label_col: str, out_name: str) -> DataFrame:
    """map a dense-id-valued column back to its oid string."""
    d = vertices.select(F.col("id").alias(label_col), F.col("oid").alias(out_name))
    return d


# --------------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------------
def _q_transcripts(spark, sf_dir):
    from libgrape_lite_spark.sources.events import events_to_transcripts

    t = events_to_transcripts(spark, sf_dir)
    return t.select("conv_id", "turn_idx", "role", "tool", "text")


def _q_edges(spark, sf_dir):
    from libgrape_lite_spark.functions.edges import derive_edges
    from libgrape_lite_spark.sources.events import events_to_transcripts

    return derive_edges(events_to_transcripts(spark, sf_dir)).select(
        "src_oid", "dst_oid", "weight", "etype"
    )


def _q_degrees(spark, sf_dir):
    from libgrape_lite_spark.functions.edges import out_degrees, undirected

    vertices, edges = _graph(spark, sf_dir)
    deg = out_degrees(undirected(edges), vertices)
    return _with_oid(deg, vertices, ["degree"]).select(
        "oid", F.col("degree").cast("long").alias("degree")
    )


def _q_wcc(spark, sf_dir):
    from libgrape_lite_spark.operators import wcc

    vertices, edges = _graph(spark, sf_dir)
    comp = wcc(vertices, edges)
    return (
        comp.join(vertices, "id")
        .join(_oid_of(vertices, "comp", "comp_oid"), "comp")
        .select("oid", "comp_oid")
    )


def _q_wcc_twostar(spark, sf_dir):
    """Large-star/small-star WCC (diameter-independent rounds) — same
    fixpoint as hash-min, checked against the same recursive SQL oracle."""
    from libgrape_lite_spark.operators import wcc

    vertices, edges = _graph(spark, sf_dir)
    comp = wcc(vertices, edges, impl="twostar")
    return (
        comp.join(vertices, "id")
        .join(_oid_of(vertices, "comp", "comp_oid"), "comp")
        .select("oid", "comp_oid")
    )


def _q_pagerank(spark, sf_dir, directed=False):
    from libgrape_lite_spark.operators import pagerank

    vertices, edges = _graph(spark, sf_dir)
    pr = pagerank(vertices, edges, damping=0.85, max_rounds=PR_ROUNDS, directed=directed)
    return _with_oid(pr, vertices, ["rank"]).select("oid", F.round("rank", 8).alias("rank"))


def _q_pagerank_local(spark, sf_dir):
    from libgrape_lite_spark.operators import pagerank_local

    vertices, edges = _graph(spark, sf_dir)
    pr = pagerank_local(vertices, edges, damping=0.85, max_rounds=PR_ROUNDS)
    return _with_oid(pr, vertices, ["rank"]).select("oid", F.round("rank", 8).alias("rank"))


def _q_cdlp(spark, sf_dir):
    from libgrape_lite_spark.operators import cdlp

    vertices, edges = _graph(spark, sf_dir)
    lab = cdlp(vertices, edges, max_rounds=CDLP_ROUNDS)
    return (
        lab.join(vertices, "id")
        .join(_oid_of(vertices, "label", "label_oid"), "label")
        .select("oid", "label_oid")
    )


def _source_id(spark, vertices) -> int:
    return vertices.where(F.col("oid") == SOURCE_OID).collect()[0]["id"]


def _q_bfs(spark, sf_dir, directed=False):
    from libgrape_lite_spark.operators import bfs
    from libgrape_lite_spark.operators.bfs import INT64_MAX

    vertices, edges = _graph(spark, sf_dir)
    d = bfs(vertices, edges, source=_source_id(spark, vertices), directed=directed)
    return _with_oid(d.where(F.col("depth") < INT64_MAX), vertices, ["depth"])


def _q_sssp(spark, sf_dir, directed=False):
    from libgrape_lite_spark.operators import sssp

    vertices, edges = _graph(spark, sf_dir)
    d = sssp(vertices, edges, source=_source_id(spark, vertices), directed=directed)
    return _with_oid(
        d.where(~F.isnan("dist") & (F.col("dist") != float("inf"))), vertices, ["dist"]
    ).select("oid", F.round("dist", 6).alias("dist"))


def _q_lcc(spark, sf_dir):
    from libgrape_lite_spark.operators import lcc

    vertices, edges = _graph(spark, sf_dir)
    return _with_oid(lcc(vertices, edges), vertices, ["lcc"]).select(
        "oid", F.round("lcc", 8).alias("lcc")
    )


def _q_triangles(spark, sf_dir):
    from libgrape_lite_spark.operators.lcc import triangle_counts

    vertices, edges = _graph(spark, sf_dir)
    tri = triangle_counts(vertices, edges)
    out = vertices.join(tri, "id", "left").select(
        "oid", F.coalesce("tri", F.lit(0)).cast("long").alias("tri")
    )
    return out


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _q_dedup_exact(spark, sf_dir):
    from libgrape_lite_spark.operators.dedup import dedup_exact

    return dedup_exact(_docs(spark, sf_dir)).select(
        "fp", F.col("n_copies").cast("long").alias("n_copies"), "keep_id"
    )


def _q_minhash_bands(spark, sf_dir):
    from libgrape_lite_spark.functions.similarity import minhash_bands, minhash_signatures

    sig = minhash_signatures(_docs(spark, sf_dir), "doc_id", "text", 16, 3)
    return sig.select(
        F.col("id").alias("doc_id"), F.explode(minhash_bands(F.col("sig"), 4, 4)).alias("bk")
    ).select("doc_id", F.col("bk.band").cast("long").alias("band"), F.col("bk.key").alias("key"))


def _q_jaccard_pairs(spark, sf_dir):
    from libgrape_lite_spark.functions.similarity import jaccard_pairs

    return jaccard_pairs(
        _docs(spark, sf_dir), shingle_n=JACCARD_N, threshold=JACCARD_TAU,
        df_cap=JACCARD_DF_CAP,
    ).select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def _q_dedup_minhash(spark, sf_dir):
    from libgrape_lite_spark.operators.dedup import dedup_minhash

    return dedup_minhash(
        _docs(spark, sf_dir), threshold=0.5, num_hashes=16, bands=4, shingle_n=3
    ).select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def _q_simhash(spark, sf_dir):
    from libgrape_lite_spark.functions.similarity import simhash16

    return _docs(spark, sf_dir).select("doc_id", simhash16(F.col("text")).alias("simhash"))


def _q_dedup_simhash(spark, sf_dir):
    """Banded SimHash near-dup pairs (operators/dedup.py::dedup_simhash).
    16-bit signatures here so the DuckDB mirror shares the simhash
    oracle's bit arithmetic; bands = max_hamming+1 = 3 (the pigeonhole-
    complete round-5 default — the SQL reproduces the same [6,5,5]-bit
    band split and the exact bit_count verify)."""
    from libgrape_lite_spark.operators.dedup import dedup_simhash

    return dedup_simhash(_docs(spark, sf_dir), max_hamming=2, bits=16).select(
        "a", "b", F.col("hamming").cast("long").alias("hamming")
    )


def _q_embedding_topk(spark, sf_dir):
    from libgrape_lite_spark.operators.knn import knn_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = knn_bruteforce(emb, emb.where(F.col("vec_id") < 10), k=5)
    return res.select(
        "query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank")
    )


def _q_embedding_topk_lsh(spark, sf_dir):
    from libgrape_lite_spark.operators.knn import knn_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = knn_lsh(emb, emb.where(F.col("vec_id") < 10), k=5, n_planes=8, n_tables=4)
    return res.select(
        "query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank")
    )


def _q_knn_ivf(spark, sf_dir):
    from libgrape_lite_spark.operators.knn import knn_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = knn_ivf(
        emb, emb.where(F.col("vec_id") < 10),
        k=5, n_centroids=16, n_probe=4, kmeans_iters=3,
    )
    return res.select(
        "query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank")
    )


def _q_embedding_dedup(spark, sf_dir):
    from libgrape_lite_spark.operators.dedup import dedup_embedding_cosine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return dedup_embedding_cosine(
        emb,
        threshold=0.4,
        method="lsh",
        n_planes=EMB_LSH_PLANES,
        n_tables=EMB_LSH_TABLES,
        multiprobe=EMB_LSH_MULTIPROBE,
    ).select("a", "b", F.round("cos", 6).alias("cos"))


def _q_text_stats(spark, sf_dir):
    # one-pass table form: tokenizes each doc once instead of ~13 times
    # (functions/text.py::text_stats_table; values bit-identical to the
    # per-column composition, pytest-pinned)
    from libgrape_lite_spark.functions.text import text_stats_table

    return text_stats_table(_docs(spark, sf_dir))


def _q_edge_mutation(spark, sf_dir):
    """Incremental mutation (MutableEdgecutFragment::Mutate parity,
    mutable_edgecut_fragment.h:191) as an oracle-gated query: derive a
    DETERMINISTIC delta from the edge table itself — delete the 50
    (src, dst)-smallest edges, bump the weight of the next 50, add 25
    synthetic edges — apply it with mutation.merge_edges, and return the
    merged rows. The DuckDB mirror applies the same delta with plain SQL
    set operations; (src_oid, dst_oid) pairs are globally unique across
    etypes (prefix-disjoint oid namespaces), so the rank order is total
    and both engines pick identical delta rows."""
    from pyspark.sql.window import Window

    from libgrape_lite_spark.mutation import merge_edges

    base = _q_edges(spark, sf_dir).select(
        F.col("src_oid").alias("src"), F.col("dst_oid").alias("dst"), "weight"
    )
    # deterministic "k smallest" WITHOUT a global single-partition window
    # (WindowExec over the whole edge table is the one shape that cannot
    # scale): a distributed TopK (orderBy + limit = TakeOrderedAndProject)
    # collects only the 100-row head, and the rank window runs over THAT
    ranked = base.orderBy("src", "dst").limit(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("src", "dst"))
    )
    dels = ranked.where(F.col("rn") <= 50).select(
        F.lit("del").alias("op"), "src", "dst", "weight"
    )
    upds = ranked.where((F.col("rn") > 50) & (F.col("rn") <= 100)).select(
        F.lit("upd").alias("op"), "src", "dst", (F.col("weight") + 1.0).alias("weight")
    )
    adds = spark.range(25).select(
        F.lit("add").alias("op"),
        F.concat(F.lit("mut::"), F.col("id")).alias("src"),
        F.concat(F.lit("mutdst::"), F.col("id")).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    delta = dels.unionByName(upds).unionByName(adds)
    from libgrape_lite_spark import transients

    # the merged table is pinned (caller-owned, like a loaded graph);
    # register it so the next query's build releases it
    merged = transients.register(merge_edges(base, delta))
    return merged.select("src", "dst", "weight")


def _q_multimodal_bytes(spark, sf_dir):
    d = _docs(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


def _q_vertex_mutation(spark, sf_dir):
    """Vertex-data mutation (Mutation::vertices_to_add/update/remove,
    mutable_edgecut_fragment.h:191-236) as an oracle-gated query: over
    the graph's vertex table keyed by oid with a derived label column,
    remove the 20 oid-smallest vertices, update the labels of the next
    20, UPSERT the next 10 (addv on existing ids — vdata replaced), and
    add 10 synthetic vertices. The DuckDB mirror applies the same delta
    with plain SQL; oid order is total so both engines pick identical
    delta rows."""
    from pyspark.sql.window import Window

    from libgrape_lite_spark import transients
    from libgrape_lite_spark.mutation import merge_vertices

    vertices, _ = _graph(spark, sf_dir)
    v = vertices.select(
        F.col("oid").alias("id"),
        F.split(F.col("oid"), ":").getItem(0).alias("label"),
    )
    # distributed TopK head, then a tiny window over 50 rows (see
    # _q_edge_mutation — no global single-partition WindowExec)
    ranked = v.orderBy("id").limit(50).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    delv = ranked.where("rn <= 20").select(
        F.lit("delv").alias("op"), "id", F.lit(None).cast("string").alias("label")
    )
    updv = ranked.where("rn > 20 AND rn <= 40").select(
        F.lit("updv").alias("op"), "id", F.lit("upd").alias("label")
    )
    upsv = ranked.where("rn > 40 AND rn <= 50").select(
        F.lit("addv").alias("op"), "id", F.lit("upserted").alias("label")
    )
    newv = spark.range(10).select(
        F.lit("addv").alias("op"),
        F.concat(F.lit("newv::"), F.col("id")).alias("id"),
        F.lit("new").alias("label"),
    )
    delta = delv.unionByName(updv).unionByName(upsv).unionByName(newv)
    merged = transients.register(merge_vertices(v, delta))
    return merged.select("id", "label")


def _q_graph_mutation(spark, sf_dir):
    """The combined one-call Mutate (mutation.mutate — the literal
    ``MutableEdgecutFragment::Mutate(Mutation&)`` shape,
    mutable_edgecut_fragment.h:191) as an oracle-gated query: ONE mixed
    delta — delv the 10 oid-smallest vertices (vertex rows AND incident
    edges, like vertices_to_remove), relabel the next 10, add 5 synthetic
    vertices, del the 25 (src, dst)-smallest edges, bump the weight of
    the next 25, add 10 synthetic edges — applied to both tables in one
    call. Result summarizes BOTH merged tables: per surviving vertex, its
    label, merged out-degree and rounded out-weight sum. The DuckDB
    mirror applies the same delta with plain SQL set ops; oid and
    (src, dst) orders are total so both engines pick identical rows."""
    from pyspark.sql.window import Window

    from libgrape_lite_spark import transients
    from libgrape_lite_spark.mutation import mutate

    vertices, _ = _graph(spark, sf_dir)
    v = vertices.select(
        F.col("oid").alias("id"),
        F.split(F.col("oid"), ":").getItem(0).alias("label"),
    )
    e = _q_edges(spark, sf_dir).select(
        F.col("src_oid").alias("src"), F.col("dst_oid").alias("dst"), "weight"
    )
    # distributed TopK heads, then tiny windows (no global WindowExec)
    vr = v.orderBy("id").limit(20).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    er = e.orderBy("src", "dst").limit(50).withColumn(
        "rn", F.row_number().over(Window.orderBy("src", "dst"))
    )
    ns = F.lit(None).cast("string")
    nd = F.lit(None).cast("double")
    delta = (
        vr.where("rn <= 10")
        .select(F.lit("delv").alias("op"), "id", ns.alias("label"),
                ns.alias("src"), ns.alias("dst"), nd.alias("weight"))
        .unionByName(
            vr.where("rn > 10 AND rn <= 20").select(
                F.lit("updv").alias("op"), "id", F.lit("relabeled").alias("label"),
                ns.alias("src"), ns.alias("dst"), nd.alias("weight"))
        )
        .unionByName(
            spark.range(5).select(
                F.lit("addv").alias("op"),
                F.concat(F.lit("mv::"), F.col("id")).alias("id"),
                F.lit("new").alias("label"),
                ns.alias("src"), ns.alias("dst"), nd.alias("weight"))
        )
        .unionByName(
            er.where("rn <= 25").select(
                F.lit("del").alias("op"), ns.alias("id"), ns.alias("label"),
                "src", "dst", "weight")
        )
        .unionByName(
            er.where("rn > 25 AND rn <= 50").select(
                F.lit("upd").alias("op"), ns.alias("id"), ns.alias("label"),
                "src", "dst", (F.col("weight") + 1.0).alias("weight"))
        )
        .unionByName(
            spark.range(10).select(
                F.lit("add").alias("op"), ns.alias("id"), ns.alias("label"),
                F.concat(F.lit("me::"), F.col("id")).alias("src"),
                F.concat(F.lit("medst::"), F.col("id")).alias("dst"),
                F.lit(1.0).alias("weight"))
        )
    )
    v2, e2 = mutate(v, e, delta)
    transients.register(v2)
    transients.register(e2)
    outdeg = e2.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg"), F.sum("weight").alias("wsum")
    )
    return v2.join(outdeg, "id", "left").select(
        "id",
        "label",
        F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"),
        F.round(F.coalesce("wsum", F.lit(0.0)), 6).alias("wsum"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: WCC component sizes on the sf0.001 transcript graph."""
    vertices, edges = _graph(spark, "/root/testdata/sf0.001")
    from libgrape_lite_spark.operators import wcc

    comp = wcc(vertices, edges)
    return (
        comp.join(_oid_of(vertices, "comp", "comp_oid"), "comp")
        .groupBy("comp_oid")
        .agg(F.count(F.lit(1)).alias("size"))
    )


def _fresh_transients(fn):
    """Release the PREVIOUS query's operator-internal localCheckpoint
    blocks before building this one. The driver consumes each query's
    result before building the next, so by the time query N+1's callable
    runs, query N's pinned blocks are dead — without this, a full oracle
    session accumulates every query's checkpointed signature/candidate
    tables on the executors (ADVICE r5; libgrape_lite_spark/transients.py
    documents the measured degradation). Callers that interleave building
    and consuming multiple queries should not use this wrapper — use
    transient_scope() around each consume instead."""

    def wrapped(spark, sf_dir):
        from libgrape_lite_spark.transients import release_transients

        release_transients()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "transcripts_turns": _q_transcripts,
        "edge_derivation": _q_edges,
        "degrees": _q_degrees,
        "wcc": _q_wcc,
        "wcc_twostar": _q_wcc_twostar,
        "pagerank": lambda s, d: _q_pagerank(s, d, directed=False),
        "pagerank_directed": lambda s, d: _q_pagerank(s, d, directed=True),
        "pagerank_local": _q_pagerank_local,
        "cdlp": _q_cdlp,
        "bfs": _q_bfs,
        "bfs_directed": lambda s, d: _q_bfs(s, d, directed=True),
        "sssp": _q_sssp,
        "sssp_directed": lambda s, d: _q_sssp(s, d, directed=True),
        "lcc": _q_lcc,
        "triangle_count": _q_triangles,
        "dedup_exact": _q_dedup_exact,
        "minhash_bands": _q_minhash_bands,
        "ngram_jaccard_pairs": _q_jaccard_pairs,
        "dedup_minhash": _q_dedup_minhash,
        "simhash": _q_simhash,
        "dedup_simhash": _q_dedup_simhash,
        "embedding_topk": _q_embedding_topk,
        "embedding_topk_lsh": _q_embedding_topk_lsh,
        "knn_ivf": _q_knn_ivf,
        "embedding_dedup": _q_embedding_dedup,
        "text_stats": _q_text_stats,
        "multimodal_bytes": _q_multimodal_bytes,
        "edge_mutation": _q_edge_mutation,
        "vertex_mutation": _q_vertex_mutation,
        "graph_mutation": _q_graph_mutation,
    }
    # every callable frees the previous query's transient checkpoint
    # blocks (no-op when none are registered — cheap for graph queries)
    return {name: _fresh_transients(fn) for name, fn in base.items()}


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------
_TRANSCRIPTS = """
transcripts AS MATERIALIZED (
  SELECT 'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         event_type AS role,
         props AS text,
         CASE WHEN value >= 10.0 THEN event_type END AS tool,
         ts
  FROM events
)"""

_EDGES = (
    _TRANSCRIPTS
    + """,
reply AS (
  SELECT conv_id || ':' || CAST(turn_idx - 1 AS VARCHAR) AS src_oid,
         conv_id || ':' || CAST(turn_idx AS VARCHAR) AS dst_oid,
         CAST(1.0 AS DOUBLE) AS weight, 'reply' AS etype
  FROM transcripts WHERE turn_idx > 0
),
tool_e AS (
  SELECT conv_id || ':' || CAST(turn_idx AS VARCHAR) AS src_oid,
         'tool::' || tool AS dst_oid, CAST(1.0 AS DOUBLE) AS weight, 'tool' AS etype
  FROM transcripts WHERE tool IS NOT NULL
),
role_e AS (
  SELECT 'role::' || conv_id || '::' || prev_role AS src_oid,
         'role::' || conv_id || '::' || role AS dst_oid,
         CAST(COUNT(*) AS DOUBLE) AS weight, 'role' AS etype
  FROM (SELECT conv_id, role,
               LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
        FROM transcripts)
  WHERE prev_role IS NOT NULL AND prev_role <> role
  GROUP BY 1, 2
),
edges AS MATERIALIZED (
  SELECT * FROM reply UNION ALL SELECT * FROM tool_e UNION ALL SELECT * FROM role_e
),
vertices AS MATERIALIZED (
  SELECT DISTINCT oid FROM (
    SELECT src_oid AS oid FROM edges
    UNION ALL SELECT dst_oid FROM edges
    UNION ALL SELECT conv_id || ':' || CAST(turn_idx AS VARCHAR) FROM transcripts
  )
),
uedges AS MATERIALIZED (
  SELECT src_oid AS s, dst_oid AS d, weight AS w FROM edges
  UNION ALL
  SELECT dst_oid, src_oid, weight FROM edges
)"""
)


def _sql_degrees() -> str:
    return f"""WITH {_EDGES}
SELECT v.oid, CAST(COALESCE(c.c, 0) AS BIGINT) AS degree
FROM vertices v LEFT JOIN (SELECT s AS oid, COUNT(*) AS c FROM uedges GROUP BY 1) c USING (oid)"""


def _sql_wcc() -> str:
    ctes = ["w0 AS MATERIALIZED (SELECT oid, oid AS lab FROM vertices)"]
    prev = "w0"
    for k in range(1, WCC_JUMP_ROUNDS + 1):
        half = f"w{k}h"
        ctes.append(
            f"""{half} AS MATERIALIZED (
  SELECT p.oid, LEAST(p.lab, COALESCE(m.ml, p.lab)) AS lab
  FROM {prev} p LEFT JOIN (
    SELECT u.d AS oid, MIN(q.lab) AS ml FROM uedges u JOIN {prev} q ON q.oid = u.s GROUP BY 1
  ) m USING (oid))"""
        )
        cur = f"w{k}"
        ctes.append(
            f"""{cur} AS MATERIALIZED (
  SELECT a.oid, LEAST(a.lab, b.lab) AS lab FROM {half} a JOIN {half} b ON b.oid = a.lab)"""
        )
        prev = cur
    return f"""WITH {_EDGES},
{','.join(ctes)}
SELECT oid, lab AS comp_oid FROM {prev}"""


def _sql_pagerank(directed: bool) -> str:
    adj = "uedges" if not directed else "(SELECT src_oid AS s, dst_oid AS d, weight AS w FROM edges)"
    ctes = [
        f"""deg AS MATERIALIZED (
  SELECT v.oid, CAST(COALESCE(c.c, 0) AS DOUBLE) AS deg
  FROM vertices v LEFT JOIN (SELECT s AS oid, COUNT(*) AS c FROM {adj} GROUP BY 1) c USING (oid))""",
        """s0 AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN deg = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS nd
  FROM deg)""",
        """sc0 AS (SELECT n, nd, nd / n AS ds FROM s0)""",
        """pr0 AS MATERIALIZED (
  SELECT d.oid, d.deg, CASE WHEN d.deg > 0 THEN 1.0 / s.n / d.deg ELSE 1.0 / s.n END AS r
  FROM deg d, s0 s)""",
    ]
    prev_s, prev_p = "sc0", "pr0"
    for k in range(1, PR_ROUNDS + 1):
        sk, pk = f"sc{k}", f"pr{k}"
        ctes.append(
            f"""{sk} AS MATERIALIZED (
  SELECT n, nd, (0.15 / n + 0.85 * ds / n) * nd AS ds, 0.15 / n + 0.85 * ds / n AS base
  FROM {prev_s})"""
        )
        ctes.append(
            f"""{pk} AS MATERIALIZED (
  SELECT p.oid, p.deg,
         CASE WHEN p.deg > 0 THEN (0.85 * COALESCE(g.s, 0) + sk.base) / p.deg
              ELSE sk.base END AS r
  FROM {prev_p} p
  LEFT JOIN (SELECT u.d AS oid, SUM(q.r) AS s FROM {adj} u JOIN {prev_p} q ON q.oid = u.s GROUP BY 1) g
    USING (oid), {sk} sk)"""
        )
        prev_s, prev_p = sk, pk
    return f"""WITH {_EDGES},
{','.join(ctes)}
SELECT oid, ROUND(CASE WHEN deg > 0 THEN r * deg ELSE r END, 8) AS rank FROM {prev_p}"""


def _sql_pagerank_local() -> str:
    """pagerank_local mirrored (pagerank_local.h): r0 = outdeg>0 ? 1/outdeg
    : 1; per round r' = 1 - d + d·Σ_{(u,w)∈E} r[w] over the OUT-adjacency,
    divided by outdeg on every round except the last; no dangling mass."""
    ctes = [
        """deg AS MATERIALIZED (
  SELECT v.oid, CAST(COALESCE(c.c, 0) AS DOUBLE) AS deg
  FROM vertices v LEFT JOIN (SELECT s AS oid, COUNT(*) AS c FROM uedges GROUP BY 1) c USING (oid))""",
        """pl0 AS MATERIALIZED (
  SELECT oid, deg, CASE WHEN deg > 0 THEN 1.0 / deg ELSE 1.0 END AS r FROM deg)""",
    ]
    prev = "pl0"
    for k in range(1, PR_ROUNDS + 1):
        div = "" if k == PR_ROUNDS else "CASE WHEN p.deg > 0 THEN 1.0 / p.deg ELSE 1.0 END * "
        ctes.append(
            f"""pl{k} AS MATERIALIZED (
  SELECT p.oid, p.deg,
         {div}(1 - 0.85 + 0.85 * COALESCE(g.s, 0)) AS r
  FROM {prev} p
  LEFT JOIN (SELECT u.s AS oid, SUM(q.r) AS s FROM uedges u JOIN {prev} q ON q.oid = u.d GROUP BY 1) g
    USING (oid))"""
        )
        prev = f"pl{k}"
    return f"""WITH {_EDGES},
{','.join(ctes)}
SELECT oid, ROUND(r, 8) AS rank FROM {prev}"""


def _sql_cdlp() -> str:
    ctes = ["l0 AS MATERIALIZED (SELECT oid, oid AS lab FROM vertices)"]
    prev = "l0"
    for k in range(1, CDLP_ROUNDS + 1):
        cur = f"l{k}"
        ctes.append(
            f"""{cur} AS MATERIALIZED (
  SELECT p.oid, COALESCE(t.newlab, p.lab) AS lab
  FROM {prev} p LEFT JOIN (
    SELECT oid, MIN(lab) AS newlab FROM (
      SELECT c.*, MAX(c.c) OVER (PARTITION BY c.oid) AS mc FROM (
        SELECT u.s AS oid, q.lab, COUNT(*) AS c
        FROM uedges u JOIN {prev} q ON q.oid = u.d GROUP BY 1, 2
      ) c
    ) WHERE c = mc GROUP BY oid
  ) t USING (oid))"""
        )
        prev = cur
    return f"""WITH {_EDGES},
{','.join(ctes)}
SELECT oid, lab AS label_oid FROM {prev}"""


def _sql_bfs(directed: bool = False) -> str:
    adj = "(SELECT src_oid AS s, dst_oid AS d FROM edges)" if directed else "uedges"
    return f"""WITH RECURSIVE {_EDGES},
walk (oid, depth) AS (
  SELECT '{SOURCE_OID}', 0
  UNION
  SELECT u.d, b.depth + 1 FROM walk b JOIN {adj} u ON u.s = b.oid
  WHERE b.depth < {BFS_CAP}
)
SELECT oid, CAST(MIN(depth) AS BIGINT) AS depth FROM walk GROUP BY oid"""


def _sql_sssp(directed: bool = False) -> str:
    adj = "(SELECT src_oid AS s, dst_oid AS d, weight AS w FROM edges)" if directed else "uedges"
    return f"""WITH RECURSIVE {_EDGES},
walk (oid, dist) AS (
  SELECT '{SOURCE_OID}', CAST(0.0 AS DOUBLE)
  UNION
  SELECT u.d, b.dist + u.w FROM walk b JOIN {adj} u ON u.s = b.oid
  WHERE b.dist + u.w < {BFS_CAP}
)
SELECT oid, ROUND(MIN(dist), 6) AS dist FROM walk GROUP BY oid"""


_LCC_CORE = """
degd AS MATERIALIZED (
  SELECT v.oid, CAST(COALESCE(c.c, 0) AS BIGINT) AS deg
  FROM vertices v LEFT JOIN (SELECT s AS oid, COUNT(*) AS c FROM uedges GROUP BY 1) c USING (oid)),
nbr AS MATERIALIZED (SELECT DISTINCT s, d FROM uedges WHERE s <> d),
ori AS MATERIALIZED (
  SELECT n.s AS u, n.d AS v FROM nbr n
  JOIN degd ds ON ds.oid = n.s JOIN degd dd ON dd.oid = n.d
  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND n.s < n.d)),
tw AS (SELECT o1.u, o1.v, o2.v AS w FROM ori o1 JOIN ori o2 ON o2.u = o1.v),
tr AS MATERIALIZED (SELECT t.u, t.v, t.w FROM tw t JOIN ori o3 ON o3.u = t.u AND o3.v = t.w),
corners AS (
  SELECT u AS oid FROM tr UNION ALL SELECT v FROM tr UNION ALL SELECT w FROM tr),
tcnt AS (SELECT oid, CAST(COUNT(*) AS BIGINT) AS tri FROM corners GROUP BY 1)"""


def _sql_lcc() -> str:
    return f"""WITH {_EDGES},{_LCC_CORE}
SELECT v.oid,
       ROUND(CASE WHEN d.deg >= 2
                  THEN 2.0 * COALESCE(t.tri, 0) / (d.deg * (d.deg - 1.0))
                  ELSE 0.0 END, 8) AS lcc
FROM vertices v JOIN degd d USING (oid) LEFT JOIN tcnt t USING (oid)"""


def _sql_triangles() -> str:
    return f"""WITH {_EDGES},{_LCC_CORE}
SELECT v.oid, COALESCE(t.tri, 0) AS tri
FROM vertices v LEFT JOIN tcnt t USING (oid)"""


_H64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

_TOKS = """
toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS tk
  FROM documents)"""


def _sql_dedup_exact() -> str:
    return """WITH f AS (
  SELECT doc_id, substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 16) AS fp
  FROM documents)
SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_copies, MIN(doc_id) AS keep_id
FROM f GROUP BY fp"""


def _shingle_cte(n: int) -> str:
    parts = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n))
    return (
        _TOKS
        + f""",
shd AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(CASE WHEN len(tk) >= {n}
           THEN [{parts} for i in range(1, len(tk) - {n - 1} + 1)]
           ELSE CAST([] AS VARCHAR[]) END) AS sh
  FROM toks)"""
    )


def _sql_minhash_bands() -> str:
    h = _H64.format(expr="CAST(i AS VARCHAR) || ':' || s")
    bh = _H64.format(expr="array_to_string(sig[b*4+1:b*4+4], ',')")
    return f"""WITH {_shingle_cte(3)},
ex AS (SELECT doc_id, unnest(sh) AS s FROM shd WHERE len(sh) > 0),
hs AS (
  SELECT doc_id, i, MIN({h}) AS h
  FROM ex, (SELECT unnest(range(0, 16)) AS i) r GROUP BY 1, 2),
sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM hs GROUP BY 1)
SELECT doc_id, CAST(b AS BIGINT) AS band, {bh} AS key
FROM sig, (SELECT unnest(range(0, 4)) AS b) t"""


def _sql_jaccard_pairs() -> str:
    # Mirrors the Spark plan's df_cap: Jaccard over shingles with document
    # frequency ≤ cap (set sizes recomputed over surviving shingles).
    return f"""WITH {_shingle_cte(JACCARD_N)},
raw AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM shd),
keep AS (SELECT s FROM (SELECT s, COUNT(*) AS c FROM raw GROUP BY 1) WHERE c <= {JACCARD_DF_CAP}),
capped AS MATERIALIZED (SELECT r.doc_id, r.s FROM raw r JOIN keep USING (s)),
sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY 1),
ex AS MATERIALIZED (SELECT c.doc_id, c.s, z.n_sh FROM capped c JOIN sz z USING (doc_id)),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT a, b, ROUND(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
FROM inter WHERE CAST(i AS DOUBLE) / (na + nb - i) >= {JACCARD_TAU}"""


def _sql_dedup_minhash() -> str:
    """LSH candidates (banded minhash self-join) verified by exact shingle
    Jaccard via list_intersect — mirrors operators/dedup.py::dedup_minhash
    (candidate-bounded verify, no co-shingle self-join)."""
    h = _H64.format(expr="CAST(i AS VARCHAR) || ':' || s")
    bh = _H64.format(expr="array_to_string(sig[b*4+1:b*4+4], ',')")
    return f"""WITH {_shingle_cte(3)},
ex AS (SELECT doc_id, unnest(sh) AS s FROM shd WHERE len(sh) > 0),
hs AS (SELECT doc_id, i, MIN({h}) AS hv FROM ex, (SELECT unnest(range(0, 16)) AS i) r GROUP BY 1, 2),
sig AS (SELECT doc_id, list(hv ORDER BY i) AS sig FROM hs GROUP BY 1),
bands AS (SELECT doc_id, b, {bh} AS key FROM sig, (SELECT unnest(range(0, 4)) AS b) t),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id),
v AS (
  SELECT c.a, c.b, len(list_intersect(sa.sh, sb.sh)) AS i, len(sa.sh) AS na, len(sb.sh) AS nb
  FROM cand c JOIN shd sa ON sa.doc_id = c.a JOIN shd sb ON sb.doc_id = c.b)
SELECT a, b, ROUND(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
FROM v WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5"""


def _sql_simhash() -> str:
    h = _H64.format(expr="t")
    return f"""WITH td AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) AS tk
  FROM documents),
th AS (SELECT doc_id, {h} AS h FROM (SELECT doc_id, unnest(tk) AS t FROM td)),
bits AS (
  SELECT doc_id, j, SUM(((h >> j) & 1) * 2 - 1) AS sgn
  FROM th, (SELECT unnest(range(0, 16)) AS j) r GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(CASE WHEN sgn > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id"""


def _sql_dedup_simhash() -> str:
    """Mirrors operators/dedup.py::dedup_simhash at bits=16, max_hamming=2,
    bands=3: same signature CTE as _sql_simhash, band split [6,5,5] bits
    (divmod(16,3) with the remainder on the first band), pigeonhole
    candidate join, exact bit_count(xor) verify."""
    h = _H64.format(expr="t")
    return f"""WITH td AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) AS tk
  FROM documents),
th AS (SELECT doc_id, {h} AS h FROM (SELECT doc_id, unnest(tk) AS t FROM td)),
bits AS (
  SELECT doc_id, j, SUM(((h >> j) & 1) * 2 - 1) AS sgn
  FROM th, (SELECT unnest(range(0, 16)) AS j) r GROUP BY 1, 2),
sh AS (
  SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS sh
  FROM bits GROUP BY doc_id),
banded AS (
  SELECT doc_id,
         b.band,
         CASE b.band WHEN 0 THEN sh & 63 WHEN 1 THEN (sh >> 6) & 31 ELSE (sh >> 11) & 31 END AS key
  FROM sh, (SELECT unnest(range(0, 3)) AS band) b),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
SELECT c.a, c.b, CAST(bit_count(xor(sa.sh, sb.sh)) AS BIGINT) AS hamming
FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
WHERE bit_count(xor(sa.sh, sb.sh)) <= 2"""


def _sql_embedding_topk() -> str:
    return """WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         ROUND(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cos
  FROM q, c WHERE query_id <> neighbor_id),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s)
SELECT query_id, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5"""


_EMB_DIM = 64  # driver-generated embeddings.parquet dimension (all SFs)


def _planes_values(n_tables: int, n_planes: int) -> str:
    """The deterministic md5 hyperplanes (operators/knn.py:_hyperplanes) as
    SQL VALUES literals — every entry is an exact *.5 double."""
    from libgrape_lite_spark.operators.knn import _hyperplanes

    rows = []
    for t in range(n_tables):
        pl = _hyperplanes(_EMB_DIM, n_planes, t)
        for p in range(n_planes):
            vals = ", ".join(f"{v:.1f}" for v in pl[p])
            rows.append(f"({t}, {p}, [{vals}])")
    return ",\n".join(rows)


def _sql_embedding_dedup() -> str:
    """LSH-candidate near-dup, mirrored exactly: the deterministic md5
    hyperplanes (operators/knn.py:_hyperplanes) are inlined as literals so
    DuckDB computes the identical buckets (plane entries are *.5 halves —
    exact in float64; min |dot| on the test corpora ≈ 1e-3, far above any
    summation-order error, so sign parity is guaranteed)."""
    planes = _planes_values(EMB_LSH_TABLES, EMB_LSH_PLANES)
    return f"""WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes(tbl, p, pv) AS (VALUES
{planes}),
b AS MATERIALIZED (
  SELECT e.vec_id, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(e.v, planes.pv) > 0
                       THEN 1 << planes.p ELSE 0 END) AS BIGINT) AS bucket
  FROM e, planes GROUP BY 1, 2),
probes AS (
  SELECT vec_id, tbl, bucket FROM b
  UNION ALL
  SELECT vec_id, tbl, xor(bucket, CAST(1 << j AS BIGINT)) AS bucket
  FROM b, (SELECT unnest(range(0, {EMB_LSH_PLANES})) AS j) r),
cand AS (
  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
  FROM b l JOIN probes r ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id),
s AS (
  SELECT c.a, c.b,
         list_dot_product(ea.v, eb.v)
         / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cos
  FROM cand c JOIN e ea ON ea.vec_id = c.a JOIN e eb ON eb.vec_id = c.b)
SELECT a, b, ROUND(cos, 6) AS cos FROM s WHERE cos >= 0.4"""


def _lang_hits_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(ltk, t -> list_contains([{lst}], t)))"


def _sql_embedding_topk_lsh() -> str:
    """knn_lsh mirrored: same deterministic buckets (8 planes × 4 tables),
    exact-bucket candidates, exact cosine scoring, same tie-break."""
    planes = _planes_values(4, 8)
    return f"""WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes(tbl, p, pv) AS (VALUES
{planes}),
b AS MATERIALIZED (
  SELECT e.vec_id, planes.tbl,
         CAST(SUM(CASE WHEN list_dot_product(e.v, planes.pv) > 0
                       THEN 1 << planes.p ELSE 0 END) AS BIGINT) AS bucket
  FROM e, planes GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
s AS (
  SELECT cd.query_id, cd.neighbor_id,
         ROUND(list_dot_product(eq.v, ec.v)
               / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))), 6) AS cos
  FROM cand cd JOIN e eq ON eq.vec_id = cd.query_id JOIN e ec ON ec.vec_id = cd.neighbor_id),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s)
SELECT query_id, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5"""


def _sql_knn_ivf(
    n_centroids: int = 16, n_probe: int = 4, iters: int = 3, k: int = 5,
    dim: int = _EMB_DIM,
) -> str:
    """knn_ivf mirrored END-TO-END in SQL — including the deterministic
    spherical k-means fit (operators/knn.py:kmeans_fit): seeds = the
    ``n_centroids`` vectors with smallest md5(id) in id order, then
    ``iters`` Lloyd rounds of (argmax-cosine assign → per-cell mean as
    SUM(x ORDER BY vec_id)/COUNT(*) ROUNDed to 9 digits — DuckDB's
    ordered SUM is a sequential left-fold, the exact fold the Spark
    kernel's np.add.accumulate performs over the same id order, so both
    engines feed ROUND bit-identical doubles and land on bit-identical
    centroids each iteration). IVF search:
    corpus inverted-listed under final cells, queries probe their
    ``n_probe`` best cells (sim DESC, cell ASC — the Spark kernel's
    stable argsort), exact cosine scoring, knn tie-break."""
    norm = "CASE WHEN sqrt(list_dot_product({0}, {0})) = 0 THEN 1 ELSE sqrt(list_dot_product({0}, {0})) END"
    ctes = [f"""e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
en AS MATERIALIZED (
  SELECT vec_id, v, list_transform(v, x -> x / ({norm.format('v')})) AS u FROM e),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS c
  FROM (SELECT vec_id, v FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_centroids}))"""]
    for i in range(1, iters + 1):
        p = f"c{i - 1}"
        ctes.append(f"""{p}n AS (
  SELECT cell, list_transform(c, x -> x / ({norm.format('c')})) AS cu FROM {p}),
a{i} AS (
  SELECT vec_id, cell FROM (
    SELECT en.vec_id, cn.cell,
           ROW_NUMBER() OVER (PARTITION BY en.vec_id
                              ORDER BY list_dot_product(en.u, cn.cu) DESC, cn.cell) AS rn
    FROM en, {p}n cn) WHERE rn = 1),
m{i} AS (
  SELECT cell, list(mv ORDER BY j) AS c FROM (
    SELECT a{i}.cell AS cell, r.j AS j,
           ROUND(SUM(en.v[r.j] ORDER BY en.vec_id) / COUNT(*), 9) AS mv
    FROM a{i} JOIN en USING (vec_id), range(1, {dim + 1}) AS r(j)
    GROUP BY 1, 2) GROUP BY cell),
c{i} AS (
  SELECT p.cell, COALESCE(m{i}.c, p.c) AS c FROM {p} p LEFT JOIN m{i} USING (cell))""")
    ctes.append(f"""cf AS (
  SELECT cell, list_transform(c, x -> x / ({norm.format('c')})) AS cu FROM c{iters}),
corpus_cells AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT en.vec_id, cf.cell,
           ROW_NUMBER() OVER (PARTITION BY en.vec_id
                              ORDER BY list_dot_product(en.u, cf.cu) DESC, cf.cell) AS rn
    FROM en, cf) WHERE rn = 1),
query_cells AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT en.vec_id, cf.cell,
           ROW_NUMBER() OVER (PARTITION BY en.vec_id
                              ORDER BY list_dot_product(en.u, cf.cu) DESC, cf.cell) AS rn
    FROM en, cf WHERE en.vec_id < 10) WHERE rn <= {n_probe}),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM query_cells q JOIN corpus_cells c USING (cell)
  WHERE q.query_id <> c.vec_id),
s AS (
  SELECT cd.query_id, cd.neighbor_id,
         ROUND(list_dot_product(eq.v, ec.v)
               / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))), 6) AS cos
  FROM cand cd JOIN e eq ON eq.vec_id = cd.query_id JOIN e ec ON ec.vec_id = cd.neighbor_id),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s)""")
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT query_id, neighbor_id, cos, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {k}"
    )


def _sql_text_stats() -> str:
    from libgrape_lite_spark.functions.text import LANG_STOPWORDS, TOKEN_REGEX

    en = _lang_hits_sql(LANG_STOPWORDS["en"])
    score_cols = []
    for lang in LANG_STOPWORDS:
        score_cols.append(f"{_lang_hits_sql(LANG_STOPWORDS[lang])} AS h_{lang}")
    langs_sorted = sorted(LANG_STOPWORDS)
    # argmax with ties → lexicographically smallest lang (same fold as Spark)
    best = f"(SELECT 'und')"
    expr_hits, expr_lang = f"h_{langs_sorted[0]}", f"'{langs_sorted[0]}'"
    for lang in langs_sorted[1:]:
        expr_lang = f"CASE WHEN h_{lang} > GREATEST({expr_hits}) THEN '{lang}' ELSE {expr_lang} END"
        expr_hits = f"GREATEST({expr_hits}, h_{lang})"
    del best
    return f"""WITH {_TOKS},
base AS (
  SELECT d.doc_id, d.text, t.tk,
         list_filter(string_split_regex(trim(lower(d.text)), '\\s+'), x -> x <> '') AS ltk
  FROM documents d JOIN toks t USING (doc_id)),
scored AS (
  SELECT doc_id, text, tk, ltk, {', '.join(score_cols)},
         CASE WHEN len(ltk) > 0 THEN CAST({en} AS DOUBLE) / len(ltk) ELSE 0.0 END AS swr
  FROM base)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS BIGINT) AS n_pieces,
       ROUND(swr, 6) AS stopword_ratio,
       ROUND(LEAST(1.0, len(tk) / 64.0) * (0.5 + 0.5 * swr), 6) AS quality,
       CASE WHEN GREATEST({', '.join('h_' + l for l in langs_sorted)}) > 0
            THEN {expr_lang} ELSE 'und' END AS lang_guess,
       substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 16) AS fp
FROM scored"""


def _sql_multimodal() -> str:
    return """SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents"""


def _sql_edge_mutation() -> str:
    """SQL mirror of _q_edge_mutation: delete rank 1-50, bump weight of
    rank 51-100, append 25 synthetic edges. (src, dst) is unique in the
    derived edge table, so ROW_NUMBER ordered by (src, dst) is total and
    both engines pick identical delta rows."""
    return f"""WITH {_EDGES},
base AS (SELECT src_oid AS src, dst_oid AS dst, weight FROM edges),
ranked AS (
  SELECT src, dst, weight, ROW_NUMBER() OVER (ORDER BY src, dst) AS rn FROM base
)
SELECT src, dst,
       CASE WHEN rn > 50 AND rn <= 100 THEN weight + 1.0 ELSE weight END AS weight
FROM ranked WHERE rn > 50
UNION ALL
SELECT 'mut::' || CAST(i AS VARCHAR), 'mutdst::' || CAST(i AS VARCHAR),
       CAST(1.0 AS DOUBLE)
FROM range(25) t(i)"""


def _sql_vertex_mutation() -> str:
    """SQL mirror of _q_vertex_mutation: delv rank 1-20, updv 21-40,
    upsert 41-50, append 10 synthetic vertices. oid is unique in the
    vertices CTE so ROW_NUMBER ordered by oid is total."""
    return f"""WITH {_EDGES},
ranked AS (SELECT oid, ROW_NUMBER() OVER (ORDER BY oid) AS rn FROM vertices)
SELECT oid AS id,
       CASE WHEN rn > 20 AND rn <= 40 THEN 'upd'
            WHEN rn > 40 AND rn <= 50 THEN 'upserted'
            ELSE split_part(oid, ':', 1) END AS label
FROM ranked WHERE rn > 20
UNION ALL
SELECT 'newv::' || CAST(i AS VARCHAR) AS id, 'new' AS label
FROM range(10) t(i)"""


def _sql_graph_mutation() -> str:
    """SQL mirror of _q_graph_mutation: one mixed delta applied to both
    tables — delv rank 1-10 (vertex rows AND incident edges), updv 11-20,
    5 synthetic vertices, del edge-rank 1-25, upd 26-50, 10 synthetic
    edges — then per-vertex label + merged out-degree + out-weight sum."""
    return f"""WITH {_EDGES},
v AS (SELECT oid AS id, split_part(oid, ':', 1) AS label FROM vertices),
vr AS (SELECT id, label, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM v),
delv AS (SELECT id FROM vr WHERE rn <= 10),
v2 AS (
  SELECT id, CASE WHEN rn > 10 AND rn <= 20 THEN 'relabeled' ELSE label END AS label
  FROM vr WHERE rn > 10
  UNION ALL
  SELECT 'mv::' || CAST(i AS VARCHAR), 'new' FROM range(5) t(i)
),
be AS (SELECT src_oid AS src, dst_oid AS dst, weight FROM edges),
er AS (SELECT src, dst, weight, ROW_NUMBER() OVER (ORDER BY src, dst) AS rn FROM be),
e2 AS (
  SELECT src, dst,
         CASE WHEN rn > 25 AND rn <= 50 THEN weight + 1.0 ELSE weight END AS weight
  FROM er
  WHERE rn > 25
    AND src NOT IN (SELECT id FROM delv)
    AND dst NOT IN (SELECT id FROM delv)
  UNION ALL
  SELECT 'me::' || CAST(i AS VARCHAR), 'medst::' || CAST(i AS VARCHAR),
         CAST(1.0 AS DOUBLE)
  FROM range(10) t(i)
),
od AS (SELECT src AS id, COUNT(*) AS c, SUM(weight) AS ws FROM e2 GROUP BY src)
SELECT v2.id, v2.label,
       CAST(COALESCE(od.c, 0) AS BIGINT) AS outdeg,
       ROUND(COALESCE(od.ws, 0.0), 6) AS wsum
FROM v2 LEFT JOIN od ON v2.id = od.id"""


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts_turns": f"WITH {_TRANSCRIPTS} SELECT conv_id, turn_idx, role, tool, text FROM transcripts",
        "edge_derivation": f"WITH {_EDGES} SELECT src_oid, dst_oid, weight, etype FROM edges",
        "degrees": _sql_degrees(),
        "wcc": _sql_wcc(),
        "wcc_twostar": _sql_wcc(),
        "pagerank": _sql_pagerank(directed=False),
        "pagerank_directed": _sql_pagerank(directed=True),
        "pagerank_local": _sql_pagerank_local(),
        "cdlp": _sql_cdlp(),
        "bfs": _sql_bfs(),
        "bfs_directed": _sql_bfs(directed=True),
        "sssp": _sql_sssp(),
        "sssp_directed": _sql_sssp(directed=True),
        "lcc": _sql_lcc(),
        "triangle_count": _sql_triangles(),
        "dedup_exact": _sql_dedup_exact(),
        "minhash_bands": _sql_minhash_bands(),
        "ngram_jaccard_pairs": _sql_jaccard_pairs(),
        "dedup_minhash": _sql_dedup_minhash(),
        "simhash": _sql_simhash(),
        "dedup_simhash": _sql_dedup_simhash(),
        "embedding_topk": _sql_embedding_topk(),
        "embedding_topk_lsh": _sql_embedding_topk_lsh(),
        "knn_ivf": _sql_knn_ivf(),
        "embedding_dedup": _sql_embedding_dedup(),
        "text_stats": _sql_text_stats(),
        "multimodal_bytes": _sql_multimodal(),
        "edge_mutation": _sql_edge_mutation(),
        "vertex_mutation": _sql_vertex_mutation(),
        "graph_mutation": _sql_graph_mutation(),
    }
