"""Approximate-nearest-neighbor search over an embedding column.

Three paths:

* ``knn_bruteforce`` — exact top-k cosine for a query subset; the baseline
  and the verifier. Cross join bounded by |queries| × |corpus| — fine when
  the query side is small or broadcastable.
* ``knn_lsh`` — random-hyperplane LSH: L hash tables × H hyperplanes; only
  same-bucket pairs are scored. Hyperplane vectors are derived
  deterministically from md5 (no external randomness, reproducible across
  runs/cluster sizes). This is the 100 TB path: shuffle is linear in
  corpus × L, and each bucket join is a hash join AQE can skew-split.
* ``knn_ivf`` — inverted-file index over deterministic spherical k-means
  cells (``kmeans_fit``): queries probe their n_probe closest cells and
  score only those inverted lists. Adapts to the data distribution where
  LSH is distribution-free; the standard recall/cost dial is n_probe.

Both use JVM higher-order array functions end-to-end; the only pandas UDF
in this module is the vectorized hyperplane projection (Arrow-batched
NumPy matmul — per-batch, not per-row).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from libgrape_lite_spark.functions.similarity import cosine

# max float64 elements in one IVF scoring product tensor (~64 MB): bounds
# per-task transient memory independent of cell size / probe fan-in
_SCORE_TENSOR_CAP = 8_000_000


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, cos, rank). Deterministic tie-break:
    (cos desc, neighbor_id asc) — on rounded cosine when ``round_digits``
    is set, so results are reproducible across summation orders.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    cos = cosine(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        # zero-norm pairs have undefined cosine (NULL from try_divide) —
        # excluded from ranking, matching knn_lsh / knn_ivf
        .where(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 bytes."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        vals = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"lsh:{table}:{p}:{i}".encode()).digest()
            vals.extend(b - 127.5 for b in h)
            i += 1
        out[p] = vals[:dim]
    return out


def lsh_bucket_ids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """(id, table, bucket) — sign pattern of hyperplane projections.

    Arrow-batched kernel: one NumPy matmul per batch (vectors × planes),
    zero per-row Python.
    """
    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cached: dict[int, list[np.ndarray]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf["v"].to_numpy())
            dim = mat.shape[1]
            if dim not in cached:
                cached[dim] = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
            frames = []
            for t, pl in enumerate(cached[dim]):
                signs = (mat @ pl.T) > 0  # (n, planes)
                bucket = signs @ (1 << np.arange(n_planes))
                frames.append(
                    pd.DataFrame(
                        {"id": pdf["id"].to_numpy(), "table": t, "bucket": bucket.astype("int64")}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return base.mapInPandas(project, schema="id long, table int, bucket long")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    multiprobe: int = 1,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Self-join candidate pairs (a < b) whose hyperplane signatures agree
    within Hamming distance ≤ ``multiprobe`` in at least one table.

    The 100 TB-safe candidate generator for embedding dedup: shuffle is
    linear in corpus × n_tables; each per-(table, bucket) join is a hash
    join. Multiprobe is one-sided (the right side explodes its bucket into
    all ≤ multiprobe bit-flips), so a pair at Hamming d ≤ multiprobe meets
    on the left side's exact bucket — recall of L·(1+probes) tables at the
    memory cost of L.

    ``bucket_cap``: drop (table, bucket) groups with more than this many
    members before the join — the skew guard for degenerate corpora (1k
    byte-identical embeddings land in one bucket in EVERY table and would
    emit C(1k,2) pairs per table; such rows are exact duplicates and belong
    to the exact-dedup pass). Dropped-bucket counts are observable via
    ``lsh_bucket_ids`` + a groupBy — candidates from capped buckets are
    intentionally absent.
    """
    import itertools

    # materialize the (id, table, bucket) frame once (eager, ~20 B x V x
    # n_tables): the self-join's two sides — and the bucket_cap sizing
    # pass — otherwise each re-run the projection kernel over the FULL
    # vector corpus (exchange reuse does not fire across Python kernels,
    # same as the HOF-lambda case in operators/dedup.py)
    from libgrape_lite_spark import transients

    b = transients.transient_checkpoint(
        lsh_bucket_ids(df, id_col, vec_col, n_planes, n_tables)
    )
    if bucket_cap is not None:
        sizes = b.groupBy("table", "bucket").agg(F.count(F.lit(1)).alias("n"))
        keep = sizes.where(F.col("n") <= bucket_cap).select("table", "bucket")
        b = b.join(keep, ["table", "bucket"])
    left = b.select(F.col("id").alias("a"), "table", F.col("bucket").alias("bk"))
    masks = [0]
    for r in range(1, multiprobe + 1):
        masks += [sum(1 << j for j in c) for c in itertools.combinations(range(n_planes), r)]
    if len(masks) > 1:
        probes = F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        )
    else:
        probes = F.col("bucket")
    right = b.select(F.col("id").alias("b"), "table", probes.alias("bk"))
    return (
        left.join(right, ["table", "bk"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = same (table, bucket) in any table,
    scored exactly, ranked like knn_bruteforce. Recall grows with
    ``n_tables``; shuffle stays linear."""
    cb = lsh_bucket_ids(corpus, id_col, vec_col, n_planes, n_tables)
    qb = lsh_bucket_ids(queries, id_col, vec_col, n_planes, n_tables)
    cand = (
        qb.select(F.col("id").alias("query_id"), "table", "bucket")
        .join(cb.select(F.col("id").alias("neighbor_id"), "table", "bucket"), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"))
        .where(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _batch_argmax_cosine(centroids: np.ndarray, carry_vec: bool = False):
    """Kernel factory: assign each vector to its max-cosine centroid.
    One NumPy matmul per Arrow batch, zero per-row Python.

    ``carry_vec``: also pass the vector column through unchanged (schema
    ``id long, cell int, v <input type>``). Downstream stages that need
    (cell, v) together — the k-means per-cell mean, the IVF scoring
    kernel — read it straight off the kernel output instead of joining
    the O(corpus) assignment table back to the O(corpus) vector table
    (a full extra shuffle + hash join per use at 100 TB)."""
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0] = 1.0
    cn = centroids / norms[:, None]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0] = 1.0
            sims = (mat / vn[:, None]) @ cn.T
            out = {"id": pdf["id"].to_numpy(), "cell": sims.argmax(axis=1).astype("int32")}
            if carry_vec:
                out["v"] = pdf["v"]
            yield pd.DataFrame(out)

    return assign


def kmeans_fit(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 9,
) -> np.ndarray:
    """Deterministic distributed Lloyd's k-means (spherical): init = the
    vectors with the ``n_centroids`` smallest md5(id) values (a determinist
    sample, reproducible across partitionings), then ``iters`` rounds of
    assign (Arrow matmul kernel) + per-cell mean (applyInPandas). Centroid
    set is tiny (n_centroids × dim) — it rides the closure, never a join.

    ``round_digits``: updated centroids are rounded each iteration so an
    independent re-implementation (the DuckDB oracle mirror in
    ``__spark_entry__._sql_knn_ivf``) lands on bit-identical centroids —
    last-ulp summation differences cannot compound across iterations.
    """
    # one cached pass over the corpus feeds every Lloyd iteration (was:
    # re-read twice per iteration — 2×iters full scans at 100 TB). The
    # copy is dead once the centroids are computed — released at return
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).localCheckpoint(
        eager=True
    )
    seed_ids = (
        base.select("id", F.md5(F.col("id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(n_centroids)
    )
    seeds = base.join(seed_ids.select("id"), "id").collect()
    centroids = np.array(
        [c for _, c in sorted((r["id"], list(r["v"])) for r in seeds)], dtype=np.float64
    )

    def mean_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # sort by id AND sum with a strict sequential left-fold
        # (np.add.accumulate — NOT np.sum/mean, which reduce pairwise):
        # the float64 result is then a pure function of the id-ordered
        # value sequence, bit-identical across runs, partitionings, AND
        # engines — the DuckDB oracle mirrors it with
        # SUM(x ORDER BY id)/COUNT(*), whose sequential fold lands on the
        # same double (verified: ordered-SUM == accumulate on
        # order-sensitive fixtures), so ROUND(·,9) on both sides receives
        # identical inputs instead of merely ulp-close ones
        pdf = pdf.sort_values("id")
        mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        m = np.add.accumulate(mat, axis=0)[-1] / len(mat)
        return pd.DataFrame({"cell": [key[0]], "c": [m.tolist()]})

    vtype = base.schema["v"].dataType.simpleString()
    for _ in range(iters):
        # the kernel carries v through — profiling at V=1M put ~half of
        # each Lloyd iteration in the old join of the assignment table
        # back to `base` just to re-attach the vector it already had
        assigned = base.mapInPandas(
            _batch_argmax_cosine(centroids, carry_vec=True),
            schema=f"id long, cell int, v {vtype}",
        )
        rows = (
            assigned.groupBy("cell")
            .applyInPandas(mean_cell, schema="cell int, c array<double>")
            .collect()
        )
        new = centroids.copy()
        for r in rows:
            new[r["cell"]] = (
                np.round(r["c"], round_digits) if round_digits is not None else r["c"]
            )
        # exact fixpoint only (a tolerance stop would diverge from the
        # fixed-iteration SQL mirror; iterating past a true fixpoint is a
        # no-op, so fixed `iters` and early-exact-stop agree)
        if np.array_equal(new, centroids):
            break
        centroids = new
    from libgrape_lite_spark.plans.kernels import release_pinned

    release_pinned(base)
    return centroids


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-listed under
    their nearest (spherical k-means) centroid; each query probes its
    ``n_probe`` closest cells and scores only those lists exactly.

    The 100 TB shape: assignment is one matmul pass (linear), the
    candidate join is a hash join on ``cell`` (corpus never self-joins),
    and recall is dialed by ``n_probe`` — the standard IVF recall/cost
    knob. Complements ``knn_lsh`` (hyperplane buckets): IVF adapts to the
    data distribution, LSH needs no training pass.
    """
    centroids = kmeans_fit(corpus, n_centroids, kmeans_iters, id_col, vec_col)
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0] = 1.0
    cn = centroids / norms[:, None]

    cb = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    vtype = cb.schema["v"].dataType.simpleString()
    corpus_cells = cb.mapInPandas(
        _batch_argmax_cosine(centroids, carry_vec=True),
        schema=f"id long, cell int, v {vtype}",
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0] = 1.0
            sims = (mat / vn[:, None]) @ cn.T
            # stable sort: equal sims keep ascending cell order — the same
            # (sim DESC, cell ASC) tie-break the SQL oracle mirror uses
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), n_probe),
                    "cell": top.reshape(-1).astype("int32"),
                }
            )

    qb = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    query_cells = qb.mapInPandas(probe, schema="id long, cell int")

    # the probed queries ride the scoring kernel's CLOSURE — O(Q·(d +
    # n_probe)) driver bytes, the same small-queries assumption as the
    # broadcast join this replaces. Probe cells come from the
    # executor-side kernel above and are collected (O(Q·n_probe) rows),
    # NOT recomputed on the driver: BLAS matmuls are not guaranteed
    # bit-stable across thread counts, and the probe choice must be
    # exactly the one the oracle mirrors. The old shape materialized the
    # ~Q·n_probe·(V/cells) candidate pair table through a distinct and a
    # second O(V) vector join, then scored with the interpreted HOF
    # cosine; the kernel emits (query_id, neighbor_id, cos) straight off
    # the corpus scan — the final top-k window is the only shuffle.
    probe_rows = query_cells.collect()
    qvec = {r["id"]: np.asarray(r["v"], dtype=np.float64) for r in qb.collect()}
    cell_probes: dict[int, list[int]] = {}
    for r in probe_rows:
        cell_probes.setdefault(r["cell"], []).append(r["id"])
    by_cell: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for cell, qids in cell_probes.items():
        # zero-norm queries have undefined cosine to everything — drop
        # them here so the kernel never divides by a zero qnorm (matches
        # knn_bruteforce/knn_lsh, where try_divide yields NULL → filtered)
        qids = sorted(q for q in qids if np.any(qvec[q]))
        if not qids:
            continue
        qmat = np.vstack([qvec[qid] for qid in qids])
        # norms/dots below use sequential cumsum folds — bit-identical to
        # functions/similarity.py::norm/dot's left fold (and therefore to
        # the DuckDB oracle mirror), unlike BLAS/np.sum pairwise reduction
        qnorm = np.sqrt(np.cumsum(qmat * qmat, axis=1)[:, -1])
        by_cell[cell] = (np.asarray(qids, dtype=np.int64), qmat, qnorm)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cells = pdf["cell"].to_numpy()
            ids = pdf["id"].to_numpy()
            vs = pdf["v"].to_numpy()
            outs = []
            for cell in np.unique(cells):
                ent = by_cell.get(int(cell))
                if ent is None:
                    continue  # cell probed by no query
                qids, qmat, qnorm = ent
                m = cells == cell
                cmat = np.vstack(vs[m]).astype(np.float64)
                cids = ids[m]
                cnorm = np.sqrt(np.cumsum(cmat * cmat, axis=1)[:, -1])
                # zero-norm corpus vectors: undefined cosine → excluded
                # from ranking (NaN would otherwise sort ABOVE every real
                # double in the desc top-k window — a zero vector became
                # everyone's rank-1 neighbor before this guard)
                ok = cnorm > 0.0
                if not ok.all():
                    cmat, cids, cnorm = cmat[ok], cids[ok], cnorm[ok]
                if len(cids) == 0:
                    continue
                # bound the (chunk × n_queries × dim) product tensor
                step = max(1, _SCORE_TENSOR_CAP // max(1, len(qids) * qmat.shape[1]))
                for lo in range(0, len(cids), step):
                    cm, ci = cmat[lo : lo + step], cids[lo : lo + step]
                    num = np.cumsum(cm[:, None, :] * qmat[None, :, :], axis=2)[:, :, -1]
                    cos = num / (qnorm[None, :] * cnorm[lo : lo + step][:, None])
                    qq = np.tile(qids, len(ci))
                    nn = np.repeat(ci, len(qids))
                    cc = cos.reshape(-1)
                    keep = qq != nn
                    outs.append(
                        pd.DataFrame(
                            {"query_id": qq[keep], "neighbor_id": nn[keep], "cos": cc[keep]}
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = corpus_cells.mapInPandas(
        score, schema="query_id long, neighbor_id long, cos double"
    ).select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
