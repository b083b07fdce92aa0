"""Deduplication operators over a documents table — exact and near-dup.

The scale-critical pattern everywhere: never build the dense pair matrix.
Exact dedup is a hash-groupBy; near-dup goes shingle→minhash→band→bucket-
join (LSH) so only candidate pairs shuffle, then exact Jaccard verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libgrape_lite_spark.functions.similarity import (
    cosine,
    jaccard_pairs,
    minhash_bands,
    minhash_signatures,
    simhash16,
    simhash_bits,
)
from libgrape_lite_spark.functions.text import fingerprint


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint.

    Returns (fp, n_copies, keep_id) — keep_id = min id per group (the
    canonical survivor). One shuffle (groupBy on the 128-bit-derived hash);
    map-side combine handles heavy duplicate clusters.
    """
    return (
        docs.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("id").alias("keep_id"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    bucket_cap: int | None = None,
    hash_fn: str = "h64",
) -> DataFrame:
    """LSH candidate pairs (a, b) with a < b sharing ≥1 minhash band.

    Shuffle volume = docs × bands (linear), never O(n²): band keys bucket
    the corpus, and only within-bucket pairs materialize.

    ``bucket_cap`` — the degenerate-bucket guard: a (band, key) bucket with
    more than this many members (k byte-identical boilerplate docs share
    EVERY band key and would emit C(k,2) pairs per band) is dropped before
    the join, bounding candidates at cap²·buckets. Members of such buckets
    are exact or near-exact duplicates — the hash-groupBy exact-dedup pass
    (dedup_exact) is the right tool for them, not pairwise verification.
    """
    rows = num_hashes // bands
    # materialize the (id, sig) table once (eager, tiny: id + num_hashes
    # longs per doc). Without it BOTH sides of the band self-join
    # recompute the full signature expression from the raw text —
    # exchange reuse does not fire across the self-join because the
    # higher-order-function lambda variables carry fresh exprIds that
    # defeat plan canonicalization (verified: 0 ReusedExchange in the
    # executed plan; the signature subtree appeared on both sides)
    from libgrape_lite_spark import transients

    sig = transients.transient_checkpoint(
        minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n, hash_fn)
    )
    banded = sig.select(
        "id", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bk")
    ).select("id", "bk.band", "bk.key")
    if bucket_cap is not None:
        keep = (
            banded.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") <= bucket_cap)
            .select("band", "key")
        )
        banded = banded.join(keep, ["band", "key"])
    a = banded.select(F.col("id").alias("a"), "band", "key")
    b = banded.select(F.col("id").alias("b"), "band", "key")
    # shuffle-hash hint: both sides are the full banded corpus — a
    # mis-estimated broadcast of C x bands rows OOMs the driver at corpus
    # scale (measured at C=1M); the hint pins the only plan that scales
    return (
        a.join(b.hint("shuffle_hash"), ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def dedup_minhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    bucket_cap: int | None = None,
    hash_fn: str = "h64",
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact shingle Jaccard.

    Returns (a, b, jaccard ≥ threshold). The verify stage joins candidate
    pairs back to shingle sets — cost proportional to candidates, not n².
    ``hash_fn="xxhash64"`` swaps the signature hashing to the native scale
    path (see functions/similarity.py::minhash_signatures); the verify
    stage is hash-agnostic, so accepted pairs change only where LSH
    candidate recall differs at the threshold margin.

    Verify-stage scale note: candidates are materialized (eager
    ``localCheckpoint`` — this operator triggers the LSH stage at call
    time, like the kernel operators) and the corpus is semi-joined down
    to the ids that appear in some candidate pair BEFORE shingle arrays
    are computed. Only O(candidate-ids) rows carry arrays through the
    verify joins instead of the whole corpus — at C=1M / 24k candidate
    pairs that is ~37k docs instead of 1M full shingle arrays shuffled
    twice.
    """
    from libgrape_lite_spark.functions.text import shingles

    from libgrape_lite_spark import transients

    # once the candidate pairs are materialized, the signature checkpoint
    # registered inside minhash_lsh_candidates is dead — free it now
    # instead of leaving it pinned for the session
    position = transients.mark()
    cands = minhash_lsh_candidates(
        docs, id_col, text_col, num_hashes, bands, shingle_n, bucket_cap, hash_fn
    ).localCheckpoint(eager=True)
    transients.release_since(position)
    transients.register(cands)
    cand_ids = (
        cands.select(F.col("a").alias(id_col))
        .union(cands.select(F.col("b").alias(id_col)))
        .distinct()
    )
    # semi-join BEFORE the shingle expression: the filter is on the bare
    # id column, so only surviving rows pay tokenization + shingling; AQE
    # turns the tiny id set into a broadcast at runtime
    docs_in_play = docs.join(cand_ids, id_col, "semi")
    # checkpoint: the a-side and b-side joins below would otherwise each
    # re-run the semi-join + shingling over the candidate docs (small —
    # O(candidate ids) — so the materialization is cheap and halves the
    # shingle work)
    sh = (
        transients.transient_checkpoint(
            docs_in_play.select(
                F.col(id_col).alias("id"),
                F.sort_array(shingles(F.col(text_col), shingle_n)).alias("sh"),
            ).withColumn("n_sh", F.size("sh"))
        )
    )
    # Candidate-bounded verify: join the (few) candidate pairs to per-doc
    # shingle arrays and intersect in place (array_intersect, JVM-side) —
    # cost is O(candidates × avg shingles), never the co-shingle self-join.
    # the shingle side is O(corpus) rows of arrays — never broadcast it
    verified = (
        cands.join(
            sh.select(F.col("id").alias("a"), F.col("sh").alias("sha"), F.col("n_sh").alias("na")).hint("shuffle_hash"),
            "a",
        )
        .join(
            sh.select(F.col("id").alias("b"), F.col("sh").alias("shb"), F.col("n_sh").alias("nb")).hint("shuffle_hash"),
            "b",
        )
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .select(
            "a",
            "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )
    return verified.where(F.col("jaccard") >= threshold)


def dedup_simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    bands: int | None = None,
    hash_fn: str = "h64",
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding (the web-dedup design of Manku-Jain-Sarma,
    WWW'07): the ``bits``-wide signature
    (functions/similarity.py::simhash_bits) splits into ``bands``
    contiguous bit ranges; a pair with ≤ max_hamming differing bits
    agrees EXACTLY on at least one band whenever ``bands > max_hamming``
    — so the default ``bands = max_hamming + 1`` makes the candidate
    join COMPLETE. (The pre-round-5 two-half 16-bit variant documented
    Hamming ≤ 2 but guaranteed only ≤ 1: a pair differing one bit per
    half collides with neither half — fixed by this generalization and
    property-tested against a brute-force all-pairs oracle.) Candidates
    are verified by ``bit_count(xor)`` — exact, no false positives.

    Scale: each band contributes 2^(bits/bands) buckets — 64-bit / 4
    bands → 65,536 buckets per band, so C=1M docs leave ~C/65k ≈ 15 docs
    per bucket and the per-band self-join stays near-linear. 16-bit
    signatures cap at 2^8 buckets per band, whose self-join is quadratic
    in C/256 — usable for small corpora and the DuckDB oracle mirror,
    not the 100 TB path; hence the 64-bit default.
    """
    if bands is None:
        bands = max_hamming + 1
    if not 1 <= bands <= bits:
        raise ValueError(f"bands must be in [1, bits], got {bands}")
    # bits=16 with the default hash keeps simhash16 — the exact form the
    # DuckDB oracle mirrors
    sig = (
        simhash16(F.col(text_col))
        if bits == 16 and hash_fn == "h64"
        else simhash_bits(F.col(text_col), bits, hash_fn)
    )
    # eager materialization of the 8-byte-per-doc signature: the band
    # self-join's two sides otherwise each recompute the full simhash
    # (one hash + 64 counter updates per token per doc) — exchange reuse
    # does not fire across HOF lambdas (see minhash_lsh_candidates)
    from libgrape_lite_spark import transients

    sh = transients.transient_checkpoint(
        docs.select(F.col(id_col).alias("id"), sig.alias("sh"))
    )

    # band keys: contiguous bit ranges (remainder bits spread over the
    # first bands); arithmetic shiftright's sign-fill is cut by the mask
    width, rem = divmod(bits, bands)
    keys, lo = [], 0
    for i in range(bands):
        w = width + (1 if i < rem else 0)
        if w >= 64:
            key = F.col("sh")
        else:
            key = F.shiftright("sh", lo).bitwiseAND(F.lit((1 << w) - 1))
        keys.append(F.struct(F.lit(i).alias("band"), key.alias("key")))
        lo += w
    banded = sh.select(
        "id", "sh", F.explode(F.array(*keys)).alias("bk")
    ).select("id", "sh", "bk.band", "bk.key")
    a = banded.select(F.col("id").alias("a"), F.col("sh").alias("sha"), "band", "key")
    b = banded.select(F.col("id").alias("b"), F.col("sh").alias("shb"), "band", "key")
    # shuffle-hash hint: same corpus-scale broadcast hazard as the
    # minhash candidate join (a mis-estimated broadcast of C x bands rows
    # OOM'd the driver at C=1M before the hint)
    # verify BEFORE the distinct: the Hamming filter is a per-row xor +
    # bit_count evaluated map-side inside the join stage, so the distinct
    # exchange dedups only true near-dup pairs (≤ bands copies each) —
    # not the full bucket-collision candidate stream. At C=1M / 16-bit
    # band keys the buckets average ~15 docs, i.e. ~30M collision pairs
    # per run; distinct-then-filter shuffled all of them with both 64-bit
    # signatures attached, filter-then-distinct shuffles ~50k longs.
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return (
        a.join(b.hint("shuffle_hash"), ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_embedding_cosine(
    docs_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "lsh",
    n_planes: int = 8,
    n_tables: int = 8,
    multiprobe: int = 1,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (a, b, cos ≥ threshold).

    ``method="lsh"`` (default, the 100 TB path): candidates = pairs whose
    deterministic hyperplane signatures agree within Hamming ≤ ``multiprobe``
    in ≥1 of ``n_tables`` tables (operators/knn.py:lsh_candidate_pairs),
    verified by exact cosine. The plan is explode + hash joins — linear in
    corpus × n_tables, no CartesianProduct/BroadcastNestedLoopJoin
    (asserted in scripts/audit_plans.py). The operator's contract is
    therefore *LSH-candidate* near-dup (the semantics of every production
    embedding-dedup system): recall < 1 for pairs barely above threshold;
    identical/near-identical vectors always collide in every table.

    ``method="exact"``: the brute-force all-pairs verifier — O(n²)
    nested-loop join, test/oracle use ONLY, never a pipeline default.
    """
    a = docs_emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = docs_emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    if method not in ("lsh", "exact"):
        raise ValueError(f"method must be 'lsh' or 'exact', got {method!r}")
    if method == "exact":
        pairs = a.join(b, F.col("a") < F.col("b"))
    else:
        from libgrape_lite_spark.operators.knn import lsh_candidate_pairs

        cands = lsh_candidate_pairs(
            docs_emb, id_col, vec_col, n_planes, n_tables, multiprobe, bucket_cap
        )
        pairs = cands.join(a, "a").join(b, "b")
    return pairs.select(
        "a", "b", cosine(F.col("va"), F.col("vb")).alias("cos")
    ).where(F.col("cos") >= threshold)
