"""Similarity primitives: minhash, simhash, cosine — vectorized, portable.

MinHash/SimHash use the portable md5-based h64 (functions/text.py) so the
DuckDB oracle reproduces signatures exactly. Cosine uses higher-order array
functions (``aggregate``/``zip_with``) — JVM-side, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libgrape_lite_spark.functions.text import h64, shingles, tokens


def minhash_signature(text: Column, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """array<long> of length ``num_hashes``: sig[i] = min over shingles of
    h64(i || ':' || shingle). Empty shingle set → nulls (filtered upstream).

    Seeded-hash family via prefix-tagging one base hash — the standard
    trick; identical in SQL: min(h64(CAST(i AS STRING)||':'||sh)).

    Expression form of :func:`minhash_signatures`'s narrow plan: ONE
    aggregate fold over the shingle array carrying all running minima —
    the shingle expression is referenced twice (empty-check + fold), a
    constant. The previous nested-transform form
    (``transform(range, i -> array_min(transform(sh, ...)))``) re-ran
    the whole shingle construction once per hash function under the
    interpreted HOF evaluator — the same O(num_hashes × tokens) regex
    blowup measured and removed in the DataFrame path.
    """
    sh = shingles(text, shingle_n)
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    fold = F.aggregate(
        sh,
        F.array(*[F.lit(2**63 - 1).cast("long")] * num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            idx,
            lambda m, i: F.least(m, h64(F.concat(i.cast("string"), F.lit(":"), s))),
        ),
    )
    empty = F.array(*[F.lit(None).cast("long")] * num_hashes)
    return F.when(F.size(sh) > 0, fold).otherwise(empty)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    hash_fn: str = "h64",
    plan: str = "narrow",
) -> DataFrame:
    """(id, sig: array<long>) — DataFrame-level minhash.

    Two physical plans computing BIT-IDENTICAL signatures (pytest-pinned):

    ``plan="narrow"`` (default): one ``aggregate`` fold over the shingle
    array carrying all ``num_hashes`` running minima in its accumulator
    — ZERO shuffle; the signature is a per-row map over the doc scan.
    Same total hash evaluations as the explode plan, none of its
    shuffle: at C=1M the explode plan materializes a 52M-row
    (id, shingle) exchange that the narrow plan simply never creates.

    ``plan="explode"``: explode distinct shingles →
    ``groupBy(id).agg(min(h_i)...)`` — one shuffle, map-side combined.
    Kept because the min aggregate is whole-stage-codegen'd while HOF
    lambdas are interpreted, so it can win when per-hash cost dominates
    shuffle cost (tiny corpora, very long docs); it is also the shape
    the DuckDB oracle mirrors textually.

    Documents with no shingles are dropped (no signature) — both plans.

    ``hash_fn``: ``"h64"`` (default) is the portable md5-based family the
    DuckDB oracle reproduces bit-for-bit; ``"xxhash64"`` is the native
    scale family. Same minhash statistics, different (still
    deterministic) signature values.
    """
    if hash_fn not in ("h64", "xxhash64"):
        raise ValueError(f"hash_fn must be h64|xxhash64, got {hash_fn!r}")
    if plan == "narrow":
        sh_docs = docs.select(
            F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
        ).where(F.size("sh") > 0)
        if hash_fn == "xxhash64":
            hash_one = lambda i, s: F.xxhash64(i, s)  # noqa: E731
        else:
            # same bytes as the explode plan's concat(lit(f"{i}:"), s)
            hash_one = lambda i, s: h64(  # noqa: E731
                F.concat(i.cast("string"), F.lit(":"), s)
            )
        # ONE pass over the shingle array, maintaining all num_hashes
        # running minima in the fold accumulator (the simhash_bits
        # counter-array shape). `sh` is referenced exactly once: Spark's
        # CollapseProject inlines the shingle expression into every
        # reference, and higher-order lambdas are interpreted (no
        # codegen, no common-subexpression elimination) — the earlier
        # transform(range, i -> array_min(transform(sh, ...))) form
        # re-evaluated the whole shingle construction per hash function
        # (16x the regex work; observed as a >10x blowup at C=1M).
        idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
        init = F.array(*[F.lit(2**63 - 1).cast("long")] * num_hashes)
        sig = F.aggregate(
            F.col("sh"),
            init,
            lambda acc, s: F.zip_with(acc, idx, lambda m, i: F.least(m, hash_one(i, s))),
        )
        return sh_docs.select("id", sig.alias("sig"))
    if plan != "explode":
        raise ValueError(f"plan must be narrow|explode, got {plan!r}")
    ex = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), shingle_n)).alias("s")
    )
    if hash_fn == "xxhash64":
        mins = [
            F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        mins = [
            F.min(h64(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    agg = ex.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_bands(sig: Column, bands: int, rows: int) -> Column:
    """array<struct<band int, key long>> — LSH banding: one 60-bit key per
    band = h64 of the band's concatenated signature values."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            h64(F.concat_ws(",", F.slice(sig, b * rows + 1, rows))).alias("key"),
        ),
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash over distinct whitespace tokens: bit j of the result
    is 1 iff Σ_tokens (2*bit_j(h64(token)) - 1) > 0."""
    toks = F.array_distinct(tokens(F.lower(text)))
    hashes = F.transform(toks, h64)

    def bit_sum(j: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )

    out = F.lit(0)
    for j in range(16):
        out = out + F.when(bit_sum(j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("long")


def simhash_bits(text: Column, bits: int = 64, hash_fn: str = "h64") -> Column:
    """``bits``-wide SimHash over distinct whitespace tokens (Charikar
    SimHash as used for web-scale dedup, Manku et al. WWW'07): bit j is 1
    iff Σ_tokens (2·bit_j(h64(token)) − 1) > 0. Same tokenization, hash
    family, and tie rule as :func:`simhash16` (bit-identical for
    ``bits=16`` — pytest-verified), but computed in ONE pass over the
    token array with an array-of-counters accumulator instead of one
    ``aggregate`` per bit — the codegen stays linear in ``bits``, which
    is what makes 64-bit signatures practical. 64 bits are what the
    banded near-dup join needs at corpus scale: 16-bit signatures give
    only 2^8-sized half-buckets, whose pair join is quadratic in
    C/256 (see operators/dedup.py::dedup_simhash)."""
    if hash_fn not in ("h64", "xxhash64"):
        raise ValueError(f"hash_fn must be h64|xxhash64, got {hash_fn!r}")
    toks = F.array_distinct(tokens(F.lower(text)))
    # h64 (md5-based) mirrors the DuckDB oracle; xxhash64 is the native
    # scale path (same one-pass shape, cheaper per token)
    hashes = F.transform(
        toks, h64 if hash_fn == "h64" else lambda t: F.xxhash64(t)
    )
    # literal per-bit masks (bit 63's mask is the sign bit, -2^63) — shift
    # amounts must be literals in Spark SQL, masks need not
    masks = F.array(
        *[F.lit((1 << j) if j < 63 else -(1 << 63)) for j in range(bits)]
    )
    counters = F.aggregate(
        hashes,
        F.transform(masks, lambda m: F.lit(0)),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda c, m: c + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counters,
            masks,
            lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, v: s.bitwiseOR(v),
    )


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in array order (JVM fold — matches DuckDB's
    list_dot_product accumulation order on doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm.

    ``try_divide`` (not ``/``) so the zero-norm case is NULL under every
    ANSI setting — Spark 4 defaults ``spark.sql.ansi.enabled=true``, where
    plain division throws DIVIDE_BY_ZERO. NULL sorts last in the desc
    ranking windows and fails every ``>= threshold`` filter, so zero-norm
    vectors are consistently "similar to nothing" across operators.
    """
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3, threshold: float = 0.1,
    df_cap: int | str | None = None, uncapped_guard: int = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle.

    Plan: explode distinct shingles → self-join on shingle (only co-shingled
    pairs materialize — the sparse analog of a full cross join) → count
    intersection → Jaccard = |∩| / (|A|+|B|-|∩|).

    ``df_cap`` (the standalone-at-scale guard): drop shingles whose document
    frequency exceeds the cap BEFORE the self-join, and compute Jaccard over
    the surviving shingle sets (both |∩| and |A|/|B| — consistent set
    semantics). A shingle shared by k docs yields k² join rows, so stopword
    shingles ("of the") make the raw self-join quadratic; capped, the join
    is bounded by Σ min(df, cap)² ≤ cap · Σ df = cap · O(corpus shingles) —
    linear. High-Jaccard pairs lose almost nothing: a df>cap shingle is, by
    definition, shared with thousands of non-duplicates. At 100 TB either
    set a cap or feed LSH candidates to the verify stage instead
    (operators/dedup.py:dedup_minhash).

    ``df_cap=None`` (default) is uncapped but GUARDED: the per-shingle
    document frequency is pre-aggregated (one cheap agg — the join below
    computes it implicitly anyway) and a ``ValueError`` is raised when any
    shingle's df exceeds ``uncapped_guard`` — the point where the self-join
    has gone quadratic on a hot shingle. Pass ``df_cap="unbounded"`` to
    opt into the truly uncapped join (test-scale corpora only).
    """
    if isinstance(df_cap, str) and df_cap != "unbounded":
        raise ValueError(f"df_cap must be an int, None, or 'unbounded', got {df_cap!r}")
    # materialize the shingle arrays once (eager — the uncapped guard
    # below runs a job at call time anyway): the df-frequency passes and
    # BOTH sides of the shingle self-join would otherwise each re-run
    # the regex shingling over the full corpus (no exchange reuse across
    # HOF lambdas — see operators/dedup.py)
    from libgrape_lite_spark import transients

    base = transients.transient_checkpoint(
        docs.select(
            F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
        )
    )
    if df_cap is None:
        hot = (
            base.select(F.explode("sh").alias("s"))
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("dfreq"))
            .agg(F.max("dfreq").alias("m"))
            .collect()[0]["m"]
        )
        if hot is not None and hot > uncapped_guard:
            raise ValueError(
                f"uncapped jaccard_pairs: hottest shingle appears in {hot} docs "
                f"(> uncapped_guard={uncapped_guard}) — the shingle self-join would "
                f"generate ~{hot}² rows for that key. Set df_cap (recommended) or "
                f"pass df_cap='unbounded' to override."
            )
    if df_cap is None or df_cap == "unbounded":
        ex = base.withColumn("n_sh", F.size("sh")).select(
            "id", "n_sh", F.explode("sh").alias("s")
        )
    else:
        raw = base.select("id", F.explode("sh").alias("s"))
        keep = raw.groupBy("s").agg(F.count(F.lit(1)).alias("dfreq")).where(
            F.col("dfreq") <= df_cap
        )
        capped = raw.join(keep.select("s"), "s")
        sizes = capped.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        ex = capped.join(sizes, "id")
    a = ex.select(F.col("id").alias("a"), F.col("n_sh").alias("na"), "s")
    b = ex.select(F.col("id").alias("b"), F.col("n_sh").alias("nb"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.select(
            "a",
            "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
