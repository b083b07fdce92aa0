"""Text-analysis functions for training-data pipelines over `documents`.

All built from JVM-side ``pyspark.sql.functions`` (whole-stage codegen, no
Python in the hot path) and all deterministic + ANSI-SQL-reproducible so the
DuckDB oracle can verify them bit-for-bit.

Portable 60-bit hash: ``h64(s) = int(md5(s)[:15], 16)`` — md5 exists in both
Spark and DuckDB with identical semantics; 15 hex chars keep it positive in
an int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword vocabularies for the n-gram/stopword language
# heuristic. Deliberately small and hard-coded: deterministic, SQL-expressible.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "de": ("der", "die", "und", "das", "ist", "von", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不"),
}

TOKEN_REGEX = "[a-z0-9]+"  # BPE-ish word pieces; shared with the oracle


def h64(col: Column) -> Column:
    """Portable deterministic 60-bit hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty tokens removed)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of regex word-pieces — the 'token estimate' a BPE tokenizer
    would produce, without shipping a vocab (north-rule: no external data)."""
    return F.regexp_count(F.lower(text), F.lit(TOKEN_REGEX))


def _isin_filter(words: tuple[str, ...]):
    # single-arg lambda factory: a two-arg lambda (e.g. with a default arg)
    # would be interpreted by F.filter as the (element, index) variant
    return lambda t: t.isin(*words)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Length/stopword heuristic quality in [0,1]: long-enough documents
    with natural stopword density score high; vectorized, SQL-parity."""
    n_tok = token_count(text)
    sw = stopword_ratio(text)
    return F.round(
        F.least(F.lit(1.0), n_tok / F.lit(64.0)) * (F.lit(0.5) + F.lit(0.5) * sw), 6
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    toks = tokens(F.lower(text))
    out = []
    for lang, words in LANG_STOPWORDS.items():
        hits = F.size(F.filter(toks, _isin_filter(words)))
        out.append((lang, hits))
    return out


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits, ties → lexicographically smallest
    language code; 'und' when no hits at all."""
    scores = lang_scores(text)
    best = None
    for lang, s in sorted(scores):
        pair = F.struct(s.alias("hits"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(s > best["hits"], pair).otherwise(best)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text,
    first 16 hex chars — a deterministic stand-in for a rolling-hash
    fingerprint that both engines reproduce."""
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.substring(F.md5(normalized), 1, 16)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>).

    Built by zipping the token array with its own k-shifted tails
    (k = 1..n-1): windows that run off the end pick up a null from
    ``zip_with``'s padding, turn null under the null-propagating
    ``concat``, and are filtered out. The token-array expression is
    referenced only n times, so the regex ``split`` behind it is
    evaluated O(n) times per row. The naive per-position form
    (``transform(sequence(1, size-n+1), i -> concat_ws(' ',
    slice(toks, i, n)))``) inlines the split into every lambda
    iteration under Spark's interpreted higher-order-function
    evaluator — O(tokens) regex splits per row, measured as the
    dominant cost of minhash signatures at C=1M. Output is
    bit-identical to that form (pytest-pinned): same first-occurrence
    order, same strings, same null/short-doc handling ([]).
    """
    toks = tokens(text)
    grams = toks
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            # start is 1-based; length 2^30 = "to the end" without
            # overflowing start+length past int32
            F.slice(toks, k + 1, 1 << 30),
            lambda g, t: F.concat(g, F.lit(" "), t),
        )
    out = F.array_distinct(F.filter(grams, lambda g: g.isNotNull()))
    # null text -> null tokens -> null grams; the historical contract is []
    return F.coalesce(out, F.array().cast("array<string>"))


def text_stats_table(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """All text-analysis stats in one pass: (doc_id, n_tokens, n_pieces,
    stopword_ratio, quality, lang_guess, fp).

    The column functions above are composable but each tokenizes its own
    input, and Spark evaluates repeated token splits per reference (no
    common-subexpression elimination across higher-order-function
    lambdas) — the per-column composition evaluates ~13 interpreted
    regex splits per row (measured 38 s at C=1M). This table form
    tokenizes each document ONCE: a single ``aggregate`` fold over the
    lowercase token array (referenced exactly once, like the minhash
    narrow plan) counts tokens and per-language stopword hits into one
    struct, and the regex stats (word-piece count, fingerprint) are
    computed in the same projection — all materialized as per-doc
    SCALARS (eager localCheckpoint, ~60 bytes/doc; an earlier version
    checkpointed the token arrays themselves, ~1.2 GB at C=1M, whose
    pinned blocks degraded every operator that ran after it in the same
    session). Every output stat derives from the stored struct. Values
    are bit-identical to the column functions (lowercasing never alters
    whitespace boundaries, so the lowercase token count equals the raw
    one; parity pytest + the DuckDB `text_stats` oracle stay green).
    """
    langs = sorted(LANG_STOPWORDS)  # de, en, es, fr, zh — lang_id's order
    init = F.struct(
        F.lit(0).alias("n"), *[F.lit(0).alias(lang) for lang in langs]
    )

    def upd(acc: Column, t: Column) -> Column:
        return F.struct(
            (acc["n"] + 1).alias("n"),
            *[
                (
                    acc[lang]
                    + F.when(t.isin(*LANG_STOPWORDS[lang]), 1).otherwise(0)
                ).alias(lang)
                for lang in langs
            ],
        )

    from libgrape_lite_spark import transients

    base = transients.transient_checkpoint(
        docs.select(
            F.col(id_col).alias("doc_id"),
            bpe_ish_token_count(F.col(text_col)).cast("long").alias("n_pieces"),
            fingerprint(F.col(text_col)).alias("fp"),
            F.aggregate(tokens(F.lower(F.col(text_col))), init, upd).alias("st"),
        )
    )

    st = F.col("st")
    n_tok = st["n"]
    # same int/int division and empty-doc 0.0 as stopword_ratio (the "en"
    # hit count IS the stopword hit count — identical word list)
    swr = F.when(n_tok > 0, st["en"] / n_tok).otherwise(0.0)
    quality = F.round(
        F.least(F.lit(1.0), n_tok / F.lit(64.0)) * (F.lit(0.5) + F.lit(0.5) * swr), 6
    )
    best = None
    for lang in langs:
        pair = F.struct(st[lang].alias("hits"), F.lit(lang).alias("lang"))
        best = (
            pair if best is None
            else F.when(st[lang] > best["hits"], pair).otherwise(best)
        )
    lang_guess = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return base.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        "n_pieces",
        F.round(swr, 6).alias("stopword_ratio"),
        quality.alias("quality"),
        lang_guess.alias("lang_guess"),
        "fp",
    )
