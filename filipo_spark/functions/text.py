"""Text-analysis column functions for large-scale training-data pipelines.

All pure Catalyst expressions (whole-stage codegen, no UDFs), each with
ANSI-SQL-expressible semantics so the DuckDB oracle can replicate them
exactly (the driver correctness gate).  These extend the engine beyond
the reference's operator set per the build brief: token counting,
quality scoring, language ID, fingerprinting over the ``documents``
table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists (language-ID heuristic).  Not
# linguistic truth — a reproducible n-gram/stopword vote, replicable in
# SQL on both engines.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
}

# BPE-ish token heuristic: word pieces, numbers, or single non-space
# symbols — a deterministic proxy for subword token counts
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def norm_text(c: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def tokens_ws(c: Column) -> Column:
    """Whitespace tokens of the trimmed text."""
    return F.split(F.trim(c), r"\s+")


def token_count_ws(c: Column) -> Column:
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(tokens_ws(c))
    )


def token_count_bpe(c: Column) -> Column:
    """Count of BPE-ish pieces (regexp_count is engine-portable)."""
    return F.regexp_count(c, F.lit(BPE_RE))


def punct_ratio(c: Column) -> Column:
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    toks = tokens_ws(F.lower(c))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    − punctuation excess.  Deterministic, SQL-replicable."""
    n = F.length(c)
    len_score = F.least(n.cast("double") / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 5, F.lit(1.0))
    punct_pen = F.least(punct_ratio(c) * 2, F.lit(1.0))
    raw = F.greatest(
        F.lit(0.0), (len_score * 0.4 + sw_score * 0.5 - punct_pen * 0.2 + 0.3)
    ).cast("double")
    # floor-truncate to 4 decimals: engine-portable (Spark rounds HALF_UP,
    # DuckDB half-even — they disagree exactly at .00005 boundaries)
    return F.floor(raw * 10000) / 10000


def lang_votes(c: Column, lang: str) -> Column:
    toks = F.array_distinct(tokens_ws(F.lower(c)))
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


LANG_PRIORITY = ["en", "es", "de"]  # tie-break order (highest wins ties)


def lang_id(c: Column) -> Column:
    """Arg-max stopword vote over known languages; 'und' when no votes.
    Ties break by LANG_PRIORITY (deterministic, SQL-replicable)."""
    structs = [
        F.struct(
            lang_votes(c, lg).alias("v"),
            F.lit(len(LANG_PRIORITY) - i).alias("prio"),
            F.lit(lg).alias("lg"),
        )
        for i, lg in enumerate(LANG_PRIORITY)
    ]
    best = F.greatest(*structs)
    return F.when(best["v"] > 0, best["lg"]).otherwise(F.lit("und"))


def fingerprint_md5(c: Column) -> Column:
    """Document fingerprint: md5 of normalized text (exact-dup key)."""
    return F.md5(norm_text(c))


def char_gram_hashes(c: Column, k: int = 5) -> Column:
    """Ordered md5 hashes of every char k-gram of the normalized text —
    the rolling-hash stream winnowing consumes (engine-portable)."""
    s = norm_text(c)
    n_grams = F.greatest(F.length(s) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.md5(s.substr(i, F.lit(k)))
    )


def common_prefix_len(a: Column, b: Column) -> Column:
    """Length of the longest common prefix of two strings — native
    expression (C5, reference Utils/Utils.java:30-38): first differing
    position via a filtered index sequence, no UDF."""
    n = F.least(F.length(a), F.length(b))
    diffs = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: a.substr(i, F.lit(1)) != b.substr(i, F.lit(1)),
    )
    return (
        # explicit null guard: least() skips NULL operands
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("int"))
        .when(n == 0, F.lit(0))
        .when(F.size(diffs) > 0, F.element_at(diffs, 1) - 1)
        .otherwise(n)
    )


def shingles(c: Column, k: int = 3) -> Column:
    """Distinct word k-shingles (arrays of k consecutive tokens joined by
    a space) — the unit for n-gram Jaccard and MinHash."""
    toks = tokens_ws(norm_text(c))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )
