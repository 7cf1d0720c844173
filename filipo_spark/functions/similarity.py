"""String-similarity metric registry — vectorized re-expression of the
reference's metric catalog.

Reference: ``Similarity/StringSimilarityProcessor.java:26-114`` dispatches
26+ metric names from config (``config.json:32-59``) over the sotorrent
string-similarity library; ``:11-24`` arg-maxes over the configured set.
``Similarity/Classifier/RegExer.java:6-15`` adds regex-normalized
identifier equality.

Engine design:
* every metric is a **Column-expression factory** ``(Column, Column) ->
  Column(double in [0,1])`` — native Catalyst expressions wherever Spark
  has the primitive (equality, levenshtein, token sets, n-grams), so the
  probe join stays inside whole-stage codegen;
* the two metrics Spark lacks natively (LCS, Damerau) are Arrow-batched
  pandas UDFs (never per-row Python), used only inside the bounded probe
  sample (~10^2-10^3 pairs), mirroring the reference where these are the
  expensive tail too;
* ``best_metric(a, b, metrics)`` = arg-max over the registry via
  ``greatest(struct(score, name))`` — the vectorized analog of
  ``getMaxSimilarity`` (StringSimilarityProcessor.java:11-24).

Names keep the reference's vocabulary (README.md:22-30) for
traceability.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

MetricFn = Callable[[Column, Column], Column]

_WS = r"\s+"


def _norm(c: Column) -> Column:
    """Case-fold + trim + whitespace-collapse (C2; sotorrent 'normalized'
    variants — lowercase, collapsed separators)."""
    return F.regexp_replace(F.lower(F.trim(c)), _WS, " ")


def _tokens(c: Column) -> Column:
    return F.array_distinct(F.split(_norm(c), " "))


def _ngrams(c: Column, n: int) -> Column:
    """Distinct character n-grams via sequence+transform (no UDF)."""
    s = _norm(c)
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(n))))


def _set_sizes(a: Column, b: Column):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    na, nb = F.size(a).cast("double"), F.size(b).cast("double")
    return inter, na, nb


def m_equal(a: Column, b: Column) -> Column:
    return (a == b).cast("double")


def m_equal_normalized(a: Column, b: Column) -> Column:
    return (_norm(a) == _norm(b)).cast("double")


def m_token_equal(a: Column, b: Column) -> Column:
    """Equal token multisets regardless of order (reference 'Token-Equal')."""
    return (F.array_sort(F.split(_norm(a), " ")) == F.array_sort(F.split(_norm(b), " "))).cast(
        "double"
    )


def m_levenshtein_norm(a: Column, b: Column) -> Column:
    """1 - lev(a,b)/max(len) — Spark ships levenshtein() natively."""
    an, bn = _norm(a), _norm(b)
    mx = F.greatest(F.length(an), F.length(bn), F.lit(1)).cast("double")
    return F.lit(1.0) - F.levenshtein(an, bn).cast("double") / mx


def m_jaccard_tokens(a: Column, b: Column) -> Column:
    ta, tb = _tokens(a), _tokens(b)
    inter, na, nb = _set_sizes(ta, tb)
    return F.when(na + nb - inter > 0, inter / (na + nb - inter)).otherwise(F.lit(0.0))


def m_dice_tokens(a: Column, b: Column) -> Column:
    ta, tb = _tokens(a), _tokens(b)
    inter, na, nb = _set_sizes(ta, tb)
    return F.when(na + nb > 0, 2 * inter / (na + nb)).otherwise(F.lit(0.0))


def m_overlap_tokens(a: Column, b: Column) -> Column:
    ta, tb = _tokens(a), _tokens(b)
    inter, na, nb = _set_sizes(ta, tb)
    return F.when(F.least(na, nb) > 0, inter / F.least(na, nb)).otherwise(F.lit(0.0))


def _m_jaccard_ngram(n: int) -> MetricFn:
    def fn(a: Column, b: Column) -> Column:
        ga, gb = _ngrams(a, n), _ngrams(b, n)
        inter, na, nb = _set_sizes(ga, gb)
        return F.when(na + nb - inter > 0, inter / (na + nb - inter)).otherwise(F.lit(0.0))

    return fn


# --- pandas-UDF metrics (Arrow-batched; probe-sample only) -----------------

@F.pandas_udf(DoubleType())
def _lcs_norm_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    def lcs(x: str, y: str) -> float:
        x, y = (x or "").lower().strip(), (y or "").lower().strip()
        if not x or not y:
            return 0.0
        if len(x) > 64 or len(y) > 64:  # bound O(n*m) on probe values
            x, y = x[:64], y[:64]
        prev = [0] * (len(y) + 1)
        for ci in x:
            cur = [0]
            for j, cj in enumerate(y, 1):
                cur.append(prev[j - 1] + 1 if ci == cj else max(prev[j], cur[j - 1]))
            prev = cur
        return prev[-1] / max(len(x), len(y))

    return pd.Series([lcs(x, y) for x, y in zip(a, b)], dtype="float64")


def m_lcs_norm(a: Column, b: Column) -> Column:
    return _lcs_norm_udf(a, b)


@F.pandas_udf(DoubleType())
def _damerau_norm_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    def dl(x: str, y: str) -> float:
        x, y = (x or "").lower().strip(), (y or "").lower().strip()
        if not x or not y:
            return 0.0
        if len(x) > 64 or len(y) > 64:
            x, y = x[:64], y[:64]
        lx, ly = len(x), len(y)
        d = [[0] * (ly + 1) for _ in range(lx + 1)]
        for i in range(lx + 1):
            d[i][0] = i
        for j in range(ly + 1):
            d[0][j] = j
        for i in range(1, lx + 1):
            for j in range(1, ly + 1):
                cost = 0 if x[i - 1] == y[j - 1] else 1
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
                if i > 1 and j > 1 and x[i - 1] == y[j - 2] and x[i - 2] == y[j - 1]:
                    d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
        return 1.0 - d[lx][ly] / max(lx, ly)

    return pd.Series([dl(x, y) for x, y in zip(a, b)], dtype="float64")


def m_damerau_norm(a: Column, b: Column) -> Column:
    return _damerau_norm_udf(a, b)


SIM_REGISTRY: dict[str, MetricFn] = {
    "Equal": m_equal,
    "EqualNormalized": m_equal_normalized,
    "TokenEqual": m_token_equal,
    "Levenshtein": m_levenshtein_norm,
    "JaccardTokens": m_jaccard_tokens,
    "DiceTokens": m_dice_tokens,
    "OverlapTokens": m_overlap_tokens,
    "Jaccard2Gram": _m_jaccard_ngram(2),
    "Jaccard3Gram": _m_jaccard_ngram(3),
    "LCS": m_lcs_norm,
    "Damerau": m_damerau_norm,
}

# metrics whose 1.0 means byte-ish identity; the vote tie rule prefers
# fuzzy metrics over these (AlignmentProcessor.java:566-571,649-650)
EQUALS_METRICS = {"Equal", "EqualNormalized", "TokenEqual"}

# cheap native subset used for the wide probe join; pandas-UDF metrics are
# opt-in for narrow re-scoring (the reference's configured-subset pattern)
DEFAULT_PROBE_METRICS = [
    "Equal",
    "EqualNormalized",
    "TokenEqual",
    "Levenshtein",
    "JaccardTokens",
    "OverlapTokens",
    "Jaccard3Gram",
]


def best_metric(a: Column, b: Column, metrics: list[str] | None = None) -> Column:
    """struct(score double, metric string) of the winning metric — the
    vectorized getMaxSimilarity (StringSimilarityProcessor.java:11-24).
    Ties break toward the lexicographically LAST name, which is stable;
    the fuzzy-over-Equals preference is applied at vote time (A7)."""
    names = metrics or DEFAULT_PROBE_METRICS
    candidates = [
        F.struct(
            F.coalesce(SIM_REGISTRY[n](a, b), F.lit(0.0)).alias("score"),
            F.lit(n).alias("metric"),
        )
        for n in names
    ]
    return F.greatest(*candidates) if len(candidates) > 1 else candidates[0]


def regex_identifier_equal(a: Column, b: Column, strip: str = r"[\W_]") -> Column:
    """RegExer fast path (RegExer.java:6-15): strip filter chars, compare
    case-insensitively — routes identifier columns around the fuzzy scan
    (AlignmentProcessor.java:820-826,836-873)."""
    return (
        F.lower(F.regexp_replace(a, strip, "")) == F.lower(F.regexp_replace(b, strip, ""))
    ).cast("double")
