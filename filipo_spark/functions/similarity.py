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


def _ngrams(c: Column, n: int, pad: bool = False) -> Column:
    """Distinct character n-grams via sequence+transform (no UDF).
    ``pad`` adds n-1 sentinel chars both ends (sotorrent's 'Padding'
    variants — boosts weight of string boundaries)."""
    s = _norm(c)
    if pad:
        p = F.lit("#" * (n - 1))
        s = F.concat(p, s, p)
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(n))))


def _word_shingles(c: Column, n: int) -> Column:
    """Distinct word n-shingles (sotorrent 'nShingle' family)."""
    toks = F.split(_norm(c), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


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


def _set_metric(measure: str, unit: str, n: int, pad: bool = False) -> MetricFn:
    """Factory for the set-similarity grid: measure × unit × size × pad
    (the reference's ~40 configured n-gram/shingle names collapse to
    this one parameterization — each registry entry is a distinct
    Column expression, not a re-export)."""

    def fn(a: Column, b: Column) -> Column:
        if unit == "gram":
            ua, ub = _ngrams(a, n, pad), _ngrams(b, n, pad)
        else:
            ua, ub = _word_shingles(a, n), _word_shingles(b, n)
        inter, na, nb = _set_sizes(ua, ub)
        if measure == "jaccard":
            return F.when(na + nb - inter > 0, inter / (na + nb - inter)).otherwise(
                F.lit(0.0)
            )
        if measure == "dice":
            return F.when(na + nb > 0, 2 * inter / (na + nb)).otherwise(F.lit(0.0))
        return F.when(F.least(na, nb) > 0, inter / F.least(na, nb)).otherwise(F.lit(0.0))

    return fn


# --- pandas-UDF metrics (Arrow-batched; probe-sample only) -----------------
# The three edit metrics Spark lacks natively: LCS, Optimal-Alignment
# (= OSA / restricted Damerau: adjacent transposition, no re-edit), and
# true Damerau-Levenshtein (unrestricted, with the last-occurrence
# table).  Each ± the case-fold normalization (sotorrent's
# '... Normalized' variants).  O(n·m) bounded at 64 chars per value —
# these run only inside the bounded probe sample.


def _lcs_len(x: str, y: str) -> int:
    prev = [0] * (len(y) + 1)
    for ci in x:
        cur = [0]
        for j, cj in enumerate(y, 1):
            cur.append(prev[j - 1] + 1 if ci == cj else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def _osa_dist(x: str, y: str) -> int:
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
    return d[lx][ly]


def _dl_dist(x: str, y: str) -> int:
    """True Damerau-Levenshtein (transposed chars may be re-edited)."""
    lx, ly = len(x), len(y)
    maxd = lx + ly
    da: dict[str, int] = {}
    d = [[maxd] * (ly + 2) for _ in range(lx + 2)]
    for i in range(lx + 1):
        d[i + 1][1] = i
    for j in range(ly + 1):
        d[1][j + 1] = j
    for i in range(1, lx + 1):
        db = 0
        for j in range(1, ly + 1):
            k, l_ = da.get(y[j - 1], 0), db
            cost = 0 if x[i - 1] == y[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l_] + (i - k - 1) + 1 + (j - l_ - 1),
            )
        da[x[i - 1]] = i
    return d[lx + 1][ly + 1]


def _edit_metric(kind: str, norm: bool) -> MetricFn:
    @F.pandas_udf(DoubleType())
    def udf(a: pd.Series, b: pd.Series) -> pd.Series:
        def sim(x: str, y: str) -> float:
            x, y = (x or ""), (y or "")
            if norm:
                x, y = x.lower().strip(), y.lower().strip()
            if not x or not y:
                return 0.0
            if len(x) > 64 or len(y) > 64:  # bound O(n*m) on probe values
                x, y = x[:64], y[:64]
            mx = max(len(x), len(y))
            if kind == "lcs":
                return _lcs_len(x, y) / mx
            dist = _osa_dist(x, y) if kind == "osa" else _dl_dist(x, y)
            return 1.0 - dist / mx

        return pd.Series([sim(x, y) for x, y in zip(a, b)], dtype="float64")

    def fn(a: Column, b: Column) -> Column:
        return udf(a, b)

    return fn


def m_levenshtein_raw(a: Column, b: Column) -> Column:
    """Non-normalized levenshtein similarity (reference 'Levenshtein';
    the engine's 'Levenshtein' maps to 'Levenshtein Normalized')."""
    mx = F.greatest(F.length(a), F.length(b), F.lit(1)).cast("double")
    return F.lit(1.0) - F.levenshtein(a, b).cast("double") / mx


SIM_REGISTRY: dict[str, MetricFn] = {
    # equality family (StringSimilarityProcessor.java:30-33)
    "Equal": m_equal,
    "EqualNormalized": m_equal_normalized,
    "TokenEqual": m_token_equal,
    # edit family (:36-43) — native levenshtein; LCS/OSA/DL as Arrow UDFs
    "Levenshtein": m_levenshtein_norm,
    "LevenshteinRaw": m_levenshtein_raw,
    "LCS": _edit_metric("lcs", norm=True),
    "LCSRaw": _edit_metric("lcs", norm=False),
    "OptimalAlignment": _edit_metric("osa", norm=True),
    "OptimalAlignmentRaw": _edit_metric("osa", norm=False),
    "Damerau": _edit_metric("dl", norm=True),
    "DamerauRaw": _edit_metric("dl", norm=False),
    # token-set family (:46-51)
    "JaccardTokens": m_jaccard_tokens,
    "DiceTokens": m_dice_tokens,
    "OverlapTokens": m_overlap_tokens,
}

# n-gram / shingle grid (:54-113): measure × unit × n × padding — each a
# distinct parameterized Column expression
for _n in (2, 3, 4, 5):
    for _meas, _label in (("jaccard", "Jaccard"), ("dice", "Dice"), ("overlap", "Overlap")):
        SIM_REGISTRY[f"{_label}{_n}Gram"] = _set_metric(_meas, "gram", _n)
        SIM_REGISTRY[f"{_label}{_n}GramPad"] = _set_metric(_meas, "gram", _n, pad=True)
for _n in (2, 3):
    for _meas, _label in (("jaccard", "Jaccard"), ("dice", "Dice"), ("overlap", "Overlap")):
        SIM_REGISTRY[f"{_label}{_n}Shingle"] = _set_metric(_meas, "shingle", _n)

# metrics whose 1.0 means byte-ish identity; the vote tie rule prefers
# fuzzy metrics over these (AlignmentProcessor.java:566-571,649-650)
EQUALS_METRICS = {
    "Equal", "EqualNormalized", "TokenEqual", "NumericEqual", "RegExer", "Classifier",
}

# subset used for the wide probe join (the reference's configured-subset
# pattern, config.json:32-59); mostly native exprs + the Damerau Arrow
# UDF, which is bounded to the probe sample
DEFAULT_PROBE_METRICS = [
    "Equal",
    "EqualNormalized",
    "TokenEqual",
    "Levenshtein",
    "Damerau",
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


# the reference ships this ruleset in its default config (config.json's
# "ruleset": strip dashes for ISBN/ISSN-style ids; "/i" = compare
# case-insensitively)
DEFAULT_RULESET: list[dict] = [
    {"name": "isbn-issn", "filter": "-"},
    {"name": "insensitive-uri", "filter": "/i"},
]


def compile_ruleset(rules: list[dict]) -> MetricFn:
    """Compile a RegExer ruleset (RegExer.java:6-15 semantics) to ONE
    Column expression: 1.0 if ANY rule declares the values equal.

    Rule filter grammar (the reference's): a regex of chars to strip
    from both sides before comparing; a ``/i`` marker anywhere makes the
    comparison case-insensitive; ``/f`` forces equality (classifier
    bypass)."""

    def fn(a: Column, b: Column) -> Column:
        exprs = []
        for r in rules:
            filt = r["filter"]
            if "/f" in filt:
                exprs.append(F.lit(True))
                continue
            ci = "/i" in filt
            strip = filt.replace("/i", "")
            aa, bb = (a, b)
            if strip:
                aa = F.regexp_replace(aa, strip, "")
                bb = F.regexp_replace(bb, strip, "")
            if ci:
                aa, bb = F.lower(aa), F.lower(bb)
            exprs.append(aa == bb)
        if not exprs:
            return F.lit(0.0)
        out = exprs[0]
        for e in exprs[1:]:
            out = out | e
        return F.coalesce(out.cast("double"), F.lit(0.0))

    return fn
