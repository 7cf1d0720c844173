"""Similarity registry vs pure-Python oracles (SURVEY §5.2 layer 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filipo_spark.functions.similarity import (
    SIM_REGISTRY,
    best_metric,
    regex_identifier_equal,
)

PAIRS = [
    ("hello world", "hello world"),
    ("Hello  World", "hello world"),
    ("world hello", "hello world"),
    ("kitten", "sitting"),
    ("abc def ghi", "abc xyz"),
    ("", "abc"),
    (None, "abc"),
    ("CA", "ca"),
    ("conv-001", "conv_001"),
    ("ca", "abc"),
    ("ab", "cb"),
    ("a b c", "a b d"),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(PAIRS, "a string, b string")


def _scores(df, name):
    fn = SIM_REGISTRY[name]
    rows = df.select("a", "b", F.round(fn(F.col("a"), F.col("b")), 4).alias("s")).collect()
    return {(r["a"], r["b"]): r["s"] for r in rows}


def test_equal_family(pairs_df):
    s = _scores(pairs_df, "Equal")
    assert s[("hello world", "hello world")] == 1.0
    assert s[("Hello  World", "hello world")] == 0.0
    sn = _scores(pairs_df, "EqualNormalized")
    assert sn[("Hello  World", "hello world")] == 1.0
    st = _scores(pairs_df, "TokenEqual")
    assert st[("world hello", "hello world")] == 1.0
    assert st[("kitten", "sitting")] == 0.0


def test_levenshtein_norm(pairs_df):
    s = _scores(pairs_df, "Levenshtein")
    assert s[("kitten", "sitting")] == round(1 - 3 / 7, 4)
    assert s[("hello world", "hello world")] == 1.0


def test_token_set_metrics(pairs_df):
    j = _scores(pairs_df, "JaccardTokens")
    assert j[("abc def ghi", "abc xyz")] == 0.25  # inter=1, union=4
    d = _scores(pairs_df, "DiceTokens")
    assert d[("abc def ghi", "abc xyz")] == 0.4  # 2*1/(3+2)
    o = _scores(pairs_df, "OverlapTokens")
    assert o[("abc def ghi", "abc xyz")] == 0.5  # 1/min(3,2)


def test_ngram_jaccard(pairs_df):
    def pyjacc(x, y, n):
        gx = {x[i : i + n] for i in range(max(len(x) - n + 1, 1))}
        gy = {y[i : i + n] for i in range(max(len(y) - n + 1, 1))}
        return len(gx & gy) / len(gx | gy)

    s = _scores(pairs_df, "Jaccard3Gram")
    assert s[("kitten", "sitting")] == round(pyjacc("kitten", "sitting", 3), 4)


def test_pandas_udf_metrics(pairs_df):
    lcs = _scores(pairs_df, "LCS")
    assert lcs[("kitten", "sitting")] == round(4 / 7, 4)
    dam = _scores(pairs_df, "Damerau")
    assert dam[("kitten", "sitting")] == round(1 - 3 / 7, 4)
    assert dam[(None, "abc")] == 0.0


def test_optimal_alignment_vs_true_damerau(pairs_df):
    """'ca' → 'abc': OSA distance 3 (no re-edit after transposition) but
    true DL distance 2 (transpose then insert) — the classic pair that
    separates Optimal-Alignment from Damerau-Levenshtein."""
    osa = _scores(pairs_df, "OptimalAlignment")
    dl = _scores(pairs_df, "Damerau")
    assert osa[("ca", "abc")] == 0.0  # 1 - 3/3
    assert dl[("ca", "abc")] == round(1 - 2 / 3, 4)
    # Raw variants skip case-folding
    raw = _scores(pairs_df, "OptimalAlignmentRaw")
    assert raw[("CA", "ca")] == 0.0
    assert osa[("CA", "ca")] == 1.0


def test_padding_and_shingle_variants(pairs_df):
    pad = _scores(pairs_df, "Jaccard2GramPad")
    nopad = _scores(pairs_df, "Jaccard2Gram")
    # padded 'ab' = {#a, ab, b#}, 'cb' = {#c, cb, b#} → 1/5; unpadded → 0
    assert nopad[("ab", "cb")] == 0.0
    assert pad[("ab", "cb")] == 0.2
    sh = _scores(pairs_df, "Jaccard2Shingle")
    assert sh[("a b c", "a b d")] == round(1 / 3, 4)
    d4 = _scores(pairs_df, "Dice4Gram")
    assert d4[("hello world", "hello world")] == 1.0


def test_registry_breadth():
    """Coverage of the reference catalog's families: equality, edit (±
    normalized), token sets, n-gram 2-5 (± padding) × jaccard/dice/
    overlap, word shingles 2-3."""
    names = set(SIM_REGISTRY)
    for fam in ("Jaccard", "Dice", "Overlap"):
        for n in (2, 3, 4, 5):
            assert f"{fam}{n}Gram" in names and f"{fam}{n}GramPad" in names
        for n in (2, 3):
            assert f"{fam}{n}Shingle" in names
    for m in ("LCS", "OptimalAlignment", "Damerau", "Levenshtein"):
        assert m in names and (m + "Raw") in names
    assert len(names) >= 40


def test_compile_ruleset(spark):
    from filipo_spark.functions.similarity import DEFAULT_RULESET, compile_ruleset

    df = spark.createDataFrame(
        [("978-3-16", "9783-16"), ("ABC", "abc"), ("x", "y"), (None, "x")],
        "a string, b string",
    )
    fn = compile_ruleset(DEFAULT_RULESET)
    s = {(r["a"], r["b"]): r["s"] for r in df.select("a", "b", fn(F.col("a"), F.col("b")).alias("s")).collect()}
    assert s[("978-3-16", "9783-16")] == 1.0  # isbn-issn: strip dashes
    assert s[("ABC", "abc")] == 1.0  # /i rule
    assert s[("x", "y")] == 0.0
    assert s[(None, "x")] == 0.0
    force = compile_ruleset([{"name": "force", "filter": "/f"}])
    s2 = df.select(force(F.col("a"), F.col("b")).alias("s")).collect()
    assert all(r["s"] == 1.0 for r in s2)
    assert compile_ruleset([]) is not None  # empty ruleset → constant 0


def test_best_metric_argmax(spark):
    df = spark.createDataFrame([("world hello", "hello world")], "a string, b string")
    r = df.select(best_metric(F.col("a"), F.col("b")).alias("bm")).collect()[0]["bm"]
    assert r["score"] == 1.0 and r["metric"] == "TokenEqual"


def test_regex_identifier_equal(pairs_df):
    rows = pairs_df.select(
        "a", "b", regex_identifier_equal(F.col("a"), F.col("b")).alias("s")
    ).collect()
    s = {(r["a"], r["b"]): r["s"] for r in rows}
    assert s[("conv-001", "conv_001")] == 1.0
    assert s[("CA", "ca")] == 1.0
    assert s[("kitten", "sitting")] == 0.0


def test_default_classifier_heldout_generalization(spark):
    """VERDICT r3 #6: the shipped X2 model is scored on a DISJOINT
    vocabulary with adversarial negatives (shared prefixes, char
    transpositions) — the floor pins generalization, not memorization —
    and the RegExer ruleset alone demonstrably fails the same fixture
    (wrapped identifiers are beyond any strip rule)."""
    import numpy as np
    import pandas as pd

    from filipo_spark.functions.default_classifier import (
        _heldout_pairs,
        _training_pairs,
        heldout_accuracy,
    )
    from filipo_spark.functions.similarity import DEFAULT_RULESET, compile_ruleset

    train_vocab = {p for p, _ in _training_pairs()[0]}
    held_vocab = {p for p, _ in _heldout_pairs()[0]}
    assert not (train_vocab & held_vocab)  # zero leakage

    assert heldout_accuracy() >= 0.95

    pairs, labels = _heldout_pairs()
    df = spark.createDataFrame(
        [(a, b, bool(l)) for (a, b), l in zip(pairs, labels)],
        "a string, b string, label boolean",
    )
    fn = compile_ruleset(DEFAULT_RULESET)
    rows = df.select(
        "label", (fn(F.col("a"), F.col("b")) >= 0.5).alias("pred")
    ).collect()
    regexer_acc = sum(r["label"] == bool(r["pred"]) for r in rows) / len(rows)
    assert regexer_acc < 0.85  # the ruleset alone cannot pass this fixture
    assert heldout_accuracy() > regexer_acc + 0.1
