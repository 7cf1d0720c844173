"""Classifier seam (X2): pluggable learned equality for identifiers.

The reference delegates identifier equality to an external
gradient-boosted classifier over a request socket
(``Similarity/Classifier/GbClassifier.java:12-26``, selected by
``config.json`` ``"classifier": "gbc"``) — one (id1, id2) pair per
round-trip.  The engine's seam is an **Arrow-batched pandas UDF**
wrapping a user-registered ``predict_batch`` callable
``(pd.Series, pd.Series) -> pd.Series[bool]`` — same contract, but
vectorized per batch and confined to the bounded probe sample, never
per-row RPC.

Register a model (any Python callable — sklearn ``predict``, an ONNX
session, a rule set) under a name, then pass ``classifier=<name>`` (or
the callable itself) to ``align()``.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

PredictBatch = Callable[[pd.Series, pd.Series], "pd.Series"]

_CLASSIFIERS: dict[str, PredictBatch] = {}


def register_classifier(name: str, predict_batch: PredictBatch) -> None:
    _CLASSIFIERS[name] = predict_batch


def resolve_classifier(ref: "str | PredictBatch") -> PredictBatch:
    if callable(ref):
        return ref
    if ref == "default" and "default" not in _CLASSIFIERS:
        # the shipped pure-numpy logistic (GbClassifier.java:12-26 analog)
        # — lazy so batch runs that never align pay nothing
        from filipo_spark.functions.default_classifier import predict_batch

        _CLASSIFIERS["default"] = predict_batch
    try:
        return _CLASSIFIERS[ref]
    except KeyError:
        raise ValueError(
            f"unknown classifier {ref!r}; registered: {sorted(_CLASSIFIERS)}"
        ) from None


def classifier_metric(ref: "str | PredictBatch") -> Callable[[Column, Column], Column]:
    """(a, b) → Column[double 0/1] wrapping predict_batch (GbClassifier
    isEquals analog, Arrow-batched)."""
    predict = resolve_classifier(ref)

    @F.pandas_udf(DoubleType())
    def udf(a: pd.Series, b: pd.Series) -> pd.Series:
        mask = a.notna() & b.notna()
        out = pd.Series(0.0, index=a.index)
        if mask.any():
            out[mask] = (
                pd.Series(predict(a[mask], b[mask]), index=a[mask].index)
                .astype(bool)
                .astype(float)
            )
        return out

    def fn(a: Column, b: Column) -> Column:
        return udf(a, b)

    return fn
