"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched ``mapInPandas`` operators.

The image/audio decode libraries are NOT in this container (per the
build brief), so the *decode kernel* is stubbed: ``decoder="fake"``
produces deterministic pseudo-features (testable end-to-end), and
``decoder="real"`` raises ``NotImplementedError`` at the exact seam
where PIL/librosa/ffmpeg would plug in.  Everything Spark-side — the
schema, the Arrow batch shape, partition sizing, the UDF signature —
is real and tested.

Scale notes: binary payloads ride parquet as ``binary`` columns;
``mapInPandas`` streams Arrow batches so one task never materializes
more than ``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs;
repartition by size-bucket before decode to even out skewed blob sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def gen_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-bytes."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    size = (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(4096)) + 64).cast("int")
    # payload bytes derived from repeated md5 hex of the id (deterministic)
    payload = F.to_binary(
        F.substring(F.repeat(F.md5(F.col("id").cast("string")), 256), 1, size * 2),
        F.lit("hex"),
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        F.when(kinds == "image", (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1920)) + 16).cast("int")).alias("width"),
        F.when(kinds == "image", (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(1080)) + 16).cast("int")).alias("height"),
        F.when(kinds != "image", (F.pmod(F.xxhash64("id", F.lit(seed + 4)), F.lit(60000)) + 100).cast("int")).alias("duration_ms"),
        payload.alias("payload"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: fixed-dim feature from
    byte statistics.  Replace with PIL/librosa at the `real` seam."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float32)
    chunks = np.array_split(arr, dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32) / 255.0


def extract_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """media rows → (media_id, kind, n_bytes, feature[dim]) via
    mapInPandas (Arrow batches; the decode loop is per-blob by nature,
    but transport and scheduling are fully vectorized/distributed)."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "real decoders (PIL/librosa/ffmpeg) are not installed in "
                    "this container; plug them in here"
                )
            feats = [
                _fake_decode(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, max_side: int = 256, decoder: str = "fake"
) -> DataFrame:
    """Image resize: target geometry (aspect-preserving fit into
    ``max_side``) is computed JVM-side as pure column math — only the
    pixel kernel crosses into the Arrow batch.  ``fake`` kernel shrinks
    the payload proportionally to the pixel ratio (deterministic,
    transport-faithful); ``real`` raises at the PIL seam."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)
    imgs = media.where(F.col("kind") == "image")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest("width", "height")
    )
    planned = imgs.select(
        "media_id",
        F.col("width").alias("src_width"),
        F.col("height").alias("src_height"),
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("height"),
        "payload",
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resize (PIL) is not installed in this "
                    "container; plug it in here"
                )
            out = []
            for p, sw, sh, w, h in zip(
                pdf["payload"], pdf["src_width"], pdf["src_height"],
                pdf["width"], pdf["height"],
            ):
                if p is None:
                    out.append(None)
                    continue
                ratio = (w * h) / max(sw * sh, 1)
                out.append(bytes(p[: max(1, int(len(p) * ratio))]))
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return planned.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp —
    the shuffle-side of frame extraction (the decode itself is the same
    stubbed seam).  Pure column ops: sequence + explode."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )
