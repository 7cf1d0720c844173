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


# --- BMP codec: a REAL decode path with no external library -----------------
# PIL/librosa stay stubbed ('real' seam above), but 24-bit uncompressed
# BMP is simple enough to encode/decode with numpy alone — giving the
# multimodal transport one hard-signal, DuckDB-oracle-able member
# (VERDICT r3 #8): geometry comes out of the little-endian header, channel
# means out of the padded BGR pixel array, so a decoder that mishandles
# the 4-byte row stride or channel order fails the oracle hash.

GEOMETRY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.IntegerType(), False),
        T.StructField("mean_g", T.IntegerType(), False),
        T.StructField("mean_b", T.IntegerType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

_BMP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _bmp_encode(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal BITMAPINFOHEADER 24-bit BMP: solid ``rgb`` fill, rows
    bottom-up, stride padded to 4 bytes (the format's real layout)."""
    stride = ((3 * w + 3) // 4) * 4
    row = bytes((rgb[2], rgb[1], rgb[0])) * w + b"\x00" * (stride - 3 * w)
    data = row * h
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    return header + data


def _bmp_decode(b: bytes) -> tuple[int, int, float, float, float]:
    """Parse header + pixel array → (width, height, mean_r/g/b).  The
    row padding is EXCLUDED from the means — averaging the zero pad
    bytes (the naive bug) shifts every mean and fails the oracle."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    stride = ((3 * w + 3) // 4) * 4
    arr = np.frombuffer(b, dtype=np.uint8, count=stride * abs(h), offset=off)
    px = arr.reshape(abs(h), stride)[:, : 3 * w].reshape(-1, 3).astype(np.float64)
    means = px.mean(axis=0)  # BGR on the wire
    return w, abs(h), float(means[2]), float(means[1]), float(means[0])


def encode_bmp_images(docs: DataFrame) -> DataFrame:
    """(doc_id, …) → (doc_id, payload: real BMP bytes).  Geometry and
    fill are pure doc_id arithmetic so an ANSI oracle can state the
    expected decode output without ever touching the binary."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        _bmp_encode(
                            int(i * 7 % 57 + 8),
                            int(i * 13 % 41 + 8),
                            (int(i * 3 % 256), int(i * 5 % 256), int(i * 11 % 256)),
                        )
                        for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(kernel, schema=_BMP_SCHEMA)


def image_geometry(images: DataFrame) -> DataFrame:
    """(doc_id, payload) → decoded geometry + per-channel means, Arrow
    batch transport (same mapInPandas shape as extract_features; the
    kernel is the real numpy BMP parser).  Means are exact integers for
    solid fills — emitted as int so the oracle compare is FP-free."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_bmp_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mean_r": [int(round(r[2])) for r in rows],
                    "mean_g": [int(round(r[3])) for r in rows],
                    "mean_b": [int(round(r[4])) for r in rows],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return images.mapInPandas(kernel, schema=GEOMETRY_SCHEMA)


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
