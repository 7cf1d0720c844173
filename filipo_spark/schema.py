"""Schemas and engine constants.

Target table shape is authoritative from BASELINE.json ``input_hint``:
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` with primary key ``(conv_id, turn_idx)``.

Change events mirror a binlog/WAL row image: ``lsn`` (unique, strictly
increasing — the replay/dedup tiebreaker) + ``op`` I/U/D + full payload.
The reference's analog of the key is its "identifier" relation set
(SchemaExtractor.java:96-133, functionality >= 0.996); here the key is
fixed and the functionality profiler (operators/profile.py) re-derives it.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- target table -----------------------------------------------------------
TARGET_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
TARGET_COLUMNS = [f.name for f in TARGET_SCHEMA.fields]
KEY_COLUMNS = ["conv_id", "turn_idx"]
PAYLOAD_COLUMNS = ["role", "text", "tool", "ts"]

# --- change stream -----------------------------------------------------------
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I | U | D
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
CHANGE_COLUMNS = [f.name for f in CHANGE_SCHEMA.fields]

# Drifted change stream: same lsn/op spine, payload as map<string,string>.
DRIFTED_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

# Raw-JSON drifted stream: payload is the wire-shape JSON string (C9);
# the mapper flattens it to dotted [i]-paths in one codegen projection.
DRIFTED_JSON_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("payload", T.StringType(), False),
    ]
)

# --- engine constants (FiLiPo threshold names kept for traceability;
# defaults from /root/reference/config.json:13-30) ----------------------------
STRING_SIMILARITY = 0.5  # config.json:17 — per-value similarity gate
RECORD_SIMILARITY = 0.1  # config.json:18 — matching-record gate
DISTRIBUTION_VARIANCE = 0.0  # config.json — combined-point co-occurrence slack
CANDIDATE_RESPONSES = 0.2  # config.json:21 — candidate response-rate gate
ERROR_THRESHOLD = 0.5  # config.json:22 — modal degenerate-value gate
FUNCTIONALITY_THRESHOLD = 0.996  # config.json:25 — identifier detection
MIN_SUPPORT = 0.4  # config.json:29
MIN_CONFIDENCE = 0.1  # config.json:30

N_BUCKETS_DEFAULT = 16  # physical hash buckets of the target table
