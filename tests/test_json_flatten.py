"""Raw-JSON flatten (C9, ResponseConverter.java:16-54 parity): nested
objects → dotted paths, arrays → [i] indices, null leaves dropped."""

from __future__ import annotations

from filipo_spark.functions.json_flatten import (
    infer_json_schema,
    json_flatten_long,
    json_payload_to_map,
)


def test_flatten_edge_cases(spark):
    rows = [
        (1, '{"a": {"b": [{"c": 1}, {"c": null}]}, "m": {"k1": "v1"}, '
            '"s": "x y", "arr": [1, 2]}'),
        (2, '{"a": {"b": []}, "s": null}'),
    ]
    df = spark.createDataFrame(rows, "id int, payload string")
    out = {
        (r["id"], r["key"]): r["value"]
        for r in json_flatten_long(df, "payload", ["id"]).collect()
    }
    assert out == {
        (1, "a.b[0].c"): "1",
        (1, "m.k1"): "v1",
        (1, "s"): "x y",
        (1, "arr[0]"): "1",
        (1, "arr[1]"): "2",
    }


def test_payload_to_map_feeds_mapper_flatten(spark):
    """json_payload_to_map output is the exact shape flatten_payload
    consumes (wildcard collapse downstream of the [i] indices)."""
    from filipo_spark.align.mapper import flatten_payload

    rows = [(7, "U", '{"tools": [{"name": "search"}, {"name": "python"}]}')]
    df = spark.createDataFrame(rows, "lsn long, op string, payload string")
    as_map = json_payload_to_map(df)
    assert dict(as_map.dtypes)["payload"] == "map<string,string>"
    flat = {
        (r["src_field"], r["src_value"]) for r in flatten_payload(as_map).collect()
    }
    assert flat == {("tools[*].name", "search"), ("tools[*].name", "python")}


def test_align_job_json_format(spark, tmp_path):
    """S2 dispatch end-to-end: a JSON-lines drifted WAL (payload = raw
    JSON string) through jobs/align.py --format json recovers the nested
    ground-truth mapping."""
    from filipo_spark.align.mapper import Mapping
    from filipo_spark.generators import gen_drifted, gen_echo_changelog, gen_transcripts
    from filipo_spark.jobs import align as align_job

    target = gen_transcripts(spark, n_conv=15, max_turns=10, seed=9)
    drifted = gen_drifted(gen_echo_changelog(target), "json")
    dpath, tpath = str(tmp_path / "wal"), str(tmp_path / "tgt")
    out = str(tmp_path / "mapping.json")
    drifted.write.json(dpath)
    target.write.parquet(tpath)
    align_job.main(["--drifted", dpath, "--format", "json", "--target", tpath, "--out", out])
    with open(out) as f:
        mapping = Mapping.from_json(f.read())
    assert mapping.as_dict() == {
        "conv_id": "message.conv",
        "turn_idx": "message.idx",
        "role": "message.meta.role",
        "text": "message.text",
        "tool": "tools[*].name",
        "ts": "message.meta.time",
    }


def _py_flatten(obj, prefix=""):
    """Pure-Python reference of the reference's flatten
    (ResponseConverter.java:16-54): dotted paths, [i] indices, null
    leaves dropped."""
    out = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.update(_py_flatten(v, f"{prefix}.{k}" if prefix else k))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            out.update(_py_flatten(v, f"{prefix}[{i}]"))
    elif obj is not None and prefix:
        if isinstance(obj, bool):
            out[prefix] = "true" if obj else "false"
        else:
            out[prefix] = str(obj)
    return out


def test_flatten_matches_python_oracle_property(spark):
    """Property: for random nested JSON objects, the codegen flatten
    equals the pure-Python reference flatten."""
    import json

    from hypothesis import given, settings, strategies as st

    keys = st.from_regex(r"[a-z][a-z0-9_]{0,5}", fullmatch=True)
    leaves = st.one_of(
        st.integers(-1000, 1000),
        st.booleans(),
        st.text(alphabet="abcxyz ", max_size=8),
        st.none(),
    )
    # arrays are type-homogeneous (nullable) — the shape real APIs emit;
    # heterogeneous arrays hit the documented array<string> inference
    # fallback and are out of contract
    homo_lists = st.one_of(
        st.lists(st.one_of(st.integers(-1000, 1000), st.none()), max_size=3),
        st.lists(st.one_of(st.booleans(), st.none()), max_size=3),
        st.lists(st.one_of(st.text(alphabet="abcxyz ", max_size=8), st.none()), max_size=3),
    )
    values = st.recursive(
        leaves,
        lambda children: st.one_of(
            homo_lists,
            st.dictionaries(keys, children, max_size=3),
        ),
        max_leaves=8,
    )
    objs = st.dictionaries(keys, values, min_size=1, max_size=4)

    @settings(max_examples=10, deadline=None)
    @given(obj=objs)
    def run(obj):
        payload = json.dumps(obj)
        df = spark.createDataFrame([(1, payload)], "id int, payload string")
        got = {
            r["key"]: r["value"]
            for r in json_flatten_long(df, "payload", ["id"]).collect()
        }
        assert got == _py_flatten(obj)

    run()


def test_schema_inference_merges_sparse_fields(spark):
    """Fields absent from some records (nulls omitted by the producer)
    still appear in the merged schema."""
    rows = [(1, '{"a": 1}'), (2, '{"b": "x"}')]
    df = spark.createDataFrame(rows, "id int, payload string")
    schema = infer_json_schema(df, "payload")
    assert {f.name for f in schema.fields} == {"a", "b"}
