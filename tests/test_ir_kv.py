"""Structured key-value IR stream (ffi/ir_stream Serializer/Deserializer,
version 0.1.0): wire-format round trips + Ray-level file round trip."""

import json

import numpy as np
import pyarrow as pa
import pytest

from clp_core_ray.ir_kv import (
    KvIrSerializer,
    deserialize_kv_ir_stream,
    serialize_kv_ir_stream,
)

RECORDS = [
    {"level": "INFO", "msg": "job 12 finished in 34.5 ms", "ok": True},
    {"attrs": {"node": 7, "labels": ["a", "b", 3], "empty": {}}, "v": None},
    {"n": -129, "big": 2**40, "huge": 2**35, "f": 0.25},
    {},  # empty user map → ValueEmpty marker
    {"nested": {"deep": {"er": {"est": "x y z"}}}},
    {"text": "no-space-token"},
]


@pytest.mark.parametrize("four_byte", [True, False])
def test_kv_ir_roundtrip(four_byte):
    buf = serialize_kv_ir_stream(RECORDS, four_byte=four_byte)
    meta, events = deserialize_kv_ir_stream(buf)
    assert meta["VERSION"] == "0.1.0"
    assert len(events) == len(RECORDS)
    for (auto, user), want in zip(events, RECORDS):
        assert auto == {}
        assert user == want


def test_kv_ir_auto_gen_namespace():
    """Auto-gen keys live in their own schema tree (ones'-complement ids) and
    never collide with user keys of the same name."""
    ser = KvIrSerializer()
    ser.serialize_event({"k": 1, "ts": "user-string"},
                        {"ts": 1700000000123, "seq": 0})
    ser.serialize_event({"k": 2}, {"ts": 1700000000456, "seq": 1})
    meta, events = deserialize_kv_ir_stream(ser.tobytes())
    assert events[0] == ({"ts": 1700000000123, "seq": 0},
                         {"k": 1, "ts": "user-string"})
    assert events[1] == ({"ts": 1700000000456, "seq": 1}, {"k": 2})


def test_kv_ir_schema_tree_nodes_emitted_once():
    """The second event reusing a key emits no new schema-tree-node unit —
    the key's name bytes appear exactly once in the stream."""
    ser = KvIrSerializer()
    ser.serialize_event({"shared_key_name": 1})
    ser.serialize_event({"shared_key_name": 2})
    buf = ser.tobytes()
    assert buf.count(b"shared_key_name") == 1
    _, events = deserialize_kv_ir_stream(buf)
    assert [u for _, u in events] == [{"shared_key_name": 1},
                                      {"shared_key_name": 2}]


def test_kv_ir_wide_schema_two_byte_ids():
    """>127 distinct keys force the two-byte node-id encoding."""
    rec = {f"k{i:04d}": i for i in range(300)}
    buf = serialize_kv_ir_stream([rec, rec])
    _, events = deserialize_kv_ir_stream(buf)
    assert events[0][1] == rec
    assert events[1][1] == rec


def test_kv_ir_clp_string_values():
    """Values with spaces use the embedded CLP message encoding (tag
    0x59/0x5A) and round-trip byte-exact, incl. vars the four-byte form
    must re-classify (9-digit+ ints, long floats)."""
    recs = [{"m": "took 45 ms on shard_7.bin errno=42"},
            {"m": "big 123456789012 float 3.14159265358979"},
            {"m": "neg -17 dict 0x7f"}]
    for four in (True, False):
        _, events = deserialize_kv_ir_stream(
            serialize_kv_ir_stream(recs, four_byte=four))
        assert [u for _, u in events] == recs


def test_kv_ir_ray_file_roundtrip(ray_session, tmp_path):
    """NDJSON Dataset → KV-IR files → Dataset, orderable by the auto-gen
    log_event_idx."""
    import ray.data as rd

    from clp_core_ray.ir_kv import read_kv_ir, write_kv_ir

    lines = [json.dumps({"k": i, "msg": f"event {i} done"}, sort_keys=True)
             for i in range(500)]
    ds = rd.from_arrow(pa.table({
        "log_event_idx": pa.array(np.arange(500), type=pa.int64()),
        "raw": pa.array(lines, type=pa.large_string()),
    })).repartition(4)
    paths = write_kv_ir(ds, str(tmp_path / "kvir"))
    assert len(paths) >= 1
    back = read_kv_ir(paths).to_pandas().sort_values("log_event_idx")
    assert back["json"].tolist() == lines


def test_kv_ir_ingest_to_clps_archive(ray_session, tmp_path):
    """KV-IR streams ingest into a clp_s archive (JsonParser::parse_from_ir
    role): archive reconstruction equals direct compression of the lines."""
    import ray.data as rd

    from clp_core_ray.ir_kv import write_kv_ir
    from clp_core_ray.pipelines.clps import (
        clps_compress_from_kv_ir,
        clps_decompress,
    )

    lines = [json.dumps({"k": i, "m": f"step {i} took {i * 3} ms"},
                        sort_keys=True) for i in range(300)]
    ds = rd.from_arrow(pa.table({
        "log_event_idx": pa.array(np.arange(300), type=pa.int64()),
        "raw": pa.array(lines, type=pa.large_string()),
    })).repartition(3)
    paths = write_kv_ir(ds, str(tmp_path / "kvir"))
    out = str(tmp_path / "arch")
    schemas = clps_compress_from_kv_ir(paths, out)
    assert sum(schemas.values()) == 300
    back = clps_decompress(out, ordered=True).to_pandas()["json"].tolist()
    assert back == lines


def test_kv_ir_kql_search(ray_session, tmp_path):
    """KQL evaluated directly over KV-IR chunks (no archive): the same
    eval_dnf kernel the archive scan uses, applied in flight."""
    import ray.data as rd

    from clp_core_ray.ir_kv import write_kv_ir
    from clp_core_ray.pipelines.clps import clps_search_kv_ir

    lines = [json.dumps({"k": i, "tag": "hot" if i % 7 == 0 else "cold"},
                        sort_keys=True) for i in range(400)]
    ds = rd.from_arrow(pa.table({
        "log_event_idx": pa.array(np.arange(400), type=pa.int64()),
        "raw": pa.array(lines, type=pa.large_string()),
    })).repartition(4)
    paths = write_kv_ir(ds, str(tmp_path / "kvir"))

    hits = clps_search_kv_ir(paths, 'tag: "hot" AND k >= 100').to_pandas()
    expect = [i for i in range(400) if i % 7 == 0 and i >= 100]
    assert sorted(hits["log_event_idx"].tolist()) == expect
    assert all('"tag": "hot"' in j for j in hits["json"])
