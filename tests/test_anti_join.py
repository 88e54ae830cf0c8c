"""anti_join: exact NOT-EXISTS semantics incl. bloom false positives."""

import numpy as np
import pyarrow as pa

from clp_core_ray.pipelines.join import anti_join


def _collect(ds):
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tabs) if tabs else None


def test_anti_join_int_keys(ray_session):
    import ray.data as rd

    left = pa.table({
        "k": pa.array(list(range(100)), type=pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(100)]),
    })
    right = pa.table({"k": pa.array([i for i in range(100) if i % 3 == 0],
                                    type=pa.int64())})
    out = _collect(anti_join(rd.from_arrow(left).repartition(4),
                             rd.from_arrow(right).repartition(2), "k"))
    got = sorted(out.column("k").to_pylist())
    assert got == [i for i in range(100) if i % 3 != 0]
    assert set(out.column_names) == {"k", "payload"}


def test_anti_join_tiny_bloom_forces_false_positives(ray_session):
    import ray.data as rd

    # 2^6 = 64 bits with 200 build keys -> almost every probe is a bloom
    # hit; correctness must come entirely from the exact verify pass
    left = pa.table({"k": pa.array(list(range(400)), type=pa.int64())})
    right = pa.table({"k": pa.array(list(range(0, 400, 2)),
                                    type=pa.int64())})
    out = _collect(anti_join(rd.from_arrow(left).repartition(3),
                             rd.from_arrow(right), "k", log2_bits=6))
    assert sorted(out.column("k").to_pylist()) == list(range(1, 400, 2))


def test_anti_join_string_keys_distinct_names(ray_session):
    import ray.data as rd

    left = pa.table({"name": pa.array(["a", "b", "c", "d", "b"]),
                     "v": pa.array([1, 2, 3, 4, 5], type=pa.int64())})
    right = pa.table({"who": pa.array(["b", "x", "b"])})
    out = _collect(anti_join(rd.from_arrow(left), rd.from_arrow(right),
                             "name", "who"))
    assert sorted(zip(out.column("name").to_pylist(),
                      out.column("v").to_pylist())) == [
        ("a", 1), ("c", 3), ("d", 4)]


def test_anti_join_empty_right(ray_session):
    import ray.data as rd

    left = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    right = pa.table({"k": pa.array([], type=pa.int64())})
    out = _collect(anti_join(rd.from_arrow(left), rd.from_arrow(right), "k"))
    assert sorted(out.column("k").to_pylist()) == [1, 2, 3]
