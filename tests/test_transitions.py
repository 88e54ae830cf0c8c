"""event_transitions vs a brute-force lag reference."""

import collections

import numpy as np
import pyarrow as pa

from clp_core_ray.pipelines.temporal import event_transitions


def _ref(rows):
    by_user = collections.defaultdict(list)
    for eid, ts, uid, typ in rows:
        by_user[uid].append((ts, eid, typ))
    cnt = collections.Counter()
    for uid, evs in by_user.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            cnt[(a[2], b[2])] += 1
    return dict(cnt)


def test_transitions_match_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    rows = []
    for eid in range(400):
        rows.append((eid, int(rng.integers(0, 1000)),
                     int(rng.integers(0, 30)),
                     f"t{int(rng.integers(0, 5))}"))
    # planted ts ties within one user — id must break them
    rows += [(1000, 5, 99, "a"), (1001, 5, 99, "b"), (1002, 5, 99, "c")]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
    })
    out = event_transitions(rd.from_arrow(tbl).repartition(4))
    tabs = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tabs)
    got = {(p, n): c for p, n, c in zip(
        t.column("prev_type").to_pylist(),
        t.column("next_type").to_pylist(),
        t.column("cnt").to_pylist())}
    assert got == _ref(rows)
    assert got[("a", "b")] == 1 and got[("b", "c")] == 1


def test_transitions_single_events(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([1, 2], type=pa.int64()),
        "user_id": pa.array([10, 20], type=pa.int64()),
        "event_type": pa.array(["x", "y"]),
    })
    out = event_transitions(rd.from_arrow(tbl))
    assert sum(len(b) for b in out.iter_batches(batch_format="pyarrow")) == 0
