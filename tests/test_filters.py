"""clp_s structured search: KQL-ish parse → DNF → schema pruning → filter."""

import json

import pytest

from clp_core_ray.functions.filters import Pred, eval_dnf, parse_kql, to_dnf


def test_parse_and_dnf():
    ast = parse_kql('level: ERROR AND (errno > 5 OR msg: "failed *")')
    dnf = to_dnf(ast)
    assert len(dnf) == 2
    assert all(any(p.path == "level" for p in c) for c in dnf)


def test_not_pushdown():
    dnf = to_dnf(parse_kql("NOT (a: 1 OR b < 3)"))
    assert len(dnf) == 1
    ops = {(p.path, p.op) for p in dnf[0]}
    assert ("a", "neq") in ops and ("b", "gte") in ops


def test_exists():
    dnf = to_dnf(parse_kql("attrs.node: * AND NOT errno: *"))
    ops = {(p.path, p.op) for p in dnf[0]}
    assert ("attrs.node", "exists") in ops and ("errno", "nexists") in ops


def test_eval_on_table():
    import pyarrow as pa

    t = pa.table(
        {"level": ["ERROR", "INFO", "ERROR"], "errno": [7, None, 2],
         "msg": ["failed opening x", "ok", "failed again"]}
    )
    m = eval_dnf(t, to_dnf(parse_kql("level: ERROR AND errno > 5")))
    assert m.to_pylist() == [True, False, False]
    m2 = eval_dnf(t, to_dnf(parse_kql('msg: "failed *"')))
    assert m2.to_pylist() == [True, False, True]


def test_clps_search_end_to_end(ray_session, tmp_path):
    from clp_core_ray.functions.filters import clps_search
    from clp_core_ray.pipelines.clps import clps_compress

    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_clps import synth_ndjson

    lines = synth_ndjson(200)
    out = str(tmp_path / "arch")
    clps_compress(lines, out)

    # ground truth by brute force over parsed records
    recs = [json.loads(l) for l in lines]
    want = [i for i, r in enumerate(recs)
            if r.get("level") == "ERROR" and r.get("errno", -1) > 60]
    def rows(ds):
        df = ds.to_pandas().sort_values("log_event_idx")
        return [
            {"log_event_idx": int(i), **json.loads(j)}
            for i, j in zip(df["log_event_idx"], df["json"])
        ]

    got = rows(clps_search(out, "level: ERROR AND errno > 60"))
    assert [g["log_event_idx"] for g in got] == want
    assert all(g["errno"] > 60 for g in got)

    # wildcard over a ClpString leaf + schema pruning (metric tables skipped)
    got2 = rows(clps_search(out, 'msg: "*shard_1?.bin*"'))
    want2 = [i for i, r in enumerate(recs)
             if "msg" in r and __import__("re").match(r".*shard_1\d\.bin.*", r["msg"])]
    assert [g["log_event_idx"] for g in got2] == want2

    # EXISTS prunes to the metric schema only
    got3 = rows(clps_search(out, "metric: *"))
    assert len(got3) == sum(1 for r in recs if "metric" in r)
