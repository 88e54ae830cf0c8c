"""Incremental compression: generation layering, delta-only work, removal
masking, no-op generations (pipelines/incremental.py)."""
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _snap(rows):
    def factory():
        return rd.from_items(rows)
    return factory


def _rows(convs: dict[str, list[str]]):
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    out = []
    for cid, texts in sorted(convs.items()):
        for i, tx in enumerate(texts):
            out.append({"conv_id": cid, "turn_idx": np.int32(i),
                        "role": "user" if i % 2 == 0 else "assistant",
                        "text": tx, "tool": "",
                        "ts": base_ts + np.timedelta64(i, "m")})
    return out


def test_incremental_generations(ray_session, tmp_path):
    from clp_core_ray.pipelines.incremental import (
        compress_incremental,
        decompress_incremental,
        incremental_stats,
    )

    base = str(tmp_path / "layers")
    snap0 = {"conv-a": ["hello there", "hi back"],
             "conv-b": ["ERROR upstream timeout after 3 retries", "ack"],
             "conv-c": ["to be removed soon", "yes"]}
    r0 = compress_incremental(_snap(_rows(snap0)), base)
    assert (r0["generation"], r0["added"], r0["compressed_rows"]) == (0, 3, 6)

    # gen1: conv-b changes, conv-c removed, conv-d added; conv-a untouched
    snap1 = {"conv-a": ["hello there", "hi back"],
             "conv-b": ["ERROR upstream timeout after 99 retries", "ack"],
             "conv-d": ["fresh conversation", "indeed"]}
    r1 = compress_incremental(_snap(_rows(snap1)), base)
    assert (r1["added"], r1["changed"], r1["removed"]) == (1, 1, 1)
    assert r1["compressed_rows"] == 4  # ONLY conv-b + conv-d rows

    got = decompress_incremental(base).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want = (rd.from_items(_rows(snap1)).to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert got["text"].tolist() == want["text"].tolist()
    assert got["conv_id"].tolist() == want["conv_id"].tolist()

    # gen2: no drift → empty generation, reconstruction unchanged
    r2 = compress_incremental(_snap(_rows(snap1)), base)
    assert (r2["added"], r2["changed"], r2["removed"],
            r2["compressed_rows"]) == (0, 0, 0, 0)
    assert os.path.exists(os.path.join(base, "gen-0002", "EMPTY"))
    again = decompress_incremental(base).to_pandas()
    assert len(again) == len(want)

    st = incremental_stats(base)
    assert st["generations"] == 3
    assert st["live_convs"] == 3
    assert st["live_convs_by_gen"] == {0: 1, 1: 2}  # conv-a @0; b,d @1


def test_conv_hashes_order_invariant(ray_session):
    """XOR fold: per-conv hash identical however turns split across blocks."""
    from clp_core_ray.pipelines.incremental import conv_hashes

    rows = _rows({"c1": ["a b c", "d e f", "g"], "c2": ["x", "y"]})
    one = conv_hashes(rd.from_items(rows)).to_pandas()
    many = conv_hashes(rd.from_items(rows).repartition(5)).to_pandas()
    a = dict(zip(one.conv_id, one.conv_hash))
    b = dict(zip(many.conv_id, many.conv_hash))
    assert a == b and len(a) == 2

    # any single-field change flips the hash
    mut = _rows({"c1": ["a b c", "d e f", "g!"], "c2": ["x", "y"]})
    c = conv_hashes(rd.from_items(mut)).to_pandas()
    c = dict(zip(c.conv_id, c.conv_hash))
    assert c["c1"] != a["c1"] and c["c2"] == a["c2"]


def test_rebase_incremental(ray_session, tmp_path):
    """Compaction: fold generations into a fresh base; reconstruction is
    unchanged, tombstoned rows are gone, and a follow-up incremental run
    against the rebased base detects zero drift (hash continuity)."""
    from clp_core_ray.pipelines.incremental import (
        compress_incremental,
        decompress_incremental,
        incremental_stats,
        rebase_incremental,
    )

    base = str(tmp_path / "layers")
    snap0 = {"conv-a": ["one", "two"], "conv-b": ["three", "four"],
             "conv-c": ["five"]}
    snap1 = {"conv-a": ["one", "two"], "conv-b": ["three", "FOUR!"],
             "conv-d": ["six", "seven"]}
    compress_incremental(_snap(_rows(snap0)), base)
    compress_incremental(_snap(_rows(snap1)), base)

    base2 = str(tmp_path / "rebased")
    res = rebase_incremental(base, base2)
    assert res["generation"] == 0 and res["compressed_rows"] == 6

    a = decompress_incremental(base).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    b = decompress_incremental(base2).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a["text"].tolist() == b["text"].tolist()
    assert incremental_stats(base2)["generations"] == 1

    # hash continuity: the same snapshot against the rebased base is a no-op
    r = compress_incremental(_snap(_rows(snap1)), base2)
    assert (r["added"], r["changed"], r["removed"]) == (0, 0, 0)
