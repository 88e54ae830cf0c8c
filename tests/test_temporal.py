"""Temporal operators (pipelines/temporal.py) vs brute-force references.

Randomized inputs (fixed seed) hit the corner cases the bucketed/vectorized
paths must survive: duplicate right timestamps (tiebreak), keys present on
one side only, overlapping intervals for the same key, rows on bucket
boundaries, and empty sides.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from clp_core_ray.pipelines.temporal import (
    asof_join,
    interval_join,
    sliding_count,
)

US = 1_000_000


def _mk_left(rng, n, n_keys):
    return pd.DataFrame(
        {
            "lid": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, n) * US * 60, unit="us"
            ),
            "key": rng.integers(0, n_keys, n).astype(np.int64),
        }
    )


def _mk_right(rng, m, n_keys):
    # coarse timestamps force duplicate (key, rts) pairs → tiebreak exercised
    return pd.DataFrame(
        {
            "rid": np.arange(m, dtype=np.int64) + 10_000,
            "rts": pd.to_datetime(
                rng.integers(0, 100, m) * US * 6000, unit="us"
            ),
            "rkey": rng.integers(0, n_keys, m).astype(np.int64),
        }
    )


def _brute_asof(l, r):
    out = []
    for row in l.itertuples():
        cand = r[(r.rkey == row.key) & (r.rts <= row.ts)]
        if len(cand):
            best = cand.sort_values(["rts", "rid"]).iloc[-1]
            out.append((row.lid, int(best.rid)))
    return pd.DataFrame(out, columns=["lid", "rid"]).astype(np.int64)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_bruteforce():
    rng = np.random.default_rng(7)
    l = _mk_left(rng, 400, 13)
    r = _mk_right(rng, 120, 17)  # some keys never on the left and vice versa
    res = (
        asof_join(
            rd.from_pandas(l).repartition(5),
            rd.from_pandas(r).repartition(3),
            left_on="ts", left_by="key",
            right_on="rts", right_by="rkey",
            left_cols=["lid"], right_cols=["rid"],
            tiebreak="rid", how="inner", num_buckets=8,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = _brute_asof(l, r).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(res.astype(np.int64), exp)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_left_keeps_unmatched():
    rng = np.random.default_rng(11)
    l = _mk_left(rng, 100, 5)
    r = _mk_right(rng, 10, 2)
    res = asof_join(
        rd.from_pandas(l), rd.from_pandas(r),
        left_on="ts", left_by="key",
        right_on="rts", right_by="rkey",
        left_cols=["lid"], right_cols=["rid"],
        tiebreak="rid", how="left", num_buckets=4,
    ).to_pandas()
    assert len(res) == len(l)  # every left row survives
    matched = _brute_asof(l, r)
    got = res[res.rid.notna()].astype(np.int64).sort_values("lid")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        matched.sort_values("lid").reset_index(drop=True),
    )


def _brute_interval(l, r):
    out = []
    for row in l.itertuples():
        cand = r[
            (r.rkey == row.key) & (r.start <= row.ts) & (row.ts < r.end)
        ]
        out.extend((row.lid, int(c)) for c in cand.rid)
    return (
        pd.DataFrame(out, columns=["lid", "rid"])
        .astype(np.int64)
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_interval_join_overlapping_windows():
    rng = np.random.default_rng(3)
    l = _mk_left(rng, 500, 9)
    m = 80
    start = rng.integers(0, 9_000, m) * US * 60
    length = rng.integers(1, 2_000, m) * US * 60  # long → heavy overlap
    r = pd.DataFrame(
        {
            "rid": np.arange(m, dtype=np.int64),
            "start": pd.to_datetime(start, unit="us"),
            "end": pd.to_datetime(start + length, unit="us"),
            "rkey": rng.integers(0, 9, m).astype(np.int64),
        }
    )
    res = (
        interval_join(
            rd.from_pandas(l).repartition(4),
            rd.from_pandas(r).repartition(2),
            left_on="ts", left_by="key",
            right_start="start", right_end="end", right_by="rkey",
            left_cols=["lid"], right_cols=["rid"], num_buckets=8,
        )
        .to_pandas()
        .astype(np.int64)
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    exp = _brute_interval(l, r)
    assert len(exp) > 100  # the fixture must actually join
    pd.testing.assert_frame_equal(res, exp)


@pytest.mark.usefixtures("ray_session")
def test_interval_join_empty_side():
    l = pd.DataFrame(
        {"lid": [1], "ts": pd.to_datetime([0]), "key": [0]}
    )
    r = pd.DataFrame(
        {
            "rid": pd.Series([], dtype=np.int64),
            "start": pd.to_datetime(pd.Series([], dtype="int64")),
            "end": pd.to_datetime(pd.Series([], dtype="int64")),
            "rkey": pd.Series([], dtype=np.int64),
        }
    )
    res = interval_join(
        rd.from_pandas(l), rd.from_pandas(r),
        left_on="ts", left_by="key",
        right_start="start", right_end="end", right_by="rkey",
        left_cols=["lid"], right_cols=["rid"], num_buckets=4,
    ).to_pandas()
    assert len(res) == 0


@pytest.mark.usefixtures("ray_session")
def test_sliding_count_conservation():
    rng = np.random.default_rng(5)
    n = 1000
    ts = pd.to_datetime(rng.integers(0, 86_400, n) * US, unit="us")
    ds = rd.from_pandas(pd.DataFrame({"ts": ts})).repartition(6)
    out = sliding_count(ds, ts_col="ts", window_s=3600, slide_s=900).to_pandas()
    # every event lands in exactly window/slide = 4 windows
    assert out["cnt"].sum() == 4 * n
    # spot-check one window against brute force
    ws = out["ws"].iloc[len(out) // 2]
    lo, hi = ws, ws + pd.Timedelta(seconds=3600)
    assert out.loc[out.ws == ws, "cnt"].iloc[0] == int(
        ((ts >= lo) & (ts < hi)).sum()
    )
    # window starts are slide-aligned
    assert (out["ws"].astype(np.int64) % (900 * US) == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_asof_join_string_keys():
    rng = np.random.default_rng(19)
    l = _mk_left(rng, 200, 7)
    r = _mk_right(rng, 60, 7)
    ls = l.assign(key=l.key.map(lambda k: f"conv-{k}"))
    rs = r.assign(rkey=r.rkey.map(lambda k: f"conv-{k}"))
    res = (
        asof_join(
            rd.from_pandas(ls).repartition(3),
            rd.from_pandas(rs).repartition(2),
            left_on="ts", left_by="key",
            right_on="rts", right_by="rkey",
            left_cols=["lid"], right_cols=["rid"],
            tiebreak="rid", how="inner", num_buckets=8,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = _brute_asof(l, r).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(res.astype(np.int64), exp)


@pytest.mark.usefixtures("ray_session")
def test_grouped_topk_matches_bruteforce():
    from clp_core_ray.pipelines.temporal import grouped_topk

    rng = np.random.default_rng(23)
    n = 600
    df = pd.DataFrame(
        {
            "key": [f"u{k}" for k in rng.integers(0, 20, n)],
            "ts": pd.to_datetime(rng.integers(0, 50, n) * US, unit="us"),
            "eid": np.arange(n, dtype=np.int64),
        }
    )
    out = (
        grouped_topk(
            rd.from_pandas(df).repartition(5),
            key_col="key", order_col="ts", k=3,
            tiebreak_col="eid", descending=True, num_buckets=8,
        )
        .to_pandas()
        .sort_values(["key", "eid"])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["ts", "eid"], ascending=False)
        .groupby("key")
        .head(3)
        .sort_values(["key", "eid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["key", "eid"]], exp[["key", "eid"]])


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantile_disc_bruteforce():
    from clp_core_ray.pipelines.temporal import grouped_quantile_disc

    rng = np.random.default_rng(31)
    n = 800
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n).astype(np.int64),
            "v": np.round(rng.normal(size=n), 2),  # repeated values likely
        }
    )
    qs = (0.1, 0.5, 0.75)
    out = (
        grouped_quantile_disc(
            rd.from_pandas(df).repartition(5),
            key_col="k", val_col="v", qs=qs, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "q"])
        .reset_index(drop=True)
    )
    for k, grp in df.groupby("k"):
        vals = np.sort(grp.v.to_numpy())
        for q in qs:
            exp = vals[int(np.ceil(len(vals) * q)) - 1]
            got = out[(out.k == k) & (out.q == q)].v.iloc[0]
            assert got == exp, (k, q, got, exp)
    assert len(out) == df.k.nunique() * len(qs)


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantile_cont_bruteforce():
    """Interpolated quantiles equal numpy's linear percentile per key."""
    from clp_core_ray.pipelines.temporal import grouped_quantile_cont

    rng = np.random.default_rng(32)
    n = 700
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n).astype(np.int64),
            "v": np.round(rng.normal(size=n), 2),
        }
    )
    qs = (0.1, 0.5, 0.9)
    out = (
        grouped_quantile_cont(
            rd.from_pandas(df).repartition(5),
            key_col="k", val_col="v", qs=qs, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "q"])
        .reset_index(drop=True)
    )
    for k, grp in df.groupby("k"):
        vals = np.sort(grp.v.to_numpy())
        for q in qs:
            h = (len(vals) - 1) * q
            import math
            lo, hi = vals[math.floor(h)], vals[min(math.floor(h) + 1, len(vals) - 1)]
            f = h - math.floor(h)
            exp = lo * (1.0 - f) + hi * f
            got = out[(out.k == k) & (out.q == q)].v.iloc[0]
            assert got == exp, (k, q, got, exp)
    # single-value key: every quantile is that value
    one = grouped_quantile_cont(
        rd.from_pandas(pd.DataFrame({"k": [9], "v": [3.5]})),
        key_col="k", val_col="v", qs=(0.1, 0.9), num_buckets=2,
    ).to_pandas()
    assert set(one.v) == {3.5}


def test_funnel_strict_and_window_bounds(ray_session):
    """b.ts > a.ts is STRICT, window upper bound inclusive, keys isolated."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.pipelines.temporal import funnel_users

    W = 100
    rows = [  # (user, ts, type)
        (1, 0, "A"), (1, 100, "B"),    # exactly window later -> converts
        (2, 0, "A"), (2, 0, "B"),      # same ts -> NOT strict-later
        (3, 0, "A"), (3, 101, "B"),    # just outside window
        (4, 0, "B"), (4, 50, "A"),     # wrong order
        (5, 0, "A"), (6, 50, "B"),     # different users
        (7, 0, "A"), (7, 30, "C"),     # other event types ignored
        (7, 60, "B"),                  # ... but this B converts user 7
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype="datetime64[us]")),
        "et": pa.array([r[2] for r in rows])})
    got = sorted(funnel_users(
        rd.from_arrow(t).repartition(3), key="u", ts_col="ts", type_col="et",
        from_type="A", to_type="B", window_us=W,
        n_buckets=4).to_pandas()["u"].tolist())
    assert got == [1, 7]


def test_funnel_steps_greedy_semantics(ray_session):
    """Greedy earliest-first: the anchor is each key's EARLIEST step-0 event;
    a later anchor that would convert is not considered (differs from
    funnel_users' any-pair EXISTS). Chain must advance strictly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.pipelines.temporal import funnel_steps

    W = 100
    rows = [  # (user, ts, type)
        (1, 0, "A"), (1, 50, "B"), (1, 120, "C"),   # 0->50->120 converts
        (2, 0, "A"), (2, 200, "A"), (2, 250, "B"),  # earliest A misses B;
        (2, 290, "C"),                              # later A would convert
        (3, 0, "A"), (3, 50, "B"), (3, 50, "C"),    # C not strictly after B
        (4, 0, "B"), (4, 50, "A"), (4, 60, "B"),    # B-before-A ignored,
        (4, 100, "C"),                              # 50->60->100 converts
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype="datetime64[us]")),
        "et": pa.array([r[2] for r in rows])})
    got = sorted(funnel_steps(
        rd.from_arrow(t).repartition(3), key="u", ts_col="ts", type_col="et",
        steps=["A", "B", "C"], window_us=W,
        n_buckets=4).to_pandas()["u"].tolist())
    assert got == [1, 4]


@pytest.mark.usefixtures("ray_session")
def test_debounce_matches_lag_bruteforce():
    from clp_core_ray.pipelines.temporal import debounce

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 3_000, n).cumsum() * 0 +
            rng.integers(0, 500_000, n), unit="us"),
        "user_id": rng.integers(0, 7, n).astype(np.int64),
        "event_type": rng.choice(["a", "b"], n),
    })
    # force exact-tie timestamps within a key
    df.loc[1, ["ts", "user_id", "event_type"]] = df.loc[0, ["ts", "user_id",
                                                            "event_type"]]
    gap = 50_000  # 50 ms

    out = debounce(rd.from_pandas(df).repartition(4),
                   key_cols=["user_id", "event_type"], gap_us=gap,
                   num_buckets=8).to_pandas()

    ref = df.sort_values(["user_id", "event_type", "ts", "event_id"]).copy()
    pts = ref.groupby(["user_id", "event_type"])["ts"].shift()
    keep = pts.isna() | ((ref["ts"] - pts).dt.total_seconds() * 1e6 > gap)
    want = sorted(ref.loc[keep, "event_id"])
    assert sorted(out.event_id) == want
    assert len(out) < n  # the tie row and close repeats were dropped


def _brute_asof_dir(l, r, direction):
    out = []
    for row in l.itertuples():
        same = r[r.rkey == row.key]
        if direction == "forward":
            cand = same[same.rts >= row.ts]
            if len(cand):
                best = cand.sort_values(["rts", "rid"],
                                        ascending=[True, False]).iloc[0]
                out.append((row.lid, int(best.rid)))
        else:  # nearest: smaller |delta|, tie -> backward (largest rid)
            back = same[same.rts <= row.ts]
            fwd = same[same.rts > row.ts]
            b = (back.sort_values(["rts", "rid"]).iloc[-1]
                 if len(back) else None)
            f = (fwd.sort_values(["rts", "rid"],
                                 ascending=[True, True]).iloc[0]
                 if len(fwd) else None)
            if b is None and f is None:
                continue
            if b is None:
                pick = f
            elif f is None:
                pick = b
            else:
                bd = (row.ts - b.rts).value
                fd = (f.rts - row.ts).value
                pick = f if fd < bd else b
            out.append((row.lid, int(pick.rid)))
    return pd.DataFrame(out, columns=["lid", "rid"]).astype(np.int64)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_join_directions_match_bruteforce(direction):
    rng = np.random.default_rng(23)
    l = _mk_left(rng, 400, 13)
    r = _mk_right(rng, 120, 17)
    res = (
        asof_join(
            rd.from_pandas(l).repartition(5),
            rd.from_pandas(r).repartition(3),
            left_on="ts", left_by="key",
            right_on="rts", right_by="rkey",
            left_cols=["lid"], right_cols=["rid"],
            tiebreak="rid", how="inner", direction=direction,
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = _brute_asof_dir(l, r, direction).sort_values(
        "lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(res.astype(np.int64), exp)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_bad_direction():
    with pytest.raises(ValueError):
        asof_join(None, None, left_on="a", left_by="b", right_on="c",
                  right_by="d", left_cols=[], right_cols=[],
                  direction="sideways")


def test_interval_coverage(ray_session):
    """interval_coverage == brute-force union-of-intervals per key."""
    import numpy as np
    import ray.data as rd

    from clp_core_ray.pipelines.temporal import interval_coverage

    rng = np.random.default_rng(101)
    n = 3000
    key = rng.integers(0, 40, n)
    s = rng.integers(0, 10_000, n)
    e = s + rng.integers(0, 500, n)  # overlapping, some zero-length
    t = pa.table({"k": pa.array(key, type=pa.int64()),
                  "s": pa.array(s, type=pa.int64()),
                  "e": pa.array(e, type=pa.int64())})
    out = interval_coverage(rd.from_arrow(t).repartition(6), key_col="k",
                            start_col="s", end_col="e").to_pandas()
    got = dict(zip(out["k"], out["covered"]))

    want = {}
    for kk in np.unique(key):
        ivs = sorted(zip(s[key == kk], e[key == kk]))
        tot, cs, ce = 0, None, None
        for a, b in ivs:
            if cs is None:
                cs, ce = a, b
            elif a > ce:
                tot += ce - cs
                cs, ce = a, b
            else:
                ce = max(ce, b)
        tot += ce - cs
        want[kk] = tot
    assert got == want

    # string keys work too
    t2 = pa.table({"k": pa.array([str(x) for x in key]),
                   "s": t.column("s"), "e": t.column("e")})
    out2 = interval_coverage(rd.from_arrow(t2), key_col="k",
                             start_col="s", end_col="e").to_pandas()
    got2 = dict(zip(out2["k"], out2["covered"]))
    assert got2 == {str(k): v for k, v in want.items()}


def test_grouped_mad_vs_numpy(ray_session):
    """MAD vs brute force with quantile_disc semantics (sorted value at
    ceil(n*q)-1), including even-sized groups where disc != interpolated."""
    import math

    import numpy as np
    import ray.data as rd

    from clp_core_ray.pipelines.temporal import grouped_mad

    rng = np.random.default_rng(13)
    keys = np.array(["a", "b", "c"])[rng.integers(0, 3, 999)]
    vals = np.round(rng.normal(50, 20, 999), 2)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys),
                                 "v": pa.array(vals)})).repartition(4)
    out = grouped_mad(ds, key_col="k", val_col="v").to_pandas() \
        .set_index("k").sort_index()

    def qdisc(x, q=0.5):
        s = np.sort(x)
        return s[math.ceil(len(s) * q) - 1]

    for g in ["a", "b", "c"]:
        x = vals[keys == g]
        med = qdisc(x)
        assert out.loc[g, "med"] == med
        assert out.loc[g, "mad"] == qdisc(np.abs(x - med))


def test_time_weighted_avg_vs_bruteforce(ray_session):
    """Bucketed TWA == per-key pandas brute force, incl. duplicate
    timestamps (zero-width segments contribute nothing), single-event
    keys (dropped), and all-same-ts keys (dropped: zero span)."""
    from clp_core_ray.pipelines.temporal import time_weighted_avg

    rng = np.random.default_rng(31)
    n = 4000
    key = rng.integers(0, 37, n)
    ts = rng.integers(0, 500, n) * US  # heavy duplicate-ts pressure
    ts[key == 5] = 77 * US             # one key: all-equal ts -> dropped
    val = rng.normal(10, 4, n)
    eid = np.arange(n, dtype=np.int64)
    # a single-event key, isolated
    key[0], ts[0] = 900, 123 * US
    key[1:][key[1:] == 900] = 1
    t = pa.table({"k": pa.array(key, type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "v": pa.array(val), "eid": pa.array(eid)})
    got = (time_weighted_avg(rd.from_arrow(t).repartition(7), key_col="k",
                             ts_col="ts", val_col="v", id_col="eid")
           .to_pandas().set_index("k")["twa"].sort_index())

    df = t.to_pandas().sort_values(["k", "ts", "eid"])
    want = {}
    for k, g in df.groupby("k"):
        dt = g["ts"].values[1:].astype("int64") - \
            g["ts"].values[:-1].astype("int64")
        if len(g) < 2 or dt.sum() == 0:
            continue
        want[k] = np.round((g["v"].values[:-1] * dt).sum() / dt.sum(), 6)
    assert set(got.index) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6), k
    assert 5 not in got.index and 900 not in got.index


def test_grouped_ohlc_vs_bruteforce(ray_session):
    """grouped_ohlc fold == pandas first/last-by-(ts,id) + min/max/count,
    across batch boundaries and with duplicate timestamps."""
    from clp_core_ray.pipelines.aggregate import grouped_ohlc

    rng = np.random.default_rng(32)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.integers(0, 11, n), type=pa.int64()),
        "s": pa.array(rng.choice(["a", "b", "c"], n)),
        "ts": pa.array(rng.integers(0, 80, n) * US, type=pa.timestamp("us")),
        "v": pa.array(rng.normal(0, 9, n)),
        "eid": pa.array(rng.permutation(n).astype(np.int64)),
    })
    got = (grouped_ohlc(rd.from_arrow(t).repartition(9),
                        key_cols=["g", "s"], val_col="v", ts_col="ts",
                        id_col="eid")
           .to_pandas().set_index(["g", "s"]).sort_index())
    df = t.to_pandas().sort_values(["g", "s", "ts", "eid"])
    for (g, s), grp in df.groupby(["g", "s"]):
        row = got.loc[(g, s)]
        assert row["open"] == grp["v"].iloc[0]
        assert row["close"] == grp["v"].iloc[-1]
        assert row["high"] == grp["v"].max()
        assert row["low"] == grp["v"].min()
        assert row["cnt"] == len(grp)
    assert len(got) == df.groupby(["g", "s"]).ngroups


def test_new_kernels_empty_and_singleton_inputs(ray_session):
    """Zero-row and single-row datasets flow through every kernel added
    this session without crashing, with empty/expected outputs."""
    import ray.data as rd

    from clp_core_ray.pipelines.aggregate import grouped_ohlc
    from clp_core_ray.pipelines.temporal import (inter_event_gaps,
                                                 time_weighted_avg)
    from clp_core_ray.pipelines.windows import (grouped_ntile,
                                                grouped_percentiles)

    empty = pa.table({
        "k": pa.array([], type=pa.int64()),
        "g": pa.array([], type=pa.string()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "v": pa.array([], type=pa.float64()),
        "eid": pa.array([], type=pa.int64()),
    })
    one = pa.table({
        "k": pa.array([7], type=pa.int64()),
        "g": pa.array(["x"]),
        "ts": pa.array([123 * US], type=pa.timestamp("us")),
        "v": pa.array([1.5]),
        "eid": pa.array([0], type=pa.int64()),
    })
    for t in (empty, one):
        ds = rd.from_arrow(t)
        assert len(grouped_ohlc(ds, key_cols=["g"], val_col="v",
                                ts_col="ts", id_col="eid")
                   .to_pandas()) == (0 if t is empty else 1)
        assert len(time_weighted_avg(ds, key_col="k", ts_col="ts",
                                     val_col="v", id_col="eid")
                   .to_pandas()) == 0  # <2 events or zero span
        assert len(inter_event_gaps(ds, key_col="k", ts_col="ts",
                                    id_col="eid").to_pandas()) == 0
        nt = grouped_ntile(ds, key="g", val_col="v", row_id_col="eid",
                           n_tiles=4).to_pandas()
        pr = grouped_percentiles(ds, key="g", val_col="v",
                                 row_id_col="eid").to_pandas()
        if t is empty:
            assert len(nt) == 0 and len(pr) == 0
        else:
            assert list(nt["tile"]) == [1]
            assert list(pr["pct_rank"]) == [0.0]
            assert list(pr["cume_dist"]) == [1.0]


def test_grouped_first_by_matches_qualify(ray_session):
    """grouped_first_by (arbitrary mixed-direction sort keys incl. string
    order columns) == SQL QUALIFY row_number() = 1, on string keys."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.pipelines.temporal import grouped_first_by

    rng = np.random.RandomState(11)
    n = 5000
    t = pa.table({
        "k": pa.array([f"key-{i}" for i in rng.randint(0, 400, n)]),
        "s": pa.array([f"s{i:02d}" for i in rng.randint(0, 50, n)]),
        "v": pa.array(rng.randint(0, 1000, n).astype("int64")),
    })
    out = pa.concat_tables([pa.table(b) for b in grouped_first_by(
        rd.from_arrow(t).repartition(13), key_col="k",
        sort_keys=[("v", "descending"), ("s", "ascending")],
        num_buckets=7).iter_batches(batch_format="pyarrow")])
    ref = duckdb.connect().execute(
        "SELECT k, s, v FROM t QUALIFY row_number() OVER "
        "(PARTITION BY k ORDER BY v DESC, s) = 1").arrow()
    out = out.sort_by("k").combine_chunks()
    ref = ref.sort_by("k").combine_chunks().cast(out.schema)
    assert out.equals(ref)
