"""Cardinality sketching: HyperLogLog approximate count-distinct.

The 100-TB counterpart to the exact ``distinct_by_key`` (A4): instead of
shuffling every distinct value, each batch reduces to a fixed 2^p-byte
register vector (one row per batch) and the driver folds register maxima —
the exchange is O(batches × 2^p) bytes regardless of input size, and the
sketch merges associatively across partitions, runs, and archives.

Standard HLL (Flajolet et al. 2007) with the small-range linear-counting
correction; the hash is the engine's FNV-1a-64 (functions reuse one hash
family), so the estimate is fully deterministic for a given input set —
reruns and resumes reproduce it bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clp_core_ray.vec.tokenizer import _fnv1a64_tokens, _string_buffers


def _finalize(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: HLL reads the TOP bits, and both raw ints and
    FNV-1a of short strings are weak there — this mixes them through."""
    with np.errstate(over="ignore"):
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return v ^ (v >> np.uint64(31))


def _hash_col(col) -> np.ndarray:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        offsets, data = _string_buffers(col)
        h = _fnv1a64_tokens(data, offsets[:-1], np.diff(offsets))
    else:
        h = np.asarray(pc.cast(col, pa.int64())).astype(np.uint64)
    return _finalize(h)


def _registers(h: np.ndarray, p: int) -> np.ndarray:
    """Per-batch register maxima: reg[j] = max rank of hashes routed to j."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining 64-p bits, left-aligned in 64
    # rank = leading zeros of w within 64 bits + 1, capped for w == 0
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    # exact bit_length via frexp on the high 32 bits first (float64-safe)
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    _, e_hi = np.frexp(hi)
    _, e_lo = np.frexp(lo)
    bl[nz] = np.where(hi[nz] > 0, e_hi[nz] + 32, e_lo[nz])
    rank = np.where(nz, 64 - bl + 1, 64 - 0 + 1).astype(np.int64)
    rank = np.minimum(rank, 64 - p + 1)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    e = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting, small range
    return e


def approx_distinct(ds, col: str, p: int = 12) -> int:
    """Approximate distinct count of ``col`` (~1.04/sqrt(2^p) rel. error,
    ~1.6% at the default p=12). One streaming pass; the driver folds one
    2^p-byte register row per batch."""
    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        regs = _registers(_hash_col(b.column(col)), p)
        return pa.table({"regs": pa.array([regs], type=pa.list_(pa.uint8()))})

    folded = np.zeros(m, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        for i in range(t.num_rows):
            np.maximum(
                folded,
                np.asarray(t.column("regs")[i].values, dtype=np.uint8),
                out=folded,
            )
    return int(round(_estimate(folded)))


# --------------------------------------------------------------------------
# Misra-Gries / frequent-items summary
# --------------------------------------------------------------------------


def _mg_summary(values: np.ndarray, counts: np.ndarray,
                capacity: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Misra-Gries reduction of an exact count vector to ≤ capacity entries.

    Decrement every count by the (capacity+1)-largest and keep the positive
    remainder — the counter-vector formulation of MG. Returns (values,
    decremented counts, deduct) where ``deduct`` bounds the undercount of
    EVERY key (kept or dropped) in this summary.
    """
    if len(values) <= capacity:
        return values, counts, 0
    order = np.argsort(counts, kind="stable")[::-1]
    deduct = int(counts[order[capacity]])
    keep = order[:capacity]
    new = counts[keep] - deduct
    pos = new > 0
    return values[keep][pos], new[pos], deduct


def heavy_hitters(ds, col: str, *, k: int = 10, capacity: int = 4096) -> pa.Table:
    """Approximate top-k frequent values of ``col`` (Misra-Gries, mergeable).

    Each batch reduces to ≤ ``capacity`` (value, count) rows plus one deduct
    scalar — O(capacity) exchange per batch regardless of the batch's key
    cardinality, where an exact groupby-count would shuffle every distinct
    key (the A1/A4 cost this sketch avoids at 100-TB cardinalities). Partial
    summaries merge by summing counts (Agarwal et al., "Mergeable
    Summaries", PODS'12), keeping the ε = 1/(capacity+1) guarantee.

    Returns a small Arrow table (value, cnt_min, cnt_max) of the top k by
    guaranteed lower bound: cnt_min ≤ true ≤ cnt_max = cnt_min + Σ deducts.
    Every value with true frequency > Σ deducts is guaranteed present.
    When every batch has ≤ capacity distinct values the result is EXACT
    (cnt_min == cnt_max == true count).
    """
    def partial(b: pa.Table) -> pa.Table:
        # count(*) semantics: a null group still counts its rows
        g = b.select([col]).group_by(col).aggregate(
            [(col, "count", pc.CountOptions(mode="all"))])
        vals = g.column(col).combine_chunks()
        cnts = np.asarray(g.column(f"{col}_count"), dtype=np.int64)
        idx = np.arange(len(vals))
        kept_i, kept_c, deduct = _mg_summary(idx, cnts, capacity)
        out = vals.take(pa.array(kept_i))
        dcol = np.zeros(len(kept_c), dtype=np.int64)
        t = pa.table({col: out,
                      "cnt": pa.array(kept_c, type=pa.int64()),
                      "deduct": pa.array(dcol)})
        if deduct:
            # marker row carries this batch's deduct: downstream batches may
            # coalesce several partials, so deduct is summed column-wide
            marker = pa.table({col: pa.array([None], type=out.type),
                               "cnt": pa.array([0], type=pa.int64()),
                               "deduct": pa.array([deduct], type=pa.int64())})
            t = pa.concat_tables([t, marker])
        return t

    def _compress_merged(m: dict) -> tuple[dict, int]:
        vals = np.array(list(m.keys()), dtype=object)
        cnts = np.array(list(m.values()), dtype=np.int64)
        ki, kc, d = _mg_summary(np.arange(len(vals)), cnts, capacity)
        return {vals[i]: int(c) for i, c in zip(ki, kc)}, d

    merged: dict = {}
    total_deduct = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = pa.table(b)
        total_deduct += int(pc.sum(t.column("deduct")).as_py() or 0)
        for v, c in zip(t.column(col).to_pylist(),
                        t.column("cnt").to_pylist()):
            if c:
                merged[v] = merged.get(v, 0) + c
        if len(merged) > 4 * capacity:
            # keep the driver state O(capacity): MG-compress mid-stream
            # (deducts sum, preserving the bracketing guarantee)
            merged, d = _compress_merged(merged)
            total_deduct += d
    if len(merged) > capacity:
        vals = np.array(list(merged.keys()), dtype=object)
        cnts = np.array(list(merged.values()), dtype=np.int64)
        ki, kc, d = _mg_summary(np.arange(len(vals)), cnts, capacity)
        total_deduct += d
        merged = {vals[i]: int(c) for i, c in zip(ki, kc)}
    top = sorted(merged.items(),
                 key=lambda kv: (-kv[1], kv[0] is None, kv[0]))[:k]
    return pa.table({
        col: pa.array([v for v, _ in top]),
        "cnt_min": pa.array([c for _, c in top], type=pa.int64()),
        "cnt_max": pa.array([c + total_deduct for _, c in top],
                            type=pa.int64()),
    })


# --------------------------------------------------------------------------
# Approximate quantiles: mergeable weighted-sample sketch
# --------------------------------------------------------------------------


def _compress_weighted(vals: np.ndarray, wts: np.ndarray,
                       size: int) -> tuple[np.ndarray, np.ndarray]:
    """Reduce a weighted value multiset to ≤ size points at equi-weight
    ranks. Deterministic; each kept point inherits an equal share of the
    total weight, so rank error per compression is ≤ W/size."""
    order = np.argsort(vals, kind="stable")
    v, w = vals[order], wts[order]
    total = w.sum()
    if len(v) <= size or total <= 0:
        return v, w
    # pick the value at rank (i+0.5)·total/size for i in 0..size-1
    cum = np.cumsum(w)
    targets = (np.arange(size, dtype=np.float64) + 0.5) * (total / size)
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(v) - 1)
    return v[idx], np.full(size, total / size)


def approx_quantiles(ds, col: str, qs: tuple[float, ...] = (0.5,),
                     *, sketch_size: int = 2048) -> dict[float, float]:
    """Approximate quantiles of a numeric column in one streaming pass.

    The continuous-value counterpart to the exact value-histogram exchange
    (``grouped_quantile_disc``): each batch reduces to ≤ ``sketch_size``
    (value, weight) points — fixed exchange size no matter the value
    cardinality, where a histogram of distinct doubles would be O(n).
    Partials merge by concatenation + re-compression (two levels: batch →
    driver), so total rank error is bounded by ~2·W/sketch_size ≈ 0.1% of
    rank at the default. Deterministic: equi-rank selection, no sampling.
    """
    def partial(b: pa.Table) -> pa.Table:
        col_arr = b.column(col).combine_chunks()
        vals = np.asarray(col_arr.drop_null(), dtype=np.float64)
        v, w = _compress_weighted(vals, np.ones(len(vals)), sketch_size)
        return pa.table({"v": pa.array(v), "w": pa.array(w)})

    pv, pw = [], []
    for b in ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        t = pa.table(b)
        pv.append(np.asarray(t.column("v"), dtype=np.float64))
        pw.append(np.asarray(t.column("w"), dtype=np.float64))
    if not pv or not sum(len(x) for x in pv):
        return {q: float("nan") for q in qs}
    v, w = _compress_weighted(np.concatenate(pv), np.concatenate(pw),
                              sketch_size * 4)
    cum = np.cumsum(w)
    total = cum[-1]
    out = {}
    for q in qs:
        i = int(np.searchsorted(cum, q * total, side="left"))
        out[q] = float(v[min(i, len(v) - 1)])
    return out


def approx_distinct_by(ds, key: str, col: str, p: int = 12,
                       alias: str = "approx_distinct"):
    """Approximate distinct ``col`` per ``key`` group (grouped HyperLogLog).

    Each batch emits ONE register row per key present in it — the exchange
    is O(batches × keys-per-batch × 2^p) bytes and never carries values, so
    a "distinct users per route" over 10^12 rows shuffles kilobytes per key
    where the exact path ships every distinct (key, value) pair. Register
    rows fold per key with an elementwise max inside each group (order-free,
    deterministic). Returns a Dataset of (key, alias).
    """
    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        kcol = b.column(key).combine_chunks()
        codes = pc.dictionary_encode(kcol)
        idx = np.asarray(codes.indices, dtype=np.int64)
        h = _hash_col(b.column(col))
        order = np.argsort(idx, kind="stable")
        sidx, sh = idx[order], h[order]
        bounds = np.flatnonzero(np.r_[True, sidx[1:] != sidx[:-1]])
        ends = np.r_[bounds[1:], len(sidx)]
        regs_out = [_registers(sh[b0:b1], p) for b0, b1 in zip(bounds, ends)]
        return pa.table({
            key: kcol.take(pa.array(order[bounds])),
            "regs": pa.array(regs_out, type=pa.list_(pa.uint8())),
        })

    def fold(group: pa.Table) -> pa.Table:
        folded = np.zeros(m, dtype=np.uint8)
        regs = group.column("regs").combine_chunks()
        flat = np.asarray(regs.flatten(), dtype=np.uint8).reshape(-1, m)
        np.maximum.reduce(flat, axis=0, out=folded)
        return pa.table({
            key: group.column(key).combine_chunks().slice(0, 1),
            alias: pa.array([int(round(_estimate(folded)))],
                            type=pa.int64()),
        })

    return (ds.select_columns([key, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .map_groups(fold, batch_format="pyarrow"))


def approx_quantiles_by(ds, key: str, col: str,
                        qs: tuple[float, ...] = (0.5,),
                        *, sketch_size: int = 512):
    """Approximate quantiles of ``col`` per ``key`` group (grouped sketch).

    Per batch, each key present reduces to ≤ ``sketch_size`` (value, weight)
    points; per-key fold = concatenate + re-compress inside the groupby.
    The exchange is O(keys-per-batch × sketch_size) per batch regardless of
    group sizes; rank error ~2/sketch_size per group. Deterministic.
    Returns a Dataset of (key, q_<pct>...) one row per key.
    """
    aliases = [f"q_{int(round(q * 100))}" for q in qs]

    def partial(b: pa.Table) -> pa.Table:
        kcol = b.column(key).combine_chunks()
        codes = pc.dictionary_encode(kcol)
        idx = np.asarray(codes.indices, dtype=np.int64)
        vals = pc.cast(b.column(col).combine_chunks(),
                       pa.float64()).to_numpy(zero_copy_only=False)
        order = np.argsort(idx, kind="stable")
        sidx, sv = idx[order], vals[order]
        bounds = np.flatnonzero(np.r_[True, sidx[1:] != sidx[:-1]])
        ends = np.r_[bounds[1:], len(sidx)]
        keys_out, v_out, w_out = [], [], []
        for b0, b1 in zip(bounds, ends):
            seg = sv[b0:b1]
            seg = seg[~np.isnan(seg)]
            if not len(seg):
                continue
            v, w = _compress_weighted(seg, np.ones(len(seg)), sketch_size)
            keys_out.append(int(b0))
            v_out.append(v)
            w_out.append(w)
        if not keys_out:
            return pa.table({key: kcol.slice(0, 0),
                             "v": pa.array([], type=pa.list_(pa.float64())),
                             "w": pa.array([], type=pa.list_(pa.float64()))})
        take = pa.array(order[np.array(keys_out)])
        return pa.table({
            key: kcol.take(take),
            "v": pa.array([x.tolist() for x in v_out],
                          type=pa.list_(pa.float64())),
            "w": pa.array([x.tolist() for x in w_out],
                          type=pa.list_(pa.float64())),
        })

    def fold(group: pa.Table) -> pa.Table:
        vs = group.column("v").combine_chunks()
        ws = group.column("w").combine_chunks()
        v, w = _compress_weighted(
            np.asarray(vs.flatten(), dtype=np.float64),
            np.asarray(ws.flatten(), dtype=np.float64),
            sketch_size * 4)
        cum = np.cumsum(w)
        total = cum[-1]
        cols = {key: group.column(key).combine_chunks().slice(0, 1)}
        for q, a in zip(qs, aliases):
            i = int(np.searchsorted(cum, q * total, side="left"))
            cols[a] = pa.array([float(v[min(i, len(v) - 1)])])
        return pa.table(cols)

    return (ds.select_columns([key, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .map_groups(fold, batch_format="pyarrow"))


def approx_distinct_window(ds, *, key_col: str, ts_col: str = "ts",
                           window_days: int = 7, p: int = 12,
                           alias: str = "approx_wau"):
    """Approximate trailing-window distinct count per day (HLL WAU) — the
    100-TB scale path for windows.trailing_distinct_count: HLL registers
    union losslessly (elementwise max), so a day's sketch is built once
    and every window containing it reuses it, where the exact path must
    replicate (day, key) pairs per window.

    Per batch: one register row per day present; fold = per-day register
    max (one groupby); the day×2^p register table (bounded: one row per
    DAY) folds on the driver where the trailing merge is a window_days
    sliding elementwise max over the day axis. Approximate by design →
    rows-only query; error bound pinned vs the exact operator in pytest.
    """
    import ray.data as rd

    from clp_core_ray.pipelines.aggregate import add_time_bucket

    m = 1 << p
    bucketed = add_time_bucket(ds.select_columns([key_col, ts_col]),
                               ts_col, "day", out_col="_d")

    def partial(b: pa.Table) -> pa.Table:
        d = b.column("_d").cast(pa.timestamp("us")).cast(pa.int64())
        dn = np.asarray(d, dtype=np.int64)
        h = _hash_col(b.column(key_col))
        order = np.argsort(dn, kind="stable")
        sd, sh = dn[order], h[order]
        bounds = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
        ends = np.r_[bounds[1:], len(sd)]
        return pa.table({
            "_d": pa.array(sd[bounds]),
            "regs": pa.array([_registers(sh[b0:b1], p)
                              for b0, b1 in zip(bounds, ends)],
                             type=pa.list_(pa.uint8())),
        })

    def fold(group: pa.Table) -> pa.Table:
        folded = np.zeros(m, dtype=np.uint8)
        regs = group.column("regs").combine_chunks()
        flat = np.asarray(regs.flatten(), dtype=np.uint8).reshape(-1, m)
        np.maximum.reduce(flat, axis=0, out=folded)
        return pa.table({"_d": group.column("_d").combine_chunks()
                         .slice(0, 1),
                         "regs": pa.array([folded],
                                          type=pa.list_(pa.uint8()))})

    day_regs = (bucketed.map_batches(partial, batch_format="pyarrow")
                .groupby("_d").map_groups(fold, batch_format="pyarrow"))
    tabs = [pa.table(b) for b in day_regs.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tabs)
    days = np.asarray(t.column("_d"), dtype=np.int64)
    order = np.argsort(days)
    days = days[order]
    regs = np.asarray(t.column("regs").combine_chunks().flatten(),
                      dtype=np.uint8).reshape(-1, m)[order]
    US_DAY = 86_400_000_000
    out = np.empty(len(days), dtype=np.int64)
    for i, d in enumerate(days):
        in_win = (days > d - window_days * US_DAY) & (days <= d)
        merged = np.maximum.reduce(regs[in_win], axis=0)
        out[i] = int(round(_estimate(merged)))
    return rd.from_arrow(pa.table({
        "day": pa.array(days).cast(pa.timestamp("us")),
        alias: pa.array(out)}))


def cms_build(ds, col: str, *, width: int = 2048, depth: int = 4):
    """Count-min sketch (Cormode & Muthukrishnan 2005) over ``col``:
    returns (sketch[depth, width] int64, total_n). Per batch each of the
    ``depth`` rows gets np.add.at of the batch's key hashes under an
    independent (splitmix-derived) hash — a fixed depth×width grid rides
    the exchange per batch (one row each), never the keys. Sketches merge
    by elementwise +, so the fold is a plain sum; estimates overcount only
    (min over rows), ε = e/width with probability 1 − e^−depth.
    """
    salts = (np.arange(1, depth + 1, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))

    def partial(b: pa.Table) -> pa.Table:
        h = _hash_col(b.column(col))
        grid = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            pos = (_finalize(h ^ salts[d]) % np.uint64(width)).astype(np.int64)
            np.add.at(grid[d], pos, 1)
        return pa.table({"_row": pa.array(np.arange(depth)),
                         "grid": pa.array(list(grid),
                                          type=pa.list_(pa.int64())),
                         "n": pa.array([len(h)] * depth)})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    tabs = [pa.table(b) for b in parts.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tabs)
    rows = np.asarray(t.column("_row"), dtype=np.int64)
    flat = np.asarray(t.column("grid").combine_chunks().flatten(),
                      dtype=np.int64).reshape(-1, width)
    sketch = np.zeros((depth, width), dtype=np.int64)
    np.add.at(sketch, rows, flat)
    total = int(np.asarray(t.column("n"), dtype=np.int64)[rows == 0].sum())
    return sketch, total


def cms_query(sketch: np.ndarray, keys, *, col_type=None) -> np.ndarray:
    """Point-query estimates for ``keys`` against a cms_build sketch:
    min over depth rows — always ≥ the true count, ≤ true + ε·N w.h.p."""
    depth, width = sketch.shape
    arr = keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) \
        else pa.array(keys, type=col_type)
    h = _hash_col(arr)
    salts = (np.arange(1, depth + 1, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        pos = (_finalize(h ^ salts[d]) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, sketch[d, pos])
    return est
