"""Temporal joins and windows Ray Data has no native operator for.

Three custom operators, each expressed as ONE hash shuffle plus a fully
vectorized in-group pass (the same shape as ``pipelines/windows.py``):

- :func:`asof_join` — for every left row, the latest right row with
  ``right_on <= left_on`` within the same key (DuckDB ``ASOF JOIN``
  semantics, with a deterministic tiebreak among equal ``right_on`` values).
  Both sides are hash-bucketed by key into ``num_buckets`` groups, so a key's
  full history meets in exactly one group; inside the group the merge is
  pandas ``merge_asof`` (compiled, sorted-merge, ``by=`` key).
- :func:`interval_join` — left rows against right ``[start, end)`` intervals
  sharing a key. In-group: jointly factorize keys, sort intervals by
  (key, start), then candidate expansion with ``np.repeat`` + one boolean
  mask. Output size is bounded by (intervals per key) × (left rows per key);
  the partitioning assumption is that a single key's intervals are modest
  (sessions/windows per user), which holds for the session-shaped inputs this
  targets — a pathological key fattens one bucket but never the driver.
- :func:`sliding_count` — tumbling-stride sliding windows (window = k ×
  slide): each event is expanded to its k covering window starts INSIDE the
  batch and pre-aggregated there (``np.unique`` partials), so the shuffle
  carries at most (windows present in batch) rows, not k × rows.

100-TB notes: the only all-to-all is the single ``groupby(_bucket)`` per
operator; buckets stream independently; skewed keys fatten one bucket while
the work inside stays vectorized. No stage materializes the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clp_core_ray.pipelines.windows import scaled_buckets
from clp_core_ray.vec.tokenizer import _fnv1a64_tokens, _string_buffers

N_BUCKETS = 64  # floor; operating point is windows.scaled_buckets()

_SPLITMIX = np.uint64(0x9E3779B97F4A7C15)


def _key_and_bucket(col, num_buckets: int) -> tuple[pa.Array, pa.Array]:
    """(int64 join key, bucket id) for an int or string key column.

    String keys join by their 64-bit FNV-1a hash — the same
    hash-as-identity assumption the dedup operators make (collisions are
    2^-64-scale); int keys join by value. Bucket = mixed hash % buckets."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        offsets, data = _string_buffers(col)
        h = _fnv1a64_tokens(data, offsets[:-1], np.diff(offsets))
        key = h.view(np.int64)
    else:
        key = np.asarray(pc.cast(col, pa.int64()))
        h = key.astype(np.uint64)
        h = (h ^ (h >> np.uint64(30))) * _SPLITMIX
        h = h ^ (h >> np.uint64(31))
    bucket = (h % np.uint64(num_buckets)).astype(np.int32)
    return pa.array(key), pa.array(bucket)


def _field_types(ds, cols: list[str]) -> list[pa.DataType]:
    """Arrow types for columns of a Dataset (parquet-backed OR pandas blocks)."""
    sch = ds.schema().base_schema
    if isinstance(sch, pa.Schema):
        return [sch.field(c).type for c in cols]
    m = dict(zip(sch.names, sch.types))  # PandasBlockSchema: numpy dtypes
    return [
        t if isinstance(t := m[c], pa.DataType) else pa.from_numpy_dtype(t)
        for c in cols
    ]


def _on_int64(col) -> pa.Array:
    """Normalize a timestamp/int ordering column to int64 (us for ts)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def _tag_union(left, right, l_spec, r_spec, num_buckets,
               l_types=None, r_types=None):
    """Map both sides onto one shared schema (side tag + nulls for the other
    side's columns) so a single groupby co-locates them.

    l_spec/r_spec: (on_col, key_col, keep_cols). Returns the union Dataset;
    shared columns are `_side`, `_on`, `_key`, then left keeps, right keeps.
    ``l_types``/``r_types`` override the kept columns' Arrow types (avoids a
    schema probe on a lazily-mapped side).
    """
    l_on, l_key, l_keep = l_spec
    r_on, r_key, r_keep = r_spec
    clash = set(l_keep) & set(r_keep)
    if clash:
        raise ValueError(f"column name clash between sides: {sorted(clash)}")

    def prep(on_col, key_col, keep, other_keep, other_schema, side):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            key, bucket = _key_and_bucket(batch.column(key_col), num_buckets)
            cols = {
                "_side": pa.array(np.full(n, side, dtype=np.int8)),
                "_bucket": bucket,
                "_on": _on_int64(batch.column(on_col)),
                "_key": key,
            }
            for c in keep:
                cols[c] = batch.column(c)
            for c, typ in zip(other_keep, other_schema):
                cols[c] = pa.nulls(n, type=typ)
            return pa.table(cols)

        return fn

    l_sch = l_types or _field_types(left, l_keep)
    r_sch = r_types or _field_types(right, r_keep)
    lt = left.map_batches(
        prep(l_on, l_key, l_keep, r_keep, r_sch, 0), batch_format="pyarrow"
    )
    rt = right.map_batches(
        prep(r_on, r_key, r_keep, l_keep, l_sch, 1), batch_format="pyarrow"
    )
    # column order must match for union
    order = ["_side", "_bucket", "_on", "_key"] + l_keep + r_keep
    lt = lt.map_batches(lambda b: b.select(order), batch_format="pyarrow")
    rt = rt.map_batches(lambda b: b.select(order), batch_format="pyarrow")
    return lt.union(rt)


def asof_join(
    left,
    right,
    *,
    left_on: str,
    left_by: str,
    right_on: str,
    right_by: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
    num_buckets: int | None = None,
):
    """As-of join: per left row, the latest right row with
    ``right_on <= left_on`` and equal key.

    ``tiebreak`` (a right column, must be in ``right_cols``) makes the winner
    among equal ``right_on`` values deterministic: the LARGEST tiebreak wins
    (SQL: ``ORDER BY right_on DESC, tiebreak DESC LIMIT 1`` per left row).
    ``how`` is 'inner' (drop unmatched, DuckDB ASOF JOIN) or 'left'.

    ``direction``: 'backward' (default — latest right_on <= left_on),
    'forward' (earliest right_on >= left_on; implemented as backward over
    negated time, so among equal right_on the largest tiebreak still wins),
    or 'nearest' (smaller |right_on - left_on|; equidistant → backward,
    pandas merge_asof's rule; equal-timestamp forward candidates resolve
    to the smallest tiebreak — the sort-order inheritance, documented).

    Keys are int-valued (ids); `_on` is a timestamp or int column.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    num_buckets = num_buckets or scaled_buckets()
    union = _tag_union(
        left,
        right,
        (left_on, left_by, left_cols),
        (right_on, right_by, right_cols),
        num_buckets,
    )
    r_sch = _field_types(right, right_cols)
    out_fields = list(
        zip(left_cols, _field_types(left, left_cols))
    ) + list(zip(right_cols, r_sch))
    out_schema = pa.schema(out_fields)

    def per_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("_side"))
        lt = g.filter(pa.array(side == 0)).select(["_on", "_key"] + left_cols)
        rt = g.filter(pa.array(side == 1)).select(["_on", "_key"] + right_cols)
        if lt.num_rows == 0 or (rt.num_rows == 0 and how == "inner"):
            return out_schema.empty_table()
        if rt.num_rows == 0:  # how == "left": all-null right side
            cols = {c: lt.column(c) for c in left_cols}
            for f in out_schema:
                if f.name not in cols:
                    cols[f.name] = pa.nulls(lt.num_rows, type=f.type)
            return pa.table(cols).cast(out_schema)
        # zero-copy numpy merge (no Arrow→pandas→Arrow round trip over the
        # join payload): sort right by (key, on[, tiebreak]) — stable, so
        # among equal (key, on) the LARGEST tiebreak (or last input row when
        # no tiebreak, merge_asof's rule) sorts last — then one merged
        # lexsort over both sides with rights BEFORE lefts at equal (key,
        # on). For every left row the latest right with the same key and
        # right_on <= left_on is then simply the last right row preceding it
        # in merged order, found with a cumulative count; if that row's key
        # differs, the left row is unmatched.
        lk = np.asarray(lt.column("_key"), dtype=np.int64)
        lo = np.asarray(lt.column("_on"), dtype=np.int64)
        rk = np.asarray(rt.column("_key"), dtype=np.int64)
        ro = np.asarray(rt.column("_on"), dtype=np.int64)
        if direction == "forward":  # forward(t) == backward(-t)
            lo, ro = -lo, -ro
        if tiebreak:
            tb = np.asarray(
                pc.cast(rt.column(tiebreak).combine_chunks(), pa.int64()))
            rorder = np.lexsort((tb, ro, rk))
        else:
            rorder = np.lexsort((ro, rk))
        rk_s, ro_s = rk[rorder], ro[rorder]
        n_r, n_l = len(rk_s), len(lk)
        mk = np.concatenate([rk_s, lk])
        mt = np.concatenate([ro_s, lo])
        mside = np.concatenate(
            [np.zeros(n_r, np.int8), np.ones(n_l, np.int8)])
        morder = np.lexsort((mside, mt, mk))
        is_right = mside[morder] == 0
        right_cum = np.cumsum(is_right)
        left_pos = np.flatnonzero(~is_right)
        lidx = morder[left_pos] - n_r  # original left row of each merged pos
        cnt = right_cum[left_pos]
        match = cnt - 1  # index into the sorted right side
        valid = cnt > 0
        vsel = np.flatnonzero(valid)
        valid[vsel] = rk_s[match[vsel]] == lk[lidx[vsel]]
        if direction == "nearest":
            f = cnt  # first right strictly after the left row (same sort)
            fsafe = np.minimum(f, n_r - 1)
            fvalid = (f < n_r) & (rk_s[fsafe] == lk[lidx])
            bdist = lo[lidx] - ro_s[np.maximum(match, 0)]
            fdist = ro_s[fsafe] - lo[lidx]
            use_f = (~valid & fvalid) | (valid & fvalid & (fdist < bdist))
            match = np.where(use_f, f, match)
            valid = valid | fvalid
        if how == "inner":
            keep = np.flatnonzero(valid)
            lsel = pa.array(lidx[keep])
            rsel = pa.array(rorder[match[keep]])
            cols = {c: lt.column(c).take(lsel) for c in left_cols}
            for c in right_cols:
                cols[c] = rt.column(c).take(rsel)
        else:  # left join: null right side for unmatched rows
            lsel = pa.array(lidx)
            ridx = np.where(valid, rorder[np.maximum(match, 0)], 0)
            rsel = pa.array(ridx, mask=~valid)  # null index → null output
            cols = {c: lt.column(c).take(lsel) for c in left_cols}
            for c in right_cols:
                cols[c] = rt.column(c).combine_chunks().take(rsel)
        return pa.table(cols).cast(out_schema)

    return union.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def interval_join(
    left,
    right,
    *,
    left_on: str,
    left_by: str,
    right_start: str,
    right_end: str,
    right_by: str,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int | None = None,
):
    """Interval (range) join: pairs where ``left_by == right_by`` and
    ``right_start <= left_on < right_end``. Intervals MAY overlap.

    Right rows carry their interval as two columns; the end column rides the
    union's ``_key2`` slot. In-group everything is numpy: joint key
    factorization, lexsort by (key, start), candidate expansion bounded by
    intervals-per-key, one mask.
    """
    # reuse _tag_union with right "_on" = start; carry end as an extra kept col
    end_tmp = "__end"
    clash = set(left_cols) & (set(right_cols) | {end_tmp})
    if clash:
        raise ValueError(f"column name clash: {sorted(clash)}")

    def add_end(batch: pa.Table) -> pa.Table:
        return batch.append_column(end_tmp, _on_int64(batch.column(right_end)))

    num_buckets = num_buckets or scaled_buckets()
    right2 = right.map_batches(add_end, batch_format="pyarrow")
    r_sch = _field_types(right, right_cols)
    union = _tag_union(
        left,
        right2,
        (left_on, left_by, left_cols),
        (right_start, right_by, right_cols + [end_tmp]),
        num_buckets,
        r_types=r_sch + [pa.int64()],
    )
    out_fields = [
        (c, t) for c, t in zip(left_cols, _field_types(left, left_cols))
    ] + list(zip(right_cols, r_sch))
    out_schema = pa.schema(out_fields)

    def per_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("_side"))
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        lkey = np.asarray(lt.column("_key"), dtype=np.int64)
        lts = np.asarray(lt.column("_on"), dtype=np.int64)
        rkey = np.asarray(rt.column("_key"), dtype=np.int64)
        rstart = np.asarray(rt.column("_on"), dtype=np.int64)
        rend = np.asarray(rt.column(end_tmp), dtype=np.int64)
        order = np.lexsort((rstart, rkey))
        rkey_s, rstart_s, rend_s = rkey[order], rstart[order], rend[order]
        lo = np.searchsorted(rkey_s, lkey, side="left")
        hi = np.searchsorted(rkey_s, lkey, side="right")
        reps = hi - lo
        total = int(reps.sum())
        if total == 0:
            return out_schema.empty_table()
        l_idx = np.repeat(np.arange(len(lkey)), reps)
        offs = np.zeros(len(lkey), dtype=np.int64)
        np.cumsum(reps[:-1], out=offs[1:])
        r_pos = np.arange(total, dtype=np.int64) - np.repeat(offs, reps) + np.repeat(lo, reps)
        lv = lts[l_idx]
        keep = (rstart_s[r_pos] <= lv) & (lv < rend_s[r_pos])
        l_take = pa.array(l_idx[keep])
        r_take = pa.array(order[r_pos[keep]])
        cols = {c: lt.column(c).take(l_take) for c in left_cols}
        for c in right_cols:
            cols[c] = rt.column(c).take(r_take)
        return pa.table(cols).cast(out_schema)

    return union.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def sliding_count(
    ds,
    *,
    ts_col: str = "ts",
    window_s: int = 3600,
    slide_s: int = 900,
    out_ts: str = "ws",
    out_cnt: str = "cnt",
):
    """Sliding-window counts: windows ``[ws, ws + window_s)`` at every
    ``slide_s`` boundary (epoch-aligned); window_s must be a multiple of
    slide_s. Per-batch the k covering window starts are expanded and
    pre-aggregated (``np.unique``), so the shuffle carries partial counts,
    not k× the event stream."""
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    k = window_s // slide_s

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(_on_int64(batch.column(ts_col)), dtype=np.int64)
        sec = ts // 1_000_000
        base = sec - (sec % slide_s)
        starts = (base[:, None] - np.arange(k, dtype=np.int64) * slide_s).ravel()
        uniq, cnt = np.unique(starts, return_counts=True)
        return pa.table(
            {"_ws_s": pa.array(uniq), out_cnt: pa.array(cnt.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_ws_s")
        .aggregate(Sum(out_cnt, alias_name=out_cnt))
    )

    def finish(batch: pa.Table) -> pa.Table:
        ws = pc.cast(
            pc.multiply(batch.column("_ws_s"), pa.scalar(1_000_000, pa.int64())),
            pa.timestamp("us"),
        )
        return pa.table({out_ts: ws, out_cnt: batch.column(out_cnt)})

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_topk(
    ds,
    *,
    key_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
    descending: bool = True,
    num_buckets: int | None = None,
):
    """Top-k rows per key by ``order_col`` (SQL ``QUALIFY row_number() OVER
    (PARTITION BY key ORDER BY order_col [DESC], tiebreak [DESC]) <= k``).

    Ray Data has no per-group limit; this is two stages, both bounded:
    (1) per-BATCH top-k per key (vectorized lexsort + rank-within-run) —
    shrinks each batch to ≤ k rows per key before the exchange, so the
    shuffle carries at most k × (keys per batch) rows; (2) the same pass
    inside each key-bucket group for the final answer. Deterministic via the
    required tiebreak column."""

    def topk_pass(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t
        # int or string keys (strings group by their 64-bit hash identity)
        key = np.asarray(_key_and_bucket(t.column(key_col), 1)[0])
        order_v = np.asarray(_on_int64(t.column(order_col)))
        tie = np.asarray(pc.cast(t.column(tiebreak_col).combine_chunks(), pa.int64()))
        if descending:
            order_v, tie = -order_v, -tie
        perm = np.lexsort((tie, order_v, key))
        ks = key[perm]
        new = np.ones(n, dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        # rank within key run = position - position of run start
        run_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        rank = np.arange(n) - run_start
        return t.take(pa.array(perm[rank < k]))

    def per_bucket(g: pa.Table) -> pa.Table:
        return topk_pass(g.drop_columns(["_bucket"]))

    num_buckets = num_buckets or scaled_buckets()

    def tag(b: pa.Table) -> pa.Table:
        b = topk_pass(b)
        _, bucket = _key_and_bucket(b.column(key_col), num_buckets)
        return b.append_column("_bucket", bucket)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_first_by(
    ds,
    *,
    key_col: str,
    sort_keys: list[tuple[str, str]],
    num_buckets: int | None = None,
):
    """First row per key under arbitrary pyarrow ``sort_keys`` (mixed
    directions, string order columns — the cases ``grouped_topk``'s
    int64-negation trick can't express). SQL ``QUALIFY row_number() OVER
    (PARTITION BY key ORDER BY ...) = 1``.

    Same two-stage bounded shape as ``grouped_topk``: a per-BATCH pass
    shrinks each batch to one row per key before the exchange (so the
    shuffle carries ≤ keys-per-batch rows), then the identical pass inside
    each key-hash bucket finalizes. Both passes are one ``pc.sort_indices``
    over (key, *sort_keys) plus a vectorized first-in-run mask — no
    per-group Python, bounded bucket count regardless of key cardinality."""

    def first_pass(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        order = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), *sort_keys])
        t = t.take(order)
        key = np.asarray(_key_and_bucket(t.column(key_col), 1)[0])
        new = np.ones(len(key), dtype=bool)
        new[1:] = key[1:] != key[:-1]
        return t.filter(pa.array(new))

    def per_bucket(g: pa.Table) -> pa.Table:
        return first_pass(g.drop_columns(["_bucket"]))

    num_buckets = num_buckets or scaled_buckets()

    def tag(b: pa.Table) -> pa.Table:
        b = first_pass(b)
        _, bucket = _key_and_bucket(b.column(key_col), num_buckets)
        return b.append_column("_bucket", bucket)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_quantile_disc(
    ds,
    *,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.5,),
    num_buckets: int | None = None,
):
    """Exact discrete quantiles per key (DuckDB ``quantile_disc`` semantics:
    the sorted value at index ``ceil(n·q) − 1``).

    Distributed as a value-histogram exchange: each batch pre-aggregates to
    (key, value, count) rows — the shuffle carries one row per distinct
    (key, value) per batch, not the value stream — then each key-bucket group
    sorts its histogram and reads the quantiles off the count cumsum. Exact
    for any value distribution; the exchange compresses only when values
    repeat (for continuous uniques it degrades to the sort-based exact cost,
    which is what exactness requires).

    Returns Dataset[(key_col, q, val_col)] with one row per key × q.
    """
    q_arr = np.asarray(sorted(qs), dtype=np.float64)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b.column(key_col), val_col: b.column(val_col)})
        out = t.group_by([key_col, val_col]).aggregate([(val_col, "count")])
        return out.rename_columns([key_col, val_col, "_cnt"])

    num_buckets = num_buckets or scaled_buckets()

    def tag(b: pa.Table) -> pa.Table:
        b = partial(b)
        _, bucket = _key_and_bucket(b.column(key_col), num_buckets)
        return b.append_column("_bucket", bucket)

    def per_bucket(g: pa.Table) -> pa.Table:
        key = np.asarray(_key_and_bucket(g.column(key_col), 1)[0])
        val = np.asarray(g.column(val_col).combine_chunks().cast(pa.float64()))
        cnt = np.asarray(g.column("_cnt"), dtype=np.int64)
        order = np.lexsort((val, key))
        ks, vs, cs = key[order], val[order], cnt[order]
        n = len(ks)
        new = np.ones(n, dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        seg = np.flatnonzero(new)
        seg_end = np.append(seg[1:], n)
        ccs = np.cumsum(cs)
        base = np.where(seg > 0, ccs[seg - 1], 0)
        totals = ccs[seg_end - 1] - base
        out_keys, out_q, out_v = [], [], []
        for s, e, b0, tot in zip(seg, seg_end, base, totals):
            ranks = np.ceil(tot * q_arr).astype(np.int64).clip(1, tot)
            pos = np.searchsorted(ccs[s:e] - b0, ranks, side="left")
            out_keys.append(np.full(len(q_arr), s))
            out_q.append(q_arr)
            out_v.append(vs[s + pos])
        if not out_keys:
            return pa.table(
                {key_col: g.column(key_col).slice(0, 0),
                 "q": pa.array([], pa.float64()),
                 val_col: pa.array([], pa.float64())}
            )
        first_idx = pa.array(order[np.concatenate(out_keys)])
        return pa.table(
            {
                key_col: g.column(key_col).take(first_idx),
                "q": pa.array(np.concatenate(out_q)),
                val_col: pa.array(np.concatenate(out_v)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_quantile_cont(
    ds,
    *,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.5,),
    num_buckets: int | None = None,
):
    """Exact interpolated quantiles per key (SQL ``percentile_cont`` /
    DuckDB ``quantile_cont``: position h = (n−1)·q on the sorted values,
    linear interpolation between ranks ⌊h⌋+1 and ⌊h⌋+2).

    Same value-histogram exchange as :func:`grouped_quantile_disc` — one
    (key, value, count) row per distinct pair per batch — with both
    bracketing order statistics read off the count cumsum per key segment.

    Returns Dataset[(key_col, q, val_col:float64)], one row per key × q.
    """
    q_arr = np.asarray(sorted(qs), dtype=np.float64)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b.column(key_col), val_col: b.column(val_col)})
        out = t.group_by([key_col, val_col]).aggregate([(val_col, "count")])
        return out.rename_columns([key_col, val_col, "_cnt"])

    num_buckets = num_buckets or scaled_buckets()

    def tag(b: pa.Table) -> pa.Table:
        b = partial(b)
        _, bucket = _key_and_bucket(b.column(key_col), num_buckets)
        return b.append_column("_bucket", bucket)

    def per_bucket(g: pa.Table) -> pa.Table:
        key = np.asarray(_key_and_bucket(g.column(key_col), 1)[0])
        val = np.asarray(g.column(val_col).combine_chunks().cast(pa.float64()))
        cnt = np.asarray(g.column("_cnt"), dtype=np.int64)
        order = np.lexsort((val, key))
        ks, vs, cs = key[order], val[order], cnt[order]
        n = len(ks)
        new = np.ones(n, dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        seg = np.flatnonzero(new)
        seg_end = np.append(seg[1:], n)
        ccs = np.cumsum(cs)
        base = np.where(seg > 0, ccs[seg - 1], 0)
        totals = ccs[seg_end - 1] - base
        out_keys, out_q, out_v = [], [], []
        for s, e, b0, tot in zip(seg, seg_end, base, totals):
            h = (tot - 1) * q_arr
            r_lo = np.floor(h).astype(np.int64) + 1
            r_hi = np.minimum(r_lo + 1, tot)
            frac = h - np.floor(h)
            local = ccs[s:e] - b0
            v_lo = vs[s + np.searchsorted(local, r_lo, side="left")]
            v_hi = vs[s + np.searchsorted(local, r_hi, side="left")]
            out_keys.append(np.full(len(q_arr), s))
            out_q.append(q_arr)
            # lo*(1-f) + hi*f, NOT lo + f*(hi-lo): matches the reference
            # engines' (DuckDB/Postgres) bit-for-bit interpolation
            out_v.append(v_lo * (1.0 - frac) + v_hi * frac)
        if not out_keys:
            return pa.table(
                {key_col: g.column(key_col).slice(0, 0),
                 "q": pa.array([], pa.float64()),
                 val_col: pa.array([], pa.float64())}
            )
        first_idx = pa.array(order[np.concatenate(out_keys)])
        return pa.table(
            {
                key_col: g.column(key_col).take(first_idx),
                "q": pa.array(np.concatenate(out_q)),
                val_col: pa.array(np.concatenate(out_v)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def funnel_users(ds, *, key: str, ts_col: str, type_col: str,
                 from_type: str, to_type: str, window_us: int,
                 n_buckets: int | None = None):
    """Conversion funnel: the distinct ``key`` values with a ``from_type``
    event followed by a ``to_type`` event STRICTLY later and within
    ``window_us`` (inclusive upper bound) — the sequential-pattern join SQL
    spells as a self-join (a.ts < b.ts AND b.ts - a.ts <= w) but that is
    O(n²) per key; here it is two searchsorted sweeps.

    Shape: rows not of the two types are dropped per batch BEFORE the
    shuffle, one key-hash bucket exchange, then per bucket: lexsort by
    (key, ts), fold partitions onto a composite axis (stride > span +
    window so windows cannot cross keys), and for every from-event one
    searchsorted pair against the to-events' axis answers "any completion
    in range". Returns Dataset[(key,)] of converting keys, deduplicated.
    """

    def bucket(batch: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(batch.column(type_col), from_type),
                   pc.equal(batch.column(type_col), to_type))
        b = batch.filter(m).select([key, ts_col, type_col])
        ids = np.asarray(b.column(key), dtype=np.int64)
        return b.append_column(
            "_fbucket",
            pa.array((ids % np.int64(n_buckets)).astype(np.int32)))

    def per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or key not in group.column_names:
            return pa.table({key: pa.array([], type=pa.int64())})
        ids = np.asarray(group.column(key), dtype=np.int64)
        ts = np.asarray(group.column(ts_col)).view(np.int64)
        is_from = np.asarray(pc.equal(group.column(type_col), from_type),
                             dtype=bool)
        order = np.lexsort((ts, ids))
        ids, ts, is_from = ids[order], ts[order], is_from[order]
        brk = np.ones(len(ids), dtype=bool)
        brk[1:] = ids[1:] != ids[:-1]
        part = np.cumsum(brk) - 1
        t0 = ts.min()
        stride = np.int64(int(ts.max()) - int(t0) + int(window_us) + 2)
        adj = part * stride + (ts - t0)
        b_adj = adj[~is_from]
        a_adj = adj[is_from]
        lo = np.searchsorted(b_adj, a_adj, side="right")
        hi = np.searchsorted(b_adj, a_adj + np.int64(window_us),
                             side="right")
        converted = np.unique(ids[is_from][hi > lo])
        return pa.table({key: pa.array(converted)})

    n_buckets = n_buckets or scaled_buckets()
    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_fbucket").map_groups(per_bucket,
                                            batch_format="pyarrow"))


def funnel_steps(ds, *, key: str, ts_col: str, type_col: str,
                 steps: list[str], window_us: int,
                 n_buckets: int | None = None):
    """Multi-step funnel with GREEDY earliest-first semantics (the standard
    product-analytics definition, and what a chain of ``min(ts)`` CTEs
    spells in SQL): anchor on each key's EARLIEST step-0 event, then each
    subsequent step must occur strictly after the previous step's chosen
    event and within ``window_us`` of it; the earliest qualifying event is
    chosen. Note this differs from :func:`funnel_users`'s any-pair EXISTS
    semantics — a later anchor that would convert is not considered.

    Returns Dataset[(key,)] of keys completing every step.

    Shape: off-funnel event types drop per batch before the one key-hash
    bucket shuffle; per bucket everything is arrays indexed by partition
    ordinal — earliest step-0 via unique(part, return_index) on the sorted
    axis, each later step ONE searchsorted of the current deadlines into
    that step's composite-axis positions (stride > span + window, so a miss
    lands in the next partition's range and self-invalidates).
    """
    step_set = list(dict.fromkeys(steps))
    if len(step_set) != len(steps):
        raise ValueError("funnel steps must be distinct event types")

    def bucket(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column(type_col),
                     value_set=pa.array(steps))
        b = batch.filter(m).select([key, ts_col, type_col])
        ids = np.asarray(b.column(key), dtype=np.int64)
        return b.append_column(
            "_fbucket",
            pa.array((ids % np.int64(n_buckets)).astype(np.int32)))

    def per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or key not in group.column_names:
            return pa.table({key: pa.array([], type=pa.int64())})
        ids = np.asarray(group.column(key), dtype=np.int64)
        ts = np.asarray(group.column(ts_col)).view(np.int64)
        et = group.column(type_col)
        order = np.lexsort((ts, ids))
        ids, ts = ids[order], ts[order]
        step_masks = [np.asarray(pc.equal(et, s), dtype=bool)[order]
                      for s in steps]
        brk = np.ones(len(ids), dtype=bool)
        brk[1:] = ids[1:] != ids[:-1]
        part = np.cumsum(brk) - 1
        n_part = int(part[-1]) + 1
        starts = np.flatnonzero(brk)
        t0 = ts.min()
        stride = np.int64(int(ts.max()) - int(t0) + int(window_us) + 2)
        adj = part * stride + (ts - t0)

        INF = np.iinfo(np.int64).max
        cur = np.full(n_part, INF, dtype=np.int64)
        p0, first_idx = np.unique(part[step_masks[0]], return_index=True)
        cur[p0] = adj[step_masks[0]][first_idx]
        for mask in step_masks[1:]:
            sk_adj = adj[mask]
            nxt = np.full(n_part, INF, dtype=np.int64)
            live = np.flatnonzero(cur != INF)
            if len(live) == 0 or len(sk_adj) == 0:
                cur = nxt
                break
            lo = np.searchsorted(sk_adj, cur[live], side="right")
            ok = lo < len(sk_adj)
            cand = np.where(ok, sk_adj[np.minimum(lo, len(sk_adj) - 1)], INF)
            ok &= cand <= cur[live] + np.int64(window_us)
            nxt[live[ok]] = cand[ok]
            cur = nxt
        done = np.flatnonzero(cur != INF)
        return pa.table({key: pa.array(ids[starts][done])})

    n_buckets = n_buckets or scaled_buckets()
    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_fbucket").map_groups(per_bucket,
                                            batch_format="pyarrow"))


def debounce(
    ds,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int,
    num_buckets: int | None = None,
):
    """Lag-based event debounce: keep a row iff the previous row with the
    same key (ordered by ``(ts, id)``) is absent or STRICTLY more than
    ``gap_us`` earlier — exactly SQL
    ``lag(ts) OVER (PARTITION BY keys ORDER BY ts, id)`` semantics. The
    previous row counts whether or not it was itself kept; the greedy
    "since last KEPT event" variant is inherently sequential and is
    deliberately not this operator.

    The dedup-of-retries / sensor-debounce shape every event pipeline needs:
    one hash shuffle (composite key → 64-bit mixed hash, hash-as-identity
    like the other dedup operators), then a single lexsort + shifted-compare
    pass inside each bucket. All input columns ride through unchanged.
    """
    nb = num_buckets or scaled_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = np.zeros(n, dtype=np.uint64)
        for c in key_cols:
            kc = np.asarray(_key_and_bucket(batch.column(c), 1)[0],
                            dtype=np.int64).view(np.uint64)
            key = key * np.uint64(0x100000001B3) ^ kc
        h = (key ^ (key >> np.uint64(30))) * _SPLITMIX
        h = h ^ (h >> np.uint64(31))
        return batch.append_column(
            "_key", pa.array(key.view(np.int64))
        ).append_column(
            "_bucket", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def per_bucket(g: pa.Table) -> pa.Table:
        k = np.asarray(g.column("_key"), dtype=np.int64)
        on = np.asarray(_on_int64(g.column(ts_col)), dtype=np.int64)
        ids = np.asarray(
            pc.cast(g.column(id_col).combine_chunks(), pa.int64()))
        order = np.lexsort((ids, on, k))
        ks, ons = k[order], on[order]
        keep = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            same = ks[1:] == ks[:-1]
            keep[1:] = ~same | (ons[1:] - ons[:-1] > gap_us)
        return g.take(pa.array(order[keep])).drop_columns(["_key", "_bucket"])

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket,
                                           batch_format="pyarrow"))


def event_transitions(ds, *, user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type", id_col: str = "event_id",
                      n_buckets: int | None = None):
    """Per-user event-type transition counts (the Markov-chain /
    funnel-discovery primitive): for every adjacent pair of events of one
    user ordered by (ts, id), count (prev_type, next_type).

    One user-hash-bucket shuffle; inside each bucket a single lexsort +
    shifted compare finds same-user adjacencies and a group_by counts the
    bucket's pairs — the exchange OUT of the groupby is at most
    |types|² rows per bucket, folded by one tiny final groupby. Ties on
    ts break by ``id_col`` (matching SQL's lag ORDER BY ts, id).
    Returns Dataset[(prev_type, next_type, cnt)].
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from clp_core_ray.pipelines.windows import scaled_buckets

    nb = n_buckets or scaled_buckets()

    def bucket(batch: pa.Table) -> pa.Table:
        # int OR string partition keys (strings hash-bucket and run-detect
        # by 64-bit identity, the _key_and_bucket convention)
        _, tb = _key_and_bucket(batch.column(user_col), nb)
        return batch.append_column("_tb", tb)

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_tb"])
        empty = pa.table({"prev_type": pa.array([], type=pa.string()),
                          "next_type": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if t.num_rows < 2:
            return empty
        idx = pc.sort_indices(t, sort_keys=[(user_col, "ascending"),
                                            (ts_col, "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        u = np.asarray(_key_and_bucket(t.column(user_col), 1)[0])
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        types = t.column(type_col).combine_chunks()
        sel = np.flatnonzero(same)
        pairs = pa.table({
            "prev_type": types.take(pa.array(sel)),
            "next_type": types.take(pa.array(sel + 1)),
        })
        c = pairs.group_by(["prev_type", "next_type"]).aggregate(
            [([], "count_all")])
        return pa.table({"prev_type": c.column("prev_type"),
                         "next_type": c.column("next_type"),
                         "cnt": c.column("count_all").cast(pa.int64())})

    partials = (ds.map_batches(bucket, batch_format="pyarrow")
                .groupby("_tb").map_groups(per_bucket,
                                           batch_format="pyarrow"))

    def final(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["_one"])
        c = t.group_by(["prev_type", "next_type"]).aggregate([("cnt", "sum")])
        return pa.table({"prev_type": c.column("prev_type"),
                         "next_type": c.column("next_type"),
                         "cnt": c.column("cnt_sum")})

    one = partials.map_batches(
        lambda b: b.append_column("_one", pa.array(
            np.zeros(len(b), dtype=np.int32))), batch_format="pyarrow")
    return one.groupby("_one").map_groups(final, batch_format="pyarrow")


def interval_coverage(ds, *, key_col: str, start_col: str, end_col: str,
                      out_col: str = "covered"):
    """Union-of-intervals coverage per key: total length covered by the
    (possibly overlapping) [start, end] intervals of each key — the
    uptime / sensor-coverage / speech-activity primitive.

    One key-hash bucket shuffle of (key, start, end) triples, then a
    single vectorized gaps-and-islands pass per bucket: lexsort by
    (key, start, end), exclusive running max of end within each key, an
    island begins where start exceeds it, island extents come off the
    inclusive running max at island boundaries. No per-key loop; output
    is one row per key."""
    import numpy as np

    from clp_core_ray.pipelines.windows import scaled_buckets

    nb = scaled_buckets()

    def tag(b: pa.Table) -> pa.Table:
        k = np.asarray(_key_and_bucket(b.column(key_col), nb)[1])
        return pa.table({
            key_col: b.column(key_col),
            "_s": b.column(start_col).combine_chunks().cast(pa.int64()),
            "_e": b.column(end_col).combine_chunks().cast(pa.int64()),
            "_bucket": pa.array(k),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        if not g.num_rows or key_col not in g.column_names:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             out_col: pa.array([], type=pa.int64())})
        key = np.asarray(_key_and_bucket(g.column(key_col), 1)[0])
        s = np.asarray(g.column("_s"), dtype=np.int64)
        e = np.asarray(g.column("_e"), dtype=np.int64)
        order = np.lexsort((e, s, key))
        k2, ss, se = key[order], s[order], e[order]
        n = len(k2)
        newk = np.r_[True, k2[1:] != k2[:-1]]
        # segmented cummax of end within key: per-segment offsets larger
        # than the value range make accumulate reset at key boundaries
        seg = np.cumsum(newk) - 1
        lo = np.int64(se.min())
        span = np.int64(se.max()) - lo + 1
        rmax = (np.maximum.accumulate((se - lo) + seg * span)
                - seg * span + lo)
        prev_rmax = np.r_[np.int64(-(1 << 62)), rmax[:-1]]
        newisl = newk | (ss > prev_rmax)
        starts_idx = np.flatnonzero(newisl)
        # island end = inclusive running max at its last element
        last_idx = np.r_[starts_idx[1:] - 1, n - 1]
        lengths = rmax[last_idx] - ss[starts_idx]
        # fold island lengths per key (islands are key-contiguous)
        isl_key = k2[starts_idx]
        kstart = np.flatnonzero(np.r_[True, isl_key[1:] != isl_key[:-1]])
        covered = np.add.reduceat(lengths, kstart)
        # first original row of each key's first island carries the key
        orig_keys = g.column(key_col).combine_chunks().take(
            pa.array(order[starts_idx[kstart]]))
        return pa.table({key_col: orig_keys,
                         out_col: pa.array(covered)})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pyarrow"))


def grouped_mad(ds, *, key_col: str, val_col: str):
    """Per-key median absolute deviation — the robust dispersion measure
    behind outlier screens that can't trust the mean (heavy-tailed value
    columns). MAD = median(|x − median(x)|), both medians with DuckDB
    quantile_disc semantics.

    Two composed grouped_quantile_disc passes: medians fold to one row
    per key and broadcast; the deviation pass recomputes |x − med[key]|
    per batch (two gathers, no extra shuffle beyond the quantile
    histogram exchange). Both engines derive the deviations from
    identical doubles, so no rounding is needed for hash equality.
    """
    import ray

    def fold(d):
        out = [pa.table(b) for b in d.iter_batches(batch_format="pyarrow")]
        return pa.concat_tables(out) if out else pa.table({})

    med_tbl = fold(grouped_quantile_disc(ds, key_col=key_col,
                                         val_col=val_col, qs=(0.5,)))
    keys = med_tbl.column(key_col).combine_chunks()
    med = np.asarray(med_tbl.column(val_col), dtype=np.float64)
    ref = ray.put((keys, med))

    def absdev(b: pa.Table) -> pa.Table:
        k, m = ray.get(ref)
        idx = np.asarray(pc.index_in(b.column(key_col), value_set=k),
                         dtype=np.int64)
        x = np.asarray(b.column(val_col), dtype=np.float64)
        return pa.table({key_col: b.column(key_col),
                         "_dev": pa.array(np.abs(x - m[idx]))})

    mad_tbl = fold(grouped_quantile_disc(
        ds.map_batches(absdev, batch_format="pyarrow"),
        key_col=key_col, val_col="_dev", qs=(0.5,)))
    import ray.data as rd

    midx = np.asarray(pc.index_in(mad_tbl.column(key_col), value_set=keys),
                      dtype=np.int64)
    mad = np.empty(len(keys))
    mad[midx] = np.asarray(mad_tbl.column("_dev"), dtype=np.float64)
    return rd.from_arrow(pa.table({key_col: keys,
                                   "med": pa.array(med),
                                   "mad": pa.array(mad)}))


def time_weighted_avg(ds, *, key_col: str, ts_col: str, val_col: str,
                      id_col: str, alias: str = "twa", ndigits: int = 6,
                      num_buckets: int | None = None):
    """Per-key time-weighted average under piecewise-constant (forward-fill)
    interpolation: each value holds from its timestamp to the key's next
    event, so twa = Σ v_i·(t_{i+1}−t_i) / Σ (t_{i+1}−t_i) over consecutive
    pairs ordered by (ts, id). Keys with < 2 distinct timestamps (zero total
    span) are dropped — the quotient is undefined there, matching the SQL
    lead()-window oracle's HAVING sum(dt) > 0.

    Shape: one hash shuffle into key buckets (a key's full history meets in
    one group), then a fully vectorized in-group pass — lexsort
    (key, ts, id), zero the cross-key pair deltas, one reduceat per sum.
    The exchange carries (key, ts, id, val); output is one row per key.
    """
    num_buckets = num_buckets or scaled_buckets()

    def bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(key_col), dtype=np.int64)
        return batch.select([key_col, ts_col, val_col, id_col]).append_column(
            "_twb", pa.array((ids % np.int64(num_buckets)).astype(np.int32)))

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          alias: pa.array([], type=pa.float64())})
        if group.num_rows < 2 or key_col not in group.column_names:
            return empty
        k = np.asarray(group.column(key_col), dtype=np.int64)
        ts = np.asarray(group.column(ts_col)).view(np.int64)
        v = np.asarray(group.column(val_col), dtype=np.float64)
        rid = np.asarray(group.column(id_col), dtype=np.int64)
        order = np.lexsort((rid, ts, k))
        k, ts, v = k[order], ts[order], v[order]
        same = k[1:] == k[:-1]
        dt = (ts[1:] - ts[:-1]).astype(np.float64)
        dt[~same] = 0.0
        w = v[:-1] * dt
        starts = np.flatnonzero(np.r_[True, ~same])
        # pad one zero so reduceat never indexes past the pair arrays
        sum_dt = np.add.reduceat(np.r_[dt, 0.0], starts)
        sum_w = np.add.reduceat(np.r_[w, 0.0], starts)
        keep = sum_dt > 0.0
        if not keep.any():
            return empty
        from clp_core_ray.pipelines.aggregate import sql_round
        twa = sql_round(sum_w[keep] / sum_dt[keep], ndigits)
        return pa.table({key_col: pa.array(k[starts][keep]),
                         alias: pa.array(twa)})

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_twb").map_groups(per_bucket, batch_format="pyarrow"))


def inter_event_gaps(ds, *, key_col: str, ts_col: str, id_col: str,
                     out_col: str = "gap", unit_us: float = 1e6,
                     num_buckets: int | None = None):
    """Per-key inter-event gaps: for every event after its key's first,
    emit (key, gap) where gap = ts − previous ts in (ts, id) order, scaled
    by ``unit_us`` (default: seconds). The SQL lag()-window shape, produced
    without a per-row window: one hash shuffle into key buckets, lexsort,
    neighbor diff, cross-key pairs masked out. Feed the output to
    ``aggregate.grouped_moments`` for gap-distribution profiles."""
    num_buckets = num_buckets or scaled_buckets()

    def bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(key_col), dtype=np.int64)
        return batch.select([key_col, ts_col, id_col]).append_column(
            "_gb", pa.array((ids % np.int64(num_buckets)).astype(np.int32)))

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          out_col: pa.array([], type=pa.float64())})
        if group.num_rows < 2 or key_col not in group.column_names:
            return empty
        k = np.asarray(group.column(key_col), dtype=np.int64)
        ts = np.asarray(group.column(ts_col)).view(np.int64)
        rid = np.asarray(group.column(id_col), dtype=np.int64)
        order = np.lexsort((rid, ts, k))
        k, ts = k[order], ts[order]
        same = k[1:] == k[:-1]
        if not same.any():
            return empty
        gaps = (ts[1:] - ts[:-1]).astype(np.float64)[same] / unit_us
        return pa.table({key_col: pa.array(k[1:][same]),
                         out_col: pa.array(gaps)})

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_gb").map_groups(per_bucket, batch_format="pyarrow"))
