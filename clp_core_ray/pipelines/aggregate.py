"""Grouped aggregates with partial (combiner) pre-aggregation.

Reference semantics: reducer/CountOperator.cpp:4-31 — per-task partial counts
merged across tasks (A1 in SURVEY.md §2.5); count-by-time bucketing
clo/OutputHandler.hpp:255-286 (A2). In Ray Data the cross-task merge is the
groupby shuffle; we shrink what's shuffled by pre-aggregating inside
map_batches first (one row per key per batch instead of one per record).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _partial_agg_fn(keys: list[str], aggs: list[tuple[str, str]]):
    def fn(batch: pa.Table) -> pa.Table:
        cols = set(keys) | {c for c, _ in aggs if c != "*"}
        batch = batch.select([c for c in batch.column_names if c in cols])
        return batch.group_by(keys).aggregate(
            [(c, f) for c, f in aggs]
        )

    return fn


def count_by(ds, keys: list[str] | str):
    """groupby(keys).count() with per-batch partial counts.

    Returns a Dataset with columns keys + ``cnt`` (int64).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    key0 = keys[0]

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.select(keys).group_by(keys).aggregate([(key0, "count")])
        return out.rename_columns(keys + ["cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    out = partials.groupby(keys).aggregate(Sum("cnt", alias_name="cnt"))
    return out


def sum_by(ds, keys: list[str] | str, value_col: str, alias: str | None = None):
    """groupby(keys).sum(value_col) with per-batch partials."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    alias = alias or f"sum_{value_col}"

    def partial(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(keys + [value_col])
            .group_by(keys)
            .aggregate([(value_col, "sum")])
        )
        return out.rename_columns(keys + [alias])

    from ray.data.aggregate import Sum

    return ds.map_batches(partial, batch_format="pyarrow").groupby(keys).aggregate(
        Sum(alias, alias_name=alias)
    )


def count_sum_by(ds, keys: list[str] | str, value_col: str,
                 cnt_alias: str = "cnt", sum_alias: str = "sum_qty"):
    """groupby(keys) → count(*) + sum(value_col) in ONE exchange of partials."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(keys + [value_col])
            .group_by(keys)
            .aggregate([
                # count(*) semantics: null values still count the row
                (value_col, "count", pc.CountOptions(mode="all")),
                (value_col, "sum"),
            ])
        )
        return out.rename_columns(keys + [cnt_alias, sum_alias])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum(cnt_alias, alias_name=cnt_alias),
                   Sum(sum_alias, alias_name=sum_alias))
    )


def detect_hot_keys(ds, key: str, sample_frac: float = 0.02,
                    hot_share: float = 0.01) -> list:
    """Sampled heavy-hitter detection: keys owning > hot_share of sampled rows.

    The cheap pre-pass that drives salting decisions (SURVEY.md §4: "detect
    heavy keys via sampled count").
    """
    import pyarrow as _pa

    sample = ds.random_sample(sample_frac, seed=13)
    counts = _to_small_table(count_by(sample, key))
    total = sum(counts.column("cnt").to_pylist()) or 1
    return [
        k for k, c in zip(counts.column(key).to_pylist(),
                          counts.column("cnt").to_pylist())
        if c / total > hot_share
    ]


def count_by_salted(ds, key: str, n_salt: int = 16):
    """Two-phase salted count: shuffle on (key, salt), then merge salts.

    For aggregates the per-batch partial in count_by already neutralizes
    skew; this explicit variant is the pattern for cases where partials are
    impossible (holistic per-key work): salt the hot key into n_salt
    subgroups, aggregate each, then merge the small salted result.
    Results are identical to count_by (tested).
    """
    import numpy as np
    import pyarrow as _pa

    from ray.data.aggregate import Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(len(batch), dtype=np.int32) % n_salt
        return batch.select([key]).append_column("_salt", _pa.array(salt))

    salted = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .count()
    )
    merged = salted.groupby(key).aggregate(Sum("count()", alias_name="cnt"))
    return merged


def _to_small_table(ds) -> "pa.Table":
    import pyarrow as _pa

    out = [_pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return _pa.concat_tables(out) if out else _pa.table({})


def add_time_bucket(ds, ts_col: str = "ts", granularity: str = "hour",
                    out_col: str = "bucket"):
    """Append a truncated-timestamp bucket column (A2: bucket = ts/size*size)."""

    def fn(batch: pa.Table) -> pa.Table:
        b = pc.floor_temporal(batch.column(ts_col), unit=granularity)
        return batch.append_column(out_col, b)

    return ds.map_batches(fn, batch_format="pyarrow")


def stats_by(ds, keys: list[str] | str, ts_col: str = "ts", size_col: str | None = None):
    """Per-group archive-style stats: count, min/max ts, optional byte sum (A3).

    Mirrors per-archive metadata accumulation
    (streaming_archive/ArchiveMetadata.cpp, writer/Archive.cpp:493-557).
    Column names: n_turns, min_ts, max_ts[, total_bytes].
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        sel = keys + [ts_col] + ([size_col] if size_col else [])
        aggs = [(ts_col, "count"), (ts_col, "min"), (ts_col, "max")]
        names = keys + ["n_turns", "min_ts", "max_ts"]
        if size_col:
            aggs.append((size_col, "sum"))
            names.append("total_bytes")
        out = batch.select(sel).group_by(keys).aggregate(aggs)
        return out.rename_columns(names)

    from ray.data.aggregate import Max, Min, Sum

    aggs = [
        Sum("n_turns", alias_name="n_turns"),
        Min("min_ts", alias_name="min_ts"),
        Max("max_ts", alias_name="max_ts"),
    ]
    if size_col:
        aggs.append(Sum("total_bytes", alias_name="total_bytes"))
    return ds.map_batches(partial, batch_format="pyarrow").groupby(keys).aggregate(*aggs)


def global_rank(ds, *, val_col: str, row_id_col: str,
                n_buckets: int = 1024, descending: bool = False):
    """Distributed ``RANK() OVER (ORDER BY val_col [DESC])`` for an int64
    value column (ties share the min rank, SQL RANK semantics).

    No global sort: value-RANGE buckets split the key space, per-bucket row
    counts cumsum on the driver (#buckets rows, not #rows), and one bucket-
    partitioned vectorized pass ranks inside each bucket and adds its
    offset — the pack_sequences two-pass prefix-sum shape applied to
    ordering. Skewed value distributions fatten individual buckets (the
    pass inside stays vectorized); rank = 1 + #values strictly lower.
    Returns Dataset[(row_id_col, "rnk")].
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Max as AMax
    from ray.data.aggregate import Min as AMin

    def tag_src(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(val_col), dtype=np.int64)
        if descending:
            v = -v
        return pa.table({
            row_id_col: batch.column(row_id_col).combine_chunks().cast(
                pa.int64()),
            "_v": pa.array(v)})

    vals = ds.map_batches(tag_src, batch_format="pyarrow").materialize()
    mm = vals.aggregate(AMin("_v", alias_name="lo"),
                        AMax("_v", alias_name="hi"))
    lo, hi = int(mm["lo"]), int(mm["hi"])
    width = max(1, (hi - lo) // n_buckets + 1)

    def tag(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("_v"), dtype=np.int64)
        return batch.append_column(
            "_rbucket", pa.array(((v - lo) // width).astype(np.int32)))

    tagged = vals.map_batches(tag, batch_format="pyarrow").materialize()
    per_bucket = tagged.groupby("_rbucket").count().to_pandas()
    per_bucket = per_bucket.sort_values("_rbucket")
    offsets, run = {}, 0
    for b, c in zip(per_bucket["_rbucket"], per_bucket["count()"]):
        offsets[int(b)] = run
        run += int(c)
    off_ref = ray.put(offsets)

    def rank_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "_v" not in group.column_names:
            return pa.table({row_id_col: pa.array([], type=pa.int64()),
                             "rnk": pa.array([], type=pa.int64())})
        off = ray.get(off_ref)[int(group.column("_rbucket")[0].as_py())]
        v = np.asarray(group.column("_v"), dtype=np.int64)
        sv = np.sort(v)
        within = np.searchsorted(sv, v, side="left")
        return pa.table({
            row_id_col: group.column(row_id_col),
            "rnk": pa.array(within + off + 1)})

    return tagged.groupby("_rbucket").map_groups(rank_bucket,
                                                 batch_format="pyarrow")
