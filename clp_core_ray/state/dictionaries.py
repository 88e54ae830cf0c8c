"""Logtype / variable dictionary tables (T1/T2/A4 in SURVEY.md).

CLP interns strings into per-archive dictionaries with sequential ids
(VariableDictionaryWriter.cpp:7-37, LogTypeDictionaryWriter.cpp). Here ids are
content hashes computed inline during encode (no coordination), and the
dictionary *table* is derived from the encoded dataset as a distinct-value
aggregate — a dedup groupby over values that are already pre-deduplicated
per batch, so the shuffle carries only unique (id, value) pairs per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clp_core_ray.vec.tokenizer import _fnv1a64_tokens, _string_buffers


def _batch_unique(values: pa.Array, ids: np.ndarray) -> pa.Table:
    tbl = pa.table({"var_id": pa.array(ids), "value": values})
    return tbl.group_by(["var_id"], use_threads=False).aggregate([("value", "first")]).rename_columns(
        ["var_id", "value"]
    )


N_DEDUP_BUCKETS = 64


def _check_id_collisions(group: pa.Table, order: np.ndarray, dup_mask: np.ndarray,
                         value_col: str) -> None:
    """Rows sharing an id (adjacent in `order`; dup_mask over order[1:]) must
    carry equal values — a content-hash collision would otherwise silently
    decode wrong text (ADVICE r1). Cheap: runs only on the already-sorted
    duplicate positions."""
    if not dup_mask.any():
        return
    import pyarrow.compute as pc

    vals = group.column(value_col).combine_chunks()
    a = vals.take(pa.array(order[:-1][dup_mask]))
    b = vals.take(pa.array(order[1:][dup_mask]))
    eq = pc.all(pc.equal(a, b)).as_py()
    if eq is not True:
        bad = np.flatnonzero(~np.asarray(pc.equal(a, b), dtype=bool))[:3]
        raise ValueError(
            f"dictionary id collision: same id, different {value_col!r} "
            f"(first offending pairs at sorted dup positions {bad.tolist()})"
        )


def distinct_by_key(partials_ds, key: str, n_buckets: int = N_DEDUP_BUCKETS,
                    extra_key_cols: tuple = (), check_value_col: str | None = None):
    """Global distinct-by-key over per-batch-deduped partials.

    Explicit hash-partitioned dedup (SURVEY.md §2.7): bucket = hash & (B-1),
    shuffle by bucket (B groups, not one per key!), then a *vectorized* dedup
    inside each bucket. One python call per bucket, not per key — a
    per-key map_groups would make 600k python calls.

    ``extra_key_cols`` widen the dedup key, e.g. ("kind", "logtype_class")
    for the unified dict pass (exact, via lexsort — no hash combining).
    ``check_value_col`` enables hash-collision detection: duplicate keys must
    agree on that column (fails loudly instead of decoding wrong text).
    """
    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pc.bit_wise_and(batch.column(key), n_buckets - 1)
        return batch.append_column("_bucket", pc.cast(b, pa.int32()))

    def dedup(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(key).combine_chunks(), dtype=np.int64)
        if not extra_key_cols:
            order = np.argsort(ids, kind="stable")
            change = np.ones(len(ids), dtype=bool)
            if len(ids) > 1:
                change[1:] = ids[order][1:] != ids[order][:-1]
            if check_value_col is not None and len(ids) > 1:
                _check_id_collisions(group, order, ~change[1:], check_value_col)
            return group.take(np.sort(order[change])).drop_columns(["_bucket"])
        keys = [ids]
        for c in extra_key_cols:
            col = group.column(c).combine_chunks()
            enc = pc.dictionary_encode(col)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices
            keys.append(np.asarray(pc.fill_null(codes, -1), dtype=np.int64))
        order = np.lexsort(keys[::-1])
        stacked = np.stack([k[order] for k in keys])
        change = np.ones(len(ids), dtype=bool)
        if len(ids) > 1:
            change[1:] = (stacked[:, 1:] != stacked[:, :-1]).any(axis=0)
        if check_value_col is not None and len(ids) > 1:
            _check_id_collisions(group, order, ~change[1:], check_value_col)
        first_idx = order[change]
        return group.take(np.sort(first_idx)).drop_columns(["_bucket"])

    return (
        partials_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dedup, batch_format="pyarrow")
    )


def logtype_dict(encoded_ds):
    """Dataset[(logtype_id:int64, logtype:large_string, n_vars:int32)] distinct."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "logtype_id": batch.column("logtype_id"),
                "logtype": batch.column("logtype"),
                "n_vars": batch.column("n_vars"),
            }
        )
        return (
            t.group_by(["logtype_id"], use_threads=False)
            .aggregate([("logtype", "first"), ("n_vars", "first")])
            .rename_columns(["logtype_id", "logtype", "n_vars"])
        )

    partials = encoded_ds.map_batches(partial, batch_format="pyarrow")
    return distinct_by_key(partials, "logtype_id", check_value_col="logtype")


def var_dict(encoded_ds):
    """Dataset[(var_id:int64, value:string)] — distinct dictionary variables.

    Ids are recomputed from the flattened dict_vars strings (same FNV-1a as
    encode), per-batch deduped before the bucketed global distinct.
    """

    def partial(batch: pa.Table) -> pa.Table:
        dv = batch.column("dict_vars").combine_chunks()
        flat = dv.flatten()
        if len(flat) == 0:
            return pa.table({"var_id": pa.array([], type=pa.int64()),
                             "value": pa.array([], type=pa.string())})
        uniq = flat.unique()
        offsets, data = _string_buffers(uniq)
        ids = _fnv1a64_tokens(data, offsets[:-1], np.diff(offsets)).view(np.int64)
        return pa.table({"var_id": pa.array(ids), "value": uniq.cast(pa.string())})

    partials = encoded_ds.map_batches(partial, batch_format="pyarrow")
    return distinct_by_key(partials, "var_id", check_value_col="value")


def write_archive_dicts(out_dir: str, delta_dir: str | None = None,
                        prededup_refs: list | None = None) -> dict:
    """Persist logtype.dict.parquet / var.dict.parquet + class→logtype map.

    CLP persists both dictionaries inside the archive
    (streaming_archive/Constants.hpp:7-16: logtype.dict, var.dict, segindex);
    the class→logtype_ids map is our segment index analogue — search prunes
    sink partitions with it (J4).

    Single pipeline over the sinks: one column-pruned read emits *unified*
    per-batch dict partials (kind 0 = logtype rows incl. class, kind 1 = var
    rows), bucket-hash deduped once, then split. One pass, one small shuffle —
    the shuffle carries only per-batch-unique entries.
    """
    import json
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    routed = os.path.join(out_dir, "routed")
    if prededup_refs is not None:
        # the compress delta watcher already submitted pre-dedup tasks for
        # every delta file during the sink write — go straight to the
        # parallel bucket merge
        return _finalize_dicts_parallel(out_dir, prededup_refs=prededup_refs)
    delta_files, delta_fs, total = [], None, 0
    if delta_dir:
        from pyarrow import fs as pafs

        from clp_core_ray.stages.encode import _resolve_fs

        delta_fs, dpath = _resolve_fs(delta_dir)
        try:
            infos = delta_fs.get_file_info(pafs.FileSelector(dpath))
        except FileNotFoundError:
            infos = []
        delta_files = sorted(
            i.path for i in infos
            if i.type == pafs.FileType.File
            and i.path.endswith((".parquet", ".arrow"))
        )
        total = sum(i.size for i in infos if i.path in set(delta_files))
    if delta_files:
        # encode-stage actors already flushed per-partition dict deltas in the
        # unified schema — dedup them directly (no sink re-read at all)
        files = delta_files
        # three regimes by delta volume: tiny → all-driver; medium → Ray tasks
        # pre-dedup file groups in parallel, driver merges the (small)
        # partials; huge → full distributed bucketed distinct
        if total < 16 * 1024 * 1024:
            return _finalize_dicts_driver(out_dir, files, fs=delta_fs)
        if total < 1024 * 1024 * 1024:
            return _finalize_dicts_parallel(out_dir, files, fs=delta_fs)
        _fs_cap = delta_fs

        def _load_paths(b: pa.Table) -> pa.Table:
            return pa.concat_tables(
                _read_delta(p, _fs_cap) for p in b.column("path").to_pylist()
            )

        partials = rd.from_items(
            [{"path": p} for p in files]
        ).map_batches(_load_paths, batch_format="pyarrow", batch_size=4)
    else:
        partials = None
    ds = (
        rd.read_parquet(
            routed,
            columns=["logtype_id", "logtype", "n_vars", "logtype_class", "dict_vars"],
        )
        if partials is None
        else None
    )

    def partial(batch: pa.Table) -> pa.Table:
        lt = (
            pa.table(
                {
                    "logtype_id": batch.column("logtype_id"),
                    "logtype_class": batch.column("logtype_class"),
                    "logtype": batch.column("logtype"),
                    "n_vars": batch.column("n_vars"),
                }
            )
            .group_by(["logtype_id", "logtype_class"], use_threads=False)
            .aggregate([("logtype", "first"), ("n_vars", "first")])
            .rename_columns(["logtype_id", "logtype_class", "logtype", "n_vars"])
        )
        # vars keyed (value, class) so the finalize can build the per-variable
        # segment index — same pairing trick as the encode-stage delta flush
        dv = batch.column("dict_vars").combine_chunks()
        flat = dv.flatten()
        if len(flat):
            cls_enc = pc.dictionary_encode(batch.column("logtype_class").combine_chunks())
            if isinstance(cls_enc, pa.ChunkedArray):
                cls_enc = cls_enc.combine_chunks()
            row_codes = np.asarray(cls_enc.indices, dtype=np.int64)
            cls_names = cls_enc.dictionary
            lengths = np.diff(np.asarray(dv.offsets, dtype=np.int64))
            rep = np.repeat(row_codes, lengths)
            fenc = pc.dictionary_encode(flat)
            if isinstance(fenc, pa.ChunkedArray):
                fenc = fenc.combine_chunks()
            vcodes = np.asarray(fenc.indices, dtype=np.int64)
            uniq = fenc.dictionary
            offsets, data = _string_buffers(uniq)
            ids = _fnv1a64_tokens(data, offsets[:-1], np.diff(offsets)).view(np.int64)
            upairs = np.unique(vcodes * len(cls_names) + rep)
            uv = upairs // len(cls_names)
            uc = upairs % len(cls_names)
            v_ids = ids[uv]
            v_vals = uniq.take(pa.array(uv))
            v_cls = cls_names.take(pa.array(uc))
            n_v = len(upairs)
        else:
            v_ids = np.empty(0, dtype=np.int64)
            v_vals = pa.array([], type=pa.string())
            v_cls = pa.array([], type=pa.string())
            n_v = 0
        n_lt = len(lt)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate([np.zeros(n_lt, np.int8), np.ones(n_v, np.int8)])
                ),
                "id": pa.concat_arrays(
                    [lt.column("logtype_id").combine_chunks(), pa.array(v_ids)]
                ),
                "value": pa.concat_arrays(
                    [
                        lt.column("logtype").combine_chunks().cast(pa.large_string()),
                        v_vals.cast(pa.large_string()),
                    ]
                ),
                "n_vars": pa.concat_arrays(
                    [
                        lt.column("n_vars").combine_chunks().cast(pa.int32()),
                        pa.nulls(n_v, pa.int32()),
                    ]
                ),
                "logtype_class": pa.concat_arrays(
                    [
                        lt.column("logtype_class").combine_chunks().cast(pa.string()),
                        v_cls.cast(pa.string()),
                    ]
                ),
            }
        )

    if partials is None:
        partials = ds.map_batches(partial, batch_format="pyarrow")
    # dedup key is (kind, id, class): logtypes appearing in several classes
    # keep one row per class (feeds the segment index)
    distinct = distinct_by_key(
        partials, "id", extra_key_cols=("kind", "logtype_class"),
        check_value_col="value",
    ).materialize()

    def only(kind_val):
        def fn(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("kind"), kind_val))

        return fn

    lt_tbl = pa.concat_tables(
        pa.table(b)
        for b in distinct.map_batches(only(0), batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    lt = lt_tbl.to_pandas()
    by_class = (
        lt.groupby("logtype_class")["id"].agg(lambda s: sorted(set(s))).to_dict()
    )
    ldict = lt.drop_duplicates("id")[["id", "value", "n_vars"]].rename(
        columns={"id": "logtype_id", "value": "logtype"}
    )
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(ldict, preserve_index=False),
                   os.path.join(out_dir, "logtype.dict.parquet"))
    with open(os.path.join(out_dir, "class_logtypes.json"), "w") as f:
        json.dump({k: list(map(int, v)) for k, v in by_class.items()}, f)

    # aggregate per-id class lists inside id-hash bucket groups (an id never
    # spans buckets), one small shuffle over unique var rows only
    def var_bucket(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("kind"), 1))
        bk = pc.cast(pc.bit_wise_and(b.column("id"), N_DEDUP_BUCKETS - 1), pa.int32())
        return b.append_column("_bucket", bk)

    (
        distinct.map_batches(var_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: _var_rows_to_dict_table(g.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
        .write_parquet(os.path.join(out_dir, "var.dict"), compression="zstd",
                       use_dictionary=False)
    )
    return {"n_logtypes": len(ldict), "classes": sorted(by_class)}


def _dedup_unified(t: pa.Table) -> pa.Table:
    """Dedup a unified dict-delta table by (kind, id, class) — both logtype
    and var rows keep one row per class they appear in (the class list IS the
    per-entry segment index, DictionaryWriter.hpp:179-202). The hash-collision
    check compares values of adjacent same-(kind, id) rows regardless of
    class. Pure table→table so it runs on the driver or inside a Ray task."""
    import pyarrow.compute as pc

    t = t.combine_chunks()
    n = len(t)
    if n == 0:
        return t
    kinds = np.asarray(t.column("kind"), dtype=np.int8).astype(np.int64)
    ids = np.asarray(t.column("id"), dtype=np.int64)
    cls = t.column("logtype_class").combine_chunks()
    enc = pc.dictionary_encode(cls)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
    order = np.lexsort((codes, ids, kinds))
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = (
            (kinds[order][1:] != kinds[order][:-1])
            | (ids[order][1:] != ids[order][:-1])
            | (codes[order][1:] != codes[order][:-1])
        )
        same_id = (kinds[order][1:] == kinds[order][:-1]) & (
            ids[order][1:] == ids[order][:-1]
        )
        if same_id.any():  # hash-collision check (ADVICE r1)
            vals = t.column("value").combine_chunks()
            a = vals.take(pa.array(order[:-1][same_id]))
            b = vals.take(pa.array(order[1:][same_id]))
            if pc.all(pc.equal(a, b)).as_py() is not True:
                raise ValueError("dictionary id collision (FNV-1a 64)")
    return t.take(np.sort(order[change]))


def _var_rows_to_dict_table(vt: pa.Table) -> pa.Table:
    """(kind-1 delta rows, one per (id, class)) → var-dict table
    (var_id, value, classes:list<string>). The classes column is the
    per-variable segment index (dict entry → containing sink partitions,
    DictionaryWriter.hpp:179-202) used by search partition pruning
    (clg.cpp:249-298)."""
    import pyarrow.compute as pc

    vt = vt.combine_chunks()
    ids = np.asarray(vt.column("id"), dtype=np.int64)
    empty = pa.table(
        {"var_id": pa.array([], pa.int64()), "value": pa.array([], pa.string()),
         "classes": pa.array([], pa.list_(pa.string()))}
    )
    if len(ids) == 0:
        return empty
    order = np.argsort(ids, kind="stable")
    sids = ids[order]
    change = np.ones(len(ids), dtype=bool)
    if len(ids) > 1:
        change[1:] = sids[1:] != sids[:-1]
    starts = np.flatnonzero(change)
    offsets = np.append(starts, len(ids)).astype(np.int32)
    cls_sorted = pc.fill_null(
        vt.column("logtype_class").take(pa.array(order)).cast(pa.string()), ""
    )
    if isinstance(cls_sorted, pa.ChunkedArray):
        cls_sorted = cls_sorted.combine_chunks()
    classes = pa.ListArray.from_arrays(pa.array(offsets), cls_sorted)
    first = pa.array(order[starts])
    return pa.table(
        {"var_id": pa.array(sids[starts]),
         "value": vt.column("value").take(first).cast(pa.string()),
         "classes": classes}
    )


def _finalize_from_table(out_dir: str, t: pa.Table) -> dict:
    """Write logtype.dict.parquet / class_logtypes.json / var.dict from a
    deduped unified table."""
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    lt = t.filter(pc.equal(t.column("kind"), 0)).to_pandas()
    lt = lt.drop_duplicates(["id", "logtype_class"])
    by_class = lt.groupby("logtype_class")["id"].agg(lambda s: sorted(set(s))).to_dict()
    ldict = lt.drop_duplicates("id")[["id", "value", "n_vars"]].rename(
        columns={"id": "logtype_id", "value": "logtype"}
    )
    pq.write_table(pa.Table.from_pandas(ldict, preserve_index=False),
                   os.path.join(out_dir, "logtype.dict.parquet"))
    with open(os.path.join(out_dir, "class_logtypes.json"), "w") as f:
        json.dump({k: list(map(int, v)) for k, v in by_class.items()}, f)

    var_tbl = _var_rows_to_dict_table(t.filter(pc.equal(t.column("kind"), 1)))
    vdir = os.path.join(out_dir, "var.dict")
    os.makedirs(vdir, exist_ok=True)
    pq.write_table(var_tbl, os.path.join(vdir, "part-0.parquet"),
                   compression="zstd", use_dictionary=False)
    return {"n_logtypes": len(ldict), "classes": sorted(by_class)}


def _read_delta(path: str, fs=None) -> pa.Table:
    """Read one dict-delta file — Arrow IPC (current format) or parquet
    (pre-IPC archives / shared-storage deltas)."""
    import pyarrow.parquet as pq

    if path.endswith(".arrow"):
        import pyarrow.ipc as ipc

        if fs is None:
            from pyarrow import fs as pafs

            fs = pafs.LocalFileSystem()
        with fs.open_input_file(path) as f:
            return ipc.open_file(f).read_all()
    return pq.read_table(path, filesystem=fs)


def _finalize_dicts_driver(out_dir: str, delta_files: list[str], fs=None) -> dict:
    """Driver-side dict finalize for small delta sets (vectorized dedup)."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    with ThreadPoolExecutor(16) as ex:
        tables = list(ex.map(lambda f: _read_delta(f, fs), delta_files))
    return _finalize_from_table(out_dir, _dedup_unified(pa.concat_tables(tables)))


N_FINALIZE_BUCKETS = 16


def _prededup_files(paths: list, fs=None):
    """Read delta files, dedup, and split into the N id-hash finalize buckets
    (one Ray-task return per bucket, so each merge task fetches only its own
    slice; also used by the compress delta watcher to overlap finalize with
    the sink write)."""
    import pyarrow.parquet as pq

    tables = [_read_delta(p, fs) for p in paths]
    t = _dedup_unified(pa.concat_tables(tables)).combine_chunks()
    ids = np.asarray(t.column("id"), dtype=np.int64)
    b = (ids & (N_FINALIZE_BUCKETS - 1)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(N_FINALIZE_BUCKETS + 1))
    # take (not slice) per bucket: a slice serializes its whole parent
    # buffer into the object store, take materializes compact arrays
    return tuple(
        t.take(order[bounds[i]:bounds[i + 1]])
        for i in range(N_FINALIZE_BUCKETS)
    )


def _merge_write_bucket(b: int, var_part_path: str, *parts) -> pa.Table:
    """Merge one id-hash bucket's pre-deduped slices: write its var-dict
    parquet part, return its (small) logtype rows for the driver."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = _dedup_unified(pa.concat_tables(parts))
    # ids are hash-bucketed, so an id never spans buckets — per-bucket class
    # aggregation is globally correct
    var_tbl = _var_rows_to_dict_table(t.filter(pc.equal(t.column("kind"), 1)))
    # use_dictionary=False: dict-var values are mostly unique, so parquet
    # dictionary pages cost ~15x encode time AND more bytes (measured 2.6s
    # -> 0.14s per part, 47 -> 42 MB total at sf1.6)
    from clp_core_ray.state.atomic import atomic_replace_table

    atomic_replace_table(var_tbl, var_part_path, compression="zstd",
                         use_dictionary=False)
    return t.filter(pc.equal(t.column("kind"), 0))


def _finalize_dicts_parallel(out_dir: str, delta_files: list[str] = (), fs=None,
                             n_tasks: int = 16, prededup_refs: list | None = None
                             ) -> dict:
    """Medium delta sets, fully parallel two-phase finalize: Ray tasks
    read+dedup file groups (phase 1, possibly pre-started during the sink
    write), then one task per id-hash bucket merges and writes its var.dict
    part directly (phase 2). The driver only assembles the small logtype
    dictionary + class index."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray

    prededup_task = ray.remote(num_returns=N_FINALIZE_BUCKETS)(_prededup_files)
    merge_task = ray.remote(_merge_write_bucket)

    refs = list(prededup_refs or [])  # each entry: tuple/list of N bucket refs
    if delta_files:
        groups = [g.tolist() for g in np.array_split(np.array(delta_files), n_tasks)
                  if len(g)]
        refs += [prededup_task.remote(g, fs) for g in groups]
    if not refs:
        return _finalize_from_table(
            out_dir,
            pa.table({"kind": pa.array([], pa.int8()), "id": pa.array([], pa.int64()),
                      "value": pa.array([], pa.large_string()),
                      "n_vars": pa.array([], pa.int32()),
                      "logtype_class": pa.array([], pa.string())}),
        )
    vdir = os.path.join(out_dir, "var.dict")
    os.makedirs(vdir, exist_ok=True)
    lt_refs = [
        merge_task.remote(
            b, os.path.join(vdir, f"part-{b}.parquet"),
            *[group_refs[b] for group_refs in refs],
        )
        for b in range(N_FINALIZE_BUCKETS)
    ]
    lt = pa.concat_tables(ray.get(lt_refs)).to_pandas()
    lt = lt.drop_duplicates(["id", "logtype_class"])
    by_class = lt.groupby("logtype_class")["id"].agg(lambda s: sorted(set(s))).to_dict()
    ldict = lt.drop_duplicates("id")[["id", "value", "n_vars"]].rename(
        columns={"id": "logtype_id", "value": "logtype"}
    )
    pq.write_table(pa.Table.from_pandas(ldict, preserve_index=False),
                   os.path.join(out_dir, "logtype.dict.parquet"))
    with open(os.path.join(out_dir, "class_logtypes.json"), "w") as f:
        json.dump({k: list(map(int, v)) for k, v in by_class.items()}, f)
    return {"n_logtypes": len(ldict), "classes": sorted(by_class)}


def broadcast_var_dict(var_dict_ds):
    """Materialize the var dict small-side and ray.put it for DecodeStage."""
    import ray

    tables = [pa.table(b) for b in var_dict_ds.iter_batches(batch_format="pyarrow")]
    tbl = pa.concat_tables(tables) if tables else pa.table(
        {"var_id": pa.array([], type=pa.int64()), "value": pa.array([], type=pa.string())}
    )
    return ray.put({"var_id": tbl.column("var_id").combine_chunks(),
                    "value": tbl.column("value").combine_chunks()})
