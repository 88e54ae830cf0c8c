"""Decompression: archive → original turn text (clp x, K4/K5 in SURVEY.md).

Mirrors FileDecompressor (clp/FileDecompressor.cpp:9-76): open the encoded
columns, decode each message through the dictionaries, and emit text; ordered
reconstruction is a sort by (conv_id, turn_idx) — the rebuild's analogue of
clp_s's k-way merge by log_event_idx (JsonConstructor.cpp:63-160).

Dictionaries are loaded once on the driver and broadcast via ray.put (they are
the small side; CLP likewise loads dicts once per process, clg.cpp:176-199).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from clp_core_ray.vec.decoder import decode_batch


def load_dicts(archive_dir: str):
    """(logtype table, var table) from a compressed archive."""
    ldict = pq.read_table(os.path.join(archive_dir, "logtype.dict.parquet"))
    var_dir = os.path.join(archive_dir, "var.dict")
    vfiles = [
        os.path.join(var_dir, f) for f in sorted(os.listdir(var_dir))
        if f.endswith(".parquet")
    ]
    # column-pruned: the classes segment-index column is search-only state,
    # not worth broadcasting to decoders. Sorted by var_id so decode_batch
    # resolves ids with a binary search instead of a per-batch hash build.
    vdict = pa.concat_tables(
        pq.read_table(f, columns=["var_id", "value"]) for f in vfiles
    )
    vdict = vdict.sort_by("var_id")
    return ldict, vdict


class ArchiveDecodeStage:
    """Stateless-task decode for compact archives (T3): the dictionaries
    ride a plasma ref inside the pickled instance and each task resolves it
    lazily on first batch — a zero-copy ``ray.get`` of Arrow tables. This
    lets the streaming executor fuse read → decode into ONE task per block;
    an actor pool here would de-fuse the chain and ship every encoded block
    through the object store to reach the actor (measured 2× wall on the
    compress side for the same pattern).

    Resolves logtype templates by id, then decodes encoded_vars through the
    broadcast var dictionary.
    """

    def __init__(self, dicts_ref, out_col: str = "text"):
        self.dicts_ref = dicts_ref
        self.out_col = out_col
        self._loaded = False

    def _load(self):
        import ray

        ldict, vdict = ray.get(self.dicts_ref)
        self.lt_ids = ldict.column("logtype_id").combine_chunks()
        self.lt_values = ldict.column("logtype").combine_chunks()
        self.var_ids = np.asarray(vdict.column("var_id"), dtype=np.int64)
        self.var_values = vdict.column("value").combine_chunks()
        self._loaded = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._loaded:
            self._load()
        pos = pc.index_in(batch.column("logtype_id"), self.lt_ids)
        logtype = pc.take(self.lt_values, pos)
        decoded = decode_batch(
            logtype,
            batch.column("encoded_vars"),
            batch.column("var_types"),
            dict_ids=self.var_ids,
            dict_values=self.var_values,
        )
        return batch.append_column(self.out_col, decoded)


#: Var dictionaries whose UNCOMPRESSED size (parquet footer estimate)
#: exceeds this are not broadcast; decode flips to the hash-partitioned
#: join fallback (SURVEY §2.4 J2). CLP itself always loads full dicts
#: (clg.cpp:176-199) because per-archive epoch caps bound them; the
#: fallback exists for archives built with a raised CLP_DICT_CAP_ENTRIES
#: where a broadcast would not fit a worker heap.
def _dict_broadcast_cap() -> int:
    return int(os.environ.get("CLP_DICT_BROADCAST_CAP", 256 << 20))


def _vardict_uncompressed_bytes(archive_dir: str) -> int:
    """Footer-only estimate of the var dict's in-memory size (no data read)."""
    var_dir = os.path.join(archive_dir, "var.dict")
    total = 0
    for f in sorted(os.listdir(var_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(var_dir, f)).metadata
        for rg in range(md.num_row_groups):
            total += md.row_group(rg).total_byte_size
    return total


def decompress(archive_dir: str, columns=("conv_id", "turn_idx"), ordered: bool = False,
               prefilter=None):
    """Dataset[(…columns, text)] reconstructed from the archive.

    ``prefilter`` (batch→batch over the raw encoded rows) runs BEFORE the
    decode stage, so callers that only need a row subset (e.g. context
    extraction around search matches) never pay decode for pruned rows."""
    import ray
    import ray.data as rd

    routed = os.path.join(archive_dir, "routed")
    need = list(columns) + ["logtype_id", "encoded_vars", "var_types"]
    first = pq.ParquetFile(_first_parquet(routed)).schema_arrow.names
    if "dict_vars" in first:  # non-compact archive: decode inline
        need.append("dict_vars")
        need.append("logtype")  # DecodeStage resolves templates from the row
    over_cap = ("dict_vars" not in need
                and _vardict_uncompressed_bytes(archive_dir)
                > _dict_broadcast_cap())
    if over_cap:
        # join keys for the partitioned fallback ride the read
        need += [c for c in ("conv_id", "turn_idx") if c not in need]
    else:
        dicts_ref = ray.put(load_dicts(archive_dir))
    # *.parquet only: a dead task attempt's *.inprogress tmp (swept by
    # compress(), but a reader may race a crashed job) must never reach the
    # parquet reader
    ds = rd.read_parquet(routed, columns=need, file_extensions=["parquet"])
    if prefilter is not None:
        ds = ds.map_batches(prefilter, batch_format="pyarrow")

    if "dict_vars" in first:
        from clp_core_ray.stages.encode import DecodeStage

        out = ds.map_batches(DecodeStage(out_col="text"), batch_format="pyarrow")
    elif over_cap:
        out = _decode_partitioned(ds, archive_dir)
    else:
        out = ds.map_batches(
            ArchiveDecodeStage(dicts_ref),
            batch_format="pyarrow",
            batch_size=32 * 1024,
        )
    out = out.map_batches(
        lambda b: b.select(list(columns) + ["text"]), batch_format="pyarrow"
    )
    if ordered:
        out = out.sort(list(columns))
    return out


def _decode_partitioned(ds, archive_dir: str):
    """Over-cap decode (SURVEY §2.4 J2 fallback): resolve dictionary
    variables by a HASH-PARTITIONED join of encoded rows against the
    var-dict Dataset instead of a plasma broadcast — the path for var
    dictionaries too large for a worker heap.

    Two bounded-bucket exchanges, all-vectorized inside each group:

    1. Explode each row's dict-var slots to (rowkey, slot, var_id); union
       with the var-dict Dataset tagged by side; bucket on var_id hash;
       per bucket one argsort + searchsorted resolves every slot. Only the
       dict SHARD for a bucket is ever resident — never the whole dict.
    2. Union resolved slots with the encoded rows; bucket on conv_id hash;
       per bucket sort both sides by (conv_id, turn_idx[, slot]), fold the
       values into an aligned ``list<string>`` per row, and decode inline
       via ``decode_batch(dict_vars=...)`` (the non-compact archives'
       inline-dict path).

    Relies on the flagship archive invariant that (conv_id, turn_idx) is
    unique per row (the same stable ordering key the reconstruction sort
    uses). The logtype dict (templates only, always small) still
    broadcasts. Costs one extra read of the encoded columns plus two
    shuffles — the price of not broadcasting; activated only above
    CLP_DICT_BROADCAST_CAP."""
    import ray
    import ray.data as rd

    from clp_core_ray.pipelines.temporal import _key_and_bucket
    from clp_core_ray.pipelines.windows import scaled_buckets
    from clp_core_ray.vec.decoder import _cumsum0, _list_flat

    nb = scaled_buckets()
    ldict = pq.read_table(os.path.join(archive_dir, "logtype.dict.parquet"))
    lt_ref = ray.put((ldict.column("logtype_id").combine_chunks(),
                      ldict.column("logtype").combine_chunks()))
    schema = ds.schema()
    row_cols = list(schema.names)
    row_types = dict(zip(schema.names, schema.types))

    def _dict_counts_slots(var_types: pa.Array):
        offsets, vt_flat = _list_flat(var_types)
        is_dict = np.asarray(vt_flat, dtype=np.int8) == 2
        cs = _cumsum0(is_dict.astype(np.int64))
        cnts = np.diff(cs[offsets])
        starts = _cumsum0(cnts)[:-1]
        slots = np.arange(int(cnts.sum()), dtype=np.int64) - np.repeat(
            starts, cnts)
        return is_dict, cnts, slots

    # ---- stage 1: slot resolution via var_id-hash buckets ----------------
    def explode(b: pa.Table) -> pa.Table:
        is_dict, cnts, slots = _dict_counts_slots(b.column("var_types"))
        _, ev_flat = _list_flat(b.column("encoded_vars"))
        need_ids = np.asarray(ev_flat, dtype=np.int64)[is_dict]
        conv = pc.take(b.column("conv_id").combine_chunks(),
                       pa.array(np.repeat(np.arange(b.num_rows), cnts)))
        turn = pc.take(b.column("turn_idx").combine_chunks(),
                       pa.array(np.repeat(np.arange(b.num_rows), cnts)))
        t = pa.table({
            "conv_id": conv, "turn_idx": turn,
            "_slot": pa.array(slots), "var_id": pa.array(need_ids),
            "value": pa.nulls(len(need_ids), type=pa.large_string()),
            "_side": pa.array(np.ones(len(need_ids), dtype=np.int8))})
        _, jb = _key_and_bucket(t.column("var_id"), nb)
        return t.append_column("_jb", jb)

    def dict_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        t = pa.table({
            "conv_id": pa.nulls(n, type=row_types["conv_id"]),
            "turn_idx": pa.nulls(n, type=row_types["turn_idx"]),
            "_slot": pa.nulls(n, type=pa.int64()),
            "var_id": b.column("var_id"),
            "value": b.column("value").combine_chunks().cast(
                pa.large_string()),
            "_side": pa.array(np.zeros(n, dtype=np.int8))})
        _, jb = _key_and_bucket(t.column("var_id"), nb)
        return t.append_column("_jb", jb)

    var_dir = os.path.join(archive_dir, "var.dict")
    vds = rd.read_parquet(var_dir, columns=["var_id", "value"],
                          file_extensions=["parquet"])

    def resolve(g: pa.Table) -> pa.Table:
        side = np.asarray(g.column("_side"), dtype=np.int8)
        dic = g.filter(pa.array(side == 0))
        slot = g.filter(pa.array(side == 1))
        ids = np.asarray(dic.column("var_id"), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        need = np.asarray(slot.column("var_id"), dtype=np.int64)
        pos = np.searchsorted(ids[order], need)
        pos[pos >= len(ids)] = 0
        if len(need) and not np.array_equal(ids[order][pos], need):
            raise KeyError("var id missing from partitioned dictionary")
        vals = pc.take(dic.column("value").combine_chunks(),
                       pa.array(order[pos]))
        return pa.table({
            "conv_id": slot.column("conv_id"),
            "turn_idx": slot.column("turn_idx"),
            "_slot": slot.column("_slot"),
            "value": vals})

    resolved = (
        ds.map_batches(explode, batch_format="pyarrow")
        .union(vds.map_batches(dict_side, batch_format="pyarrow"))
        .groupby("_jb")
        .map_groups(resolve, batch_format="pyarrow")
    )

    # ---- stage 2: fold values back per row + decode per conv bucket ------
    def rows_side(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in row_cols}
        cols["_slot"] = pa.nulls(b.num_rows, type=pa.int64())
        cols["value"] = pa.nulls(b.num_rows, type=pa.large_string())
        cols["_side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        t = pa.table(cols)
        _, rb = _key_and_bucket(t.column("conv_id"), nb)
        return t.append_column("_rb", rb)

    def resolved_side(b: pa.Table) -> pa.Table:
        cols = {}
        for c in row_cols:
            if c in ("conv_id", "turn_idx"):
                cols[c] = b.column(c).combine_chunks().cast(row_types[c])
            else:
                cols[c] = pa.nulls(b.num_rows, type=row_types[c])
        cols["_slot"] = b.column("_slot")
        cols["value"] = b.column("value")
        cols["_side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        t = pa.table(cols)
        _, rb = _key_and_bucket(t.column("conv_id"), nb)
        return t.append_column("_rb", rb)

    def fold_decode(g: pa.Table, _lt=lt_ref) -> pa.Table:
        side = np.asarray(g.column("_side"), dtype=np.int8)
        rows = g.filter(pa.array(side == 0))
        res = g.filter(pa.array(side == 1))
        if rows.num_rows == 0:
            return pa.table(
                {c: pa.nulls(0, type=g.schema.field(c).type)
                 for c in row_cols}
            ).append_column("text", pa.nulls(0, type=pa.large_string()))
        rows = rows.take(pc.sort_indices(rows, sort_keys=[
            ("conv_id", "ascending"), ("turn_idx", "ascending")]))
        res = res.take(pc.sort_indices(res, sort_keys=[
            ("conv_id", "ascending"), ("turn_idx", "ascending"),
            ("_slot", "ascending")]))
        vt = rows.column("var_types").combine_chunks()
        _, cnts, _ = _dict_counts_slots(vt)
        if int(cnts.sum()) != res.num_rows:
            raise ValueError("resolved slot count mismatch")
        dict_vars = pa.LargeListArray.from_arrays(
            pa.array(_cumsum0(cnts)),
            res.column("value").combine_chunks())
        lt_ids, lt_values = ray.get(_lt)
        pos = pc.index_in(rows.column("logtype_id"), lt_ids)
        logtype = pc.take(lt_values, pos)
        from clp_core_ray.vec.decoder import decode_batch

        text = decode_batch(
            logtype, rows.column("encoded_vars").combine_chunks(),
            vt, dict_vars=dict_vars)
        return rows.select(row_cols).append_column("text", text)

    return (
        ds.map_batches(rows_side, batch_format="pyarrow")
        .union(resolved.map_batches(resolved_side, batch_format="pyarrow"))
        .groupby("_rb")
        .map_groups(fold_decode, batch_format="pyarrow")
    )


def extract_ir_chunks(archive_dir: str, out_dir: str,
                      four_byte: bool = True,
                      target_bytes: int | None = None) -> list[str]:
    """Archive → CLP IR stream chunk files (K8: the reference's clo IR
    extraction job, clo/OutputHandler.hpp IR-chunk role — the log viewer
    consumes archives as IR chunks, not text).

    Composition of the two existing stages: decode the archive's encoded
    columns back to (ts, text), then serialize each block as one IR stream
    via ``ir.write_ir``; one chunk per block keeps the extraction streaming
    (no per-archive materialization). Returns the chunk paths.
    """
    from clp_core_ray.ir import write_ir

    ds = decompress(archive_dir, columns=("ts",))
    return write_ir(ds, out_dir, four_byte=four_byte, ts_col="ts",
                    target_bytes=target_bytes)


def _first_parquet(routed: str) -> str:
    for root, _, files in os.walk(routed):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    raise FileNotFoundError(f"no parquet files under {routed}")


def extract_text_logs(archive_dir: str, out_dir: str) -> list[str]:
    """Reconstruct original log FILES from an archive written by
    ``compress_text_logs`` — `clp x` (FileDecompressor.cpp:9-76): decode
    each message, re-insert its timestamp with the original pattern, join
    in message order, one output file per input file. File assembly runs
    distributed (one map_groups task per file-hash bucket writes its files
    to shared storage); returns the written paths."""
    import os

    import numpy as np
    import pyarrow.compute as pc

    from clp_core_ray.sources.textlog import reconstruct_file_text

    os.makedirs(out_dir, exist_ok=True)
    dec = decompress(
        archive_dir,
        columns=("conv_id", "turn_idx", "ts", "pattern_id", "ts_begin",
                 "eof_nl"),
    )

    from clp_core_ray.pipelines.windows import scaled_buckets

    nb = scaled_buckets()

    def bucket(b):
        from clp_core_ray.pipelines.temporal import _key_and_bucket

        _, bk = _key_and_bucket(b.column("conv_id"), nb)
        return b.append_column("_bucket", bk)

    def write_files(g) -> "object":
        import pyarrow as pa

        paths_out = []
        ids = g.column("conv_id").combine_chunks()
        codes = np.asarray(ids.dictionary_encode().indices, dtype=np.int64)
        order = np.lexsort((np.asarray(g.column("turn_idx")), codes))
        cs = codes[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        ends = np.append(starts[1:], len(cs))
        ts_ms = pc.cast(pc.cast(g.column("ts"), pa.timestamp("ms"), safe=False),
                        pa.int64())
        for s, e in zip(starts, ends):
            idx = pa.array(order[s:e], type=pa.int64())
            src_path = ids[order[s]].as_py()
            sub = pa.table({
                "path": pa.array([src_path] * (e - s)),
                "msg_idx": g.column("turn_idx").take(idx).cast(pa.int64()),
                "ts_ms": ts_ms.take(idx),
                "pattern_id": g.column("pattern_id").take(idx),
                "ts_begin": g.column("ts_begin").take(idx),
                "content": g.column("text").take(idx),
            })
            name = src_path.replace("/", "_").lstrip("_")
            dst = os.path.join(out_dir, name)
            txt = reconstruct_file_text(sub)
            if g.column("eof_nl")[order[s]].as_py():
                txt += "\n"
            with open(dst, "w") as f:
                f.write(txt)
            paths_out.append(dst)
        return pa.table({"path": pa.array(paths_out, type=pa.large_string())})

    acct = (dec.map_batches(bucket, batch_format="pyarrow")
            .groupby("_bucket").map_groups(write_files, batch_format="pyarrow"))
    return sorted(p for b in acct.iter_batches(batch_format="pyarrow")
                  for p in b.column("path").to_pylist())
