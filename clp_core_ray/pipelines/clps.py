"""clp_s (semi-structured JSON) engine subset — SURVEY.md §1.4.

Rebuilds the clp_s data model Ray-Data-first:

- records parse vectorized via pyarrow.json (simdjson's role, JsonParser.cpp)
- each record's **schema** = its set of present (leaf path, type) pairs; the
  schema id is a content hash of that set (SchemaTree/SchemaMap dedup keyed
  on (parent, key, type), SchemaTree.hpp:27-40,183)
- records are bucketed per schema id and stored as columnar tables
  (ArchiveWriter.hpp:89-98); string leaves containing spaces are ClpStrings —
  recursively CLP-encoded with the core kernels (JsonParser.cpp:195-207) into
  (logtype, vars) sub-columns; other strings are VarStrings stored verbatim
- the merged parse tree (node table) is the union of leaf paths
- ordered reconstruction merges schema tables by log_event_idx
  (JsonConstructor.cpp:63-160's k-way merge → a sort here)

Scope: objects nested to any depth, scalar leaves (int64/double/bool/string)
and lists of scalars. Type-polymorphic paths live in *different* schemas, as
in clp_s, as long as each per-schema batch is type-consistent.
"""

from __future__ import annotations

import io
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj
import pyarrow.parquet as pq

from clp_core_ray.encoding import fnv1a64
from clp_core_ray.vec.decoder import decode_batch
from clp_core_ray.vec.tokenizer import encode_batch

SCHEMA_META = "schemas.json"


def _parse_lines(lines: list[str]) -> pa.Table:
    buf = io.BytesIO(("\n".join(lines)).encode())
    return pj.read_json(buf)


def _flatten(tbl: pa.Table) -> dict[str, pa.Array]:
    """Nested struct columns → flat {dotted.path: array} leaves."""
    out: dict[str, pa.Array] = {}

    def walk(prefix: str, arr: pa.ChunkedArray | pa.Array):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_struct(arr.type):
            for f in arr.type:
                child = arr.field(f.name)
                # propagate parent nulls into children
                if arr.null_count:
                    child = pc.if_else(pc.is_valid(arr), child, pa.nulls(len(arr), child.type))
                walk(f"{prefix}.{f.name}" if prefix else f.name, child)
        else:
            out[prefix] = arr

    for name in tbl.column_names:
        walk(name, tbl.column(name))
    return out


def _type_name(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_type_name(t.value_type)}>"
    return "str"


def schema_ids_for(leaves: dict[str, pa.Array], n: int) -> tuple[np.ndarray, dict]:
    """Per-row schema id = FNV hash over the sorted present (path:type) set."""
    paths = sorted(leaves)
    present = np.zeros((len(paths), n), dtype=bool)
    for i, p in enumerate(paths):
        present[i] = np.asarray(pc.is_valid(leaves[p]))
    token = [fnv1a64(f"{p}:{_type_name(leaves[p].type)}".encode()) for p in paths]
    token = np.array(token, dtype=np.int64).view(np.uint64)
    # order-independent combine: sum of per-leaf tokens mixed with position-free
    # multiplier (commutative), then re-hash
    with np.errstate(over="ignore"):
        acc = (present * token[:, None]).sum(axis=0, dtype=np.uint64)
        acc = (acc ^ (acc >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    sid = acc.view(np.int64)
    key_of = {}
    for row_sid in np.unique(sid):
        rows = np.flatnonzero(sid == row_sid)
        mask = present[:, rows[0]]
        key_of[int(row_sid)] = sorted(
            f"{paths[i]}:{_type_name(leaves[paths[i]].type)}"
            for i in np.flatnonzero(mask)
        )
    return sid, key_of


def clps_compress(ndjson_lines: list[str], out_dir: str,
                  timestamp_key: str | None = None) -> dict:
    """Compress NDJSON → per-schema columnar tables + schema map.

    Driver-orchestrated but batch-vectorized: the heavy parse/encode work runs
    in Ray tasks per schema bucket; line order is preserved as log_event_idx
    (clp_s's decompression order key).
    """
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    idx_tbl = pa.table(
        {"log_event_idx": pa.array(range(len(ndjson_lines)), type=pa.int64()),
         "raw": pa.array(ndjson_lines, type=pa.large_string())}
    )

    # phase 1: assign schema ids (vectorized parse per batch)
    def assign(batch: pa.Table) -> pa.Table:
        lines = batch.column("raw").to_pylist()
        parsed = _parse_lines(lines)
        leaves = _flatten(parsed)
        sid, key_of = schema_ids_for(leaves, len(batch))
        return pa.table(
            {
                "log_event_idx": batch.column("log_event_idx"),
                "raw": batch.column("raw"),
                "schema_id": pa.array(sid),
                "schema_key": pa.array(
                    [json.dumps(key_of[int(s)]) for s in sid], type=pa.string()
                ),
            }
        )

    ds = rd.from_arrow(idx_tbl).map_batches(assign, batch_format="pyarrow")

    # phase 2: per-schema bucket → columnar table with ClpString encoding
    ts_path = (timestamp_key or "").strip()

    def write_schema_table(group: pa.Table) -> pa.Table:
        sid = group.column("schema_id")[0].as_py()
        lines = group.column("raw").to_pylist()
        parsed = _parse_lines(lines)
        leaves = _flatten(parsed)
        cols: dict[str, pa.Array] = {
            "log_event_idx": group.column("log_event_idx").combine_chunks()
        }
        clp_encoded: list[str] = []
        for path, arr in sorted(leaves.items()):
            safe = path.replace("/", "_")
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                has_space = pc.any(
                    pc.match_substring(pc.fill_null(arr, ""), " ")
                ).as_py()
                if has_space:  # ClpString → recursive CLP encoding
                    enc = encode_batch(arr)
                    cols[f"{safe}\x00logtype"] = enc["logtype"]
                    cols[f"{safe}\x00vars"] = enc["encoded_vars"]
                    cols[f"{safe}\x00vartypes"] = enc["var_types"]
                    cols[f"{safe}\x00dictvars"] = enc["dict_vars"]
                    cols[f"{safe}\x00isnull"] = pc.is_null(arr)
                    clp_encoded.append(safe)
                    continue
            cols[safe] = arr
        t = pa.table(cols)
        meta = {
            "schema_id": str(sid),
            "schema_key": group.column("schema_key")[0].as_py(),
            "clp_encoded": json.dumps(clp_encoded),
        }
        # timestamp range index (clp_s TimestampEntry.hpp:19-58): min/max of
        # the user-designated timestamp leaf, used for archive pruning
        if ts_path and ts_path in leaves and len(t):
            col = leaves[ts_path]
            if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                import pyarrow.compute as _pc

                mn, mx = _pc.min(col).as_py(), _pc.max(col).as_py()
                if mn is not None:
                    meta["ts_min"] = str(mn)
                    meta["ts_max"] = str(mx)
                    meta["ts_key"] = ts_path
        t = t.replace_schema_metadata({k: v for k, v in meta.items()})
        pq.write_table(
            t,
            os.path.join(out_dir, f"schema_{sid & 0xFFFFFFFFFFFFFFFF:016x}.parquet"),
            compression="zstd",
        )
        return pa.table({"schema_id": pa.array([sid]),
                         "n_records": pa.array([len(group)])})

    acct = (
        ds.groupby("schema_id")
        .map_groups(write_schema_table, batch_format="pyarrow")
        .to_pandas()
    )
    schemas = dict(zip(acct.schema_id.astype(int), acct.n_records.astype(int)))
    with open(os.path.join(out_dir, SCHEMA_META), "w") as f:
        json.dump({str(k): int(v) for k, v in schemas.items()}, f)
    return schemas


def clps_decompress(out_dir: str, ordered: bool = True) -> list[str]:
    """Per-schema tables → NDJSON records (ordered by log_event_idx)."""
    rows: list[tuple[int, str]] = []
    for fname in sorted(os.listdir(out_dir)):
        if not (fname.startswith("schema_") and fname.endswith(".parquet")):
            continue
        t = pq.read_table(os.path.join(out_dir, fname))
        meta = {k.decode(): v.decode() for k, v in (t.schema.metadata or {}).items()}
        clp_cols = set(json.loads(meta.get("clp_encoded", "[]")))
        plain = {}
        for name in t.column_names:
            if "\x00" in name:
                continue
            plain[name] = t.column(name)
        decoded: dict[str, pa.Array] = {}
        for safe in clp_cols:
            text = decode_batch(
                t.column(f"{safe}\x00logtype"),
                t.column(f"{safe}\x00vars"),
                t.column(f"{safe}\x00vartypes"),
                dict_vars=t.column(f"{safe}\x00dictvars"),
            )
            isnull = t.column(f"{safe}\x00isnull")
            decoded[safe] = pc.if_else(isnull, pa.nulls(len(t), pa.large_string()), text)
        idx = plain.pop("log_event_idx").to_pylist()
        all_cols = {**plain, **decoded}
        pylists = {p: a.to_pylist() for p, a in all_cols.items()}
        for i in range(len(t)):
            obj: dict = {}
            for path, vals in pylists.items():
                v = vals[i]
                if v is None:
                    continue
                parts = path.split(".")
                cur = obj
                for p in parts[:-1]:
                    cur = cur.setdefault(p, {})
                cur[parts[-1]] = v
            rows.append((idx[i], json.dumps(obj, sort_keys=True)))
    if ordered:
        rows.sort(key=lambda r: r[0])
    return [r[1] for r in rows]


def schema_counts(out_dir: str) -> pa.Table:
    """A5: per-schema record counts from the schema map."""
    with open(os.path.join(out_dir, SCHEMA_META)) as f:
        m = json.load(f)
    ks = sorted(m, key=int)
    return pa.table(
        {"schema_id": pa.array([int(k) for k in ks], type=pa.int64()),
         "n_records": pa.array([m[k] for k in ks], type=pa.int64())}
    )
