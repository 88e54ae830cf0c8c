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

from clp_core_ray.encoding import VT_DICT
from clp_core_ray.vec.tokenizer import _fnv1a64_tokens, _string_buffers


def _batch_unique(values: pa.Array, ids: np.ndarray) -> pa.Table:
    tbl = pa.table({"var_id": pa.array(ids), "value": values})
    return tbl.group_by(["var_id"]).aggregate([("value", "first")]).rename_columns(
        ["var_id", "value"]
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
            t.group_by(["logtype_id"])
            .aggregate([("logtype", "first"), ("n_vars", "first")])
            .rename_columns(["logtype_id", "logtype", "n_vars"])
        )

    partials = encoded_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("logtype_id").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def var_dict(encoded_ds):
    """Dataset[(var_id:int64, value:string)] — distinct dictionary variables.

    Ids are recomputed from the flattened dict_vars strings (same FNV-1a as
    encode), per-batch deduped before the global distinct groupby.
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
    return partials.groupby("var_id").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def broadcast_var_dict(var_dict_ds):
    """Materialize the var dict small-side and ray.put it for DecodeStage."""
    import ray

    tables = [pa.table(b) for b in var_dict_ds.iter_batches(batch_format="pyarrow")]
    tbl = pa.concat_tables(tables) if tables else pa.table(
        {"var_id": pa.array([], type=pa.int64()), "value": pa.array([], type=pa.string())}
    )
    return ray.put({"var_id": tbl.column("var_id").combine_chunks(),
                    "value": tbl.column("value").combine_chunks()})
