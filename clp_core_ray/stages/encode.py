"""Encode / decode Ray Data stages (map_batches callables).

EncodeStage is the CLP "compression" map: text → logtype + typed vars
(reference write path: streaming_archive/writer/Archive.cpp:298-316, rebuilt
vectorized). It is a callable class so map_batches runs it as an actor pool —
scratch allocator pages stay warm across batches (big win in this sandbox, see
clp_core_ray.__init__) and per-actor state (nothing today, epoch dictionaries
later) has a home.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clp_core_ray.vec.decoder import decode_batch
from clp_core_ray.vec.tokenizer import _fnv1a64_tokens, _string_buffers, encode_batch


def logtype_ids(logtype: pa.Array) -> pa.Array:
    """Content-hash (FNV-1a 64) id per logtype string — stable across
    partitions and retries, so no id-coordination shuffle is ever needed.
    (Divergence from CLP's sequential per-archive ids; same observable
    semantics, see SURVEY.md §7 'Deterministic ids under retries'.)"""
    offsets, data = _string_buffers(logtype)
    lengths = np.diff(offsets)
    return pa.array(_fnv1a64_tokens(data, offsets[:-1], lengths).view(np.int64))


class EncodeStage:
    """text column → encoded columns; optionally drops the raw text.

    keep_text=True retains the original text (round-trip verification);
    production pipelines drop it — decode reconstructs it exactly.
    """

    def __init__(self, text_col: str = "text", keep_text: bool = False,
                 keep_dict_vars: bool = True):
        self.text_col = text_col
        self.keep_text = keep_text
        self.keep_dict_vars = keep_dict_vars

    def __call__(self, batch: pa.Table) -> pa.Table:
        enc = encode_batch(batch.column(self.text_col))
        cols = dict(zip(batch.column_names, batch.columns))
        if not self.keep_text:
            cols.pop(self.text_col, None)
        cols["logtype"] = enc["logtype"]
        cols["logtype_id"] = logtype_ids(enc["logtype"])
        cols["encoded_vars"] = enc["encoded_vars"]
        cols["var_types"] = enc["var_types"]
        if self.keep_dict_vars:
            cols["dict_vars"] = enc["dict_vars"]
        cols["n_vars"] = enc["n_vars"]
        return pa.table(cols)


class DecodeStage:
    """Inverse of EncodeStage → adds a decoded text column.

    Resolves dict vars inline when the batch carries ``dict_vars``; otherwise
    uses a broadcast dictionary passed as a ray.ObjectRef (J2 in SURVEY.md:
    dict table shipped once via ray.put, read per actor in __init__)."""

    def __init__(self, out_col: str = "text", var_dict_ref=None):
        self.out_col = out_col
        self._ids = None
        self._values = None
        if var_dict_ref is not None:
            import ray

            tbl = ray.get(var_dict_ref)
            self._ids = np.asarray(tbl["var_id"], dtype=np.int64)
            self._values = tbl["value"] if isinstance(tbl["value"], pa.Array) else pa.array(
                tbl["value"]
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "dict_vars" in batch.column_names and self._ids is None:
            decoded = decode_batch(
                batch.column("logtype"),
                batch.column("encoded_vars"),
                batch.column("var_types"),
                dict_vars=batch.column("dict_vars"),
            )
        else:
            decoded = decode_batch(
                batch.column("logtype"),
                batch.column("encoded_vars"),
                batch.column("var_types"),
                dict_ids=self._ids,
                dict_values=self._values,
            )
        return batch.append_column(self.out_col, decoded)
