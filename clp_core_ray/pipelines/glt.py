"""GLT (grouped logtype tables) layout — SURVEY.md §1.5.

Regroups encoded messages by logtype: each logtype's table is columnar with
one column per variable position (var_0..var_{k-1}) plus row metadata —
glt/streaming_archive/writer/LogtypeTable.hpp:13-18. Small tables are
combined into a shared 'misc' sink ordered by descending size
(GLTSegment.hpp:83-113's combine threshold) — the same small-group-skew fix,
re-expressed as a partitioned parquet layout.

This is the layout that makes per-variable-position predicates columnar
(reported 7.8x faster search vs clp, docs/core-unstructured/glt.md:6-7):
a query on "variable 2 of logtype L" reads exactly one parquet column.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

COMBINE_THRESHOLD_ROWS = 1000  # groups smaller than this go to the misc sink


def explode_vars(group: pa.Table) -> pa.Table:
    """One logtype's rows → per-position var columns (vectorized reshape)."""
    ev = group.column("encoded_vars").combine_chunks()
    n = len(group)
    flat = np.asarray(ev.flatten(), dtype=np.int64)
    offsets = np.asarray(ev.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    k = int(counts[0]) if n else 0
    if n and not (counts == k).all():
        raise ValueError("rows of one logtype must have equal var counts")
    cols = {
        "conv_id": group.column("conv_id"),
        "turn_idx": group.column("turn_idx"),
        "ts": group.column("ts"),
        "logtype_id": group.column("logtype_id"),
    }
    mat = flat.reshape(n, k) if n else np.zeros((0, 0), dtype=np.int64)
    for j in range(k):
        cols[f"var_{j}"] = pa.array(mat[:, j])
    return pa.table(cols)


def write_glt(archive_dir: str, out_dir: str | None = None) -> dict:
    """Archive routed sinks → GLT layout on disk.

    groupby(logtype_id) — the logtype dictionary is small, so this shuffle
    moves each row once into its logtype bucket; big logtypes get their own
    directory, small ones are combined (in original list form) under misc/.
    Returns {logtype_id: rows} for the dedicated tables.
    """
    import ray.data as rd

    out_dir = out_dir or os.path.join(archive_dir, "glt")
    routed = os.path.join(archive_dir, "routed")
    cols = ["conv_id", "turn_idx", "ts", "logtype_id", "encoded_vars"]
    ds = rd.read_parquet(routed, columns=cols)

    # group sizes from a partial count (cheap; drives the combine decision)
    from clp_core_ray.pipelines.aggregate import count_by

    sizes = {
        r["logtype_id"]: r["cnt"]
        for b in count_by(ds, "logtype_id").iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist()
    }
    big = sorted(
        (lid for lid, c in sizes.items() if c >= COMBINE_THRESHOLD_ROWS),
        key=lambda l: -sizes[l],
    )
    big_set = set(big)

    def route_glt(group: pa.Table) -> pa.Table:
        lid = group.column("logtype_id")[0].as_py()
        if lid in big_set:
            t = explode_vars(group)
            pos_dir = os.path.join(out_dir, f"logtype_id={lid & 0xFFFFFFFFFFFFFFFF:016x}")
            os.makedirs(pos_dir, exist_ok=True)
            import uuid

            import pyarrow.parquet as pq

            pq.write_table(
                t, os.path.join(pos_dir, f"part-{uuid.uuid4().hex}.parquet"),
                compression="zstd",
            )
            return pa.table({"logtype_id": pa.array([lid]),
                             "rows": pa.array([len(group)]),
                             "sink": pa.array(["dedicated"])})
        import uuid

        import pyarrow.parquet as pq

        misc = os.path.join(out_dir, "misc")
        os.makedirs(misc, exist_ok=True)
        pq.write_table(group, os.path.join(misc, f"part-{uuid.uuid4().hex}.parquet"),
                       compression="zstd")
        return pa.table({"logtype_id": pa.array([lid]),
                         "rows": pa.array([len(group)]),
                         "sink": pa.array(["misc"])})

    result = (
        ds.groupby("logtype_id")
        .map_groups(route_glt, batch_format="pyarrow")
        .to_pandas()
    )
    return dict(zip(result.logtype_id, result.rows))


def read_var_column(glt_dir: str, logtype_id: int, position: int):
    """Read exactly one variable position of one logtype — the GLT payoff."""
    import ray.data as rd

    d = os.path.join(glt_dir, f"logtype_id={logtype_id & 0xFFFFFFFFFFFFFFFF:016x}")
    return rd.read_parquet(d, columns=["conv_id", "turn_idx", f"var_{position}"])
