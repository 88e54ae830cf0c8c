"""Join strategies: broadcast for small sides, hash-shuffle for large ones.

The reference's only joins are dictionary-id lookups (J1-J3 in SURVEY.md §2.4)
and metadata enrichment; at 100-TB scale the general rule is: broadcast the
side that fits comfortably in every worker's heap (ship once via ``ray.put``,
read per actor in ``__init__``), and fall back to a partitioned hash join —
``Dataset.join`` — when the build side exceeds the broadcast budget.
``auto_join`` makes that decision from the build side's estimated in-memory
size so callers don't hard-code an assumption that breaks at 100× data
(the round-1 ``orders_by_nation`` mistake: customer broadcast unconditionally).
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

#: Build sides above this estimated size are hash-joined, not broadcast.
#: 64 MiB × concurrency copies stays well inside a worker heap; beyond it,
#: re-shipping the table to every actor costs more than a shuffle.
BROADCAST_BYTES_CAP = 64 << 20


def broadcast_join(ds, small: pa.Table, left_on: str, right_on: str,
                   take_cols: list[str]):
    """Map-side lookup join: ``small`` is put in the object store once and
    every task resolves ``left_on`` against it per batch (J6 pattern).

    Task-based on purpose: an Arrow table in plasma is fetched to each node
    once and mapped zero-copy by every task there, so tasks cost no more
    than an actor pool — and a pool sized near the CPU count deadlocks a
    multi-operator pipeline on a small cluster (observed with concurrency=4
    on 4 CPUs: the pool reserves every slot and downstream ops starve).

    Unmatched left rows get nulls (left-outer semantics, like ``pc.index_in``).
    """
    import ray

    ref = ray.put(small.select([right_on] + take_cols).combine_chunks())

    def attach(batch: pa.Table) -> pa.Table:
        tab = ray.get(ref)  # node-local zero-copy after first fetch
        pos = pc.index_in(batch.column(left_on), tab.column(right_on))
        for c in take_cols:
            batch = batch.append_column(c, pc.take(tab.column(c), pos))
        return batch

    return ds.map_batches(attach, batch_format="pyarrow")


def hash_join(left_ds, right_ds, left_on: str, right_on: str,
              join_type: str = "inner", num_partitions: int | None = None):
    """Partitioned hash join via ``Dataset.join`` (both sides shuffled by key).

    ``num_partitions`` defaults to the cluster CPU count — one aggregator
    partition per core; raise it when either side exceeds memory per core.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) or 8
    if num_partitions is None:
        num_partitions = max(4, ncpu)
    # fractional CPUs for the shuffle aggregators so a partition count near
    # the cluster CPU count can't starve the map side of the exchange
    agg_cpus = 0.5 if num_partitions >= ncpu else 1
    return left_ds.join(
        right_ds,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(left_on,),
        right_on=(right_on,),
        aggregator_ray_remote_args={"num_cpus": agg_cpus},
    )


def estimated_bytes(build: "pa.Table | object") -> int:
    """In-memory size estimate for the build side (Table or Dataset)."""
    if isinstance(build, pa.Table):
        return build.nbytes
    sz = build.size_bytes()  # parquet-encoded estimate; inflate for in-memory
    return int(sz * 3) if sz is not None else 1 << 60


def auto_join(left_ds, build, left_on: str, right_on: str,
              take_cols: list[str], broadcast_cap: int = BROADCAST_BYTES_CAP):
    """Pick broadcast vs hash join from the build side's estimated size.

    ``build`` may be a pyarrow Table (already loaded driver-side metadata) or
    a Dataset.  Under ``broadcast_cap`` it is broadcast; above, both sides
    are hash-partitioned and joined without ever materializing the build
    side in one place.
    """
    size = estimated_bytes(build)
    if size <= broadcast_cap:
        if not isinstance(build, pa.Table):
            tabs = [pa.table(b) for b in
                    build.select_columns([right_on] + take_cols)
                    .iter_batches(batch_format="pyarrow")]
            build = pa.concat_tables(tabs) if tabs else pa.table({})
        logger.info("auto_join: broadcast (%d bytes)", size)
        return broadcast_join(left_ds, build, left_on, right_on, take_cols)
    logger.info("auto_join: hash join (%d bytes > cap %d)", size, broadcast_cap)
    import ray.data as rd

    if isinstance(build, pa.Table):
        build = rd.from_arrow(build)
    build = build.select_columns([right_on] + take_cols)
    return hash_join(left_ds, build, left_on, right_on)
