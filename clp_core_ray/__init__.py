"""clp_core_ray — a Ray-Data-native rebuild of CLP's log-processing engine.

Subpackages: vec (vectorized encode/decode kernels), sources, stages,
pipelines, state, functions. See SURVEY.md for the blueprint.
"""

from __future__ import annotations


def _tune_malloc() -> None:
    """Keep large numpy temporaries on the heap instead of fresh mmaps.

    This sandbox (and many virtualized clusters) has a high first-touch
    page-fault cost; glibc serves >128 KiB allocations from fresh mmaps by
    default, so every batch-sized numpy temporary pays it. Raising the mmap
    and trim thresholds lets the allocator reuse warm pages across batches:
    measured 3x throughput on the encode kernel. Runs in every process that
    imports this package (incl. Ray workers deserializing our stages).
    """
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        one_gib = 1 << 30
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(one_gib))  # M_MMAP_THRESHOLD
        libc.mallopt(ctypes.c_int(-1), ctypes.c_int(one_gib))  # M_TRIM_THRESHOLD
    except Exception:
        pass  # non-glibc platform: harmless


def _tune_arrow_threads() -> None:
    """Cap per-process Arrow thread pools.

    Every Ray worker would otherwise size its Arrow CPU pool to all 32 cores
    → 32 workers × 32 threads oversubscribe the box. Our kernels are
    single-threaded numpy; parallelism comes from Ray tasks, not Arrow.
    """
    try:
        import pyarrow as pa

        pa.set_cpu_count(2)
        pa.set_io_thread_count(2)
    except Exception:
        pass


_tune_malloc()
_tune_arrow_threads()
