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


def _export_tuning_env() -> None:
    """Make the tuning heritable by child processes (Ray workers).

    mallopt/_tune_arrow_threads fix THIS process, but Ray Data's
    ReadParquet/Write workers never import this package — they inherit the
    raylet's env instead. Exporting the equivalent env vars (glibc reads
    MALLOC_*_THRESHOLD_ at startup; Arrow/BLAS size pools from
    OMP_NUM_THREADS) tunes every worker, provided it runs before ray.init.
    setdefault: never overrides an operator's choice.

    EXPLICIT OPT-IN (not an import side effect): mutating process-global env
    from an import would cap BLAS/OpenMP parallelism for any application
    that merely imports this package (r2 ADVICE). Our own entry points —
    bench.py, the CLI, the test session fixture — call it before ray.init.
    """
    import os

    for k, v in (("MALLOC_MMAP_THRESHOLD_", str(1 << 30)),
                 ("MALLOC_TRIM_THRESHOLD_", str(1 << 30)),
                 ("OMP_NUM_THREADS", "2")):
        os.environ.setdefault(k, v)


def _patch_fsspec_http_threadsafe() -> None:
    """Make concurrent ``read_parquet`` planning thread-safe when aiohttp
    is absent.

    Ray's path resolution runs ``from fsspec.implementations.http import
    HTTPFileSystem`` on EVERY read call, catching only
    ``ModuleNotFoundError``. Without aiohttp that import fails each time
    (Python evicts the failed module from sys.modules), and two driver
    threads planning reads concurrently can race the import machinery —
    the loser surfaces a plain ``ImportError`` ("cannot import name
    'HTTPFileSystem'") that Ray does NOT catch, failing a perfectly good
    local read. Seen in the ingest scheduler's concurrent pollers.

    Fix: if the real import fails, seed ``sys.modules`` once with a stub
    module whose ``HTTPFileSystem`` class raises on INSTANTIATION (same
    net behavior for actual HTTP reads), so later imports are lock-free
    sys.modules lookups. No-op when aiohttp is installed."""
    try:
        import fsspec.implementations.http  # noqa: F401  (real one wins)
        return
    except Exception:
        pass
    import sys
    import types
    try:
        import fsspec.implementations
    except Exception:
        return  # no fsspec at all: Ray's ModuleNotFoundError path is safe

    class HTTPFileSystem:  # pragma: no cover - never instantiated locally
        def __init__(self, *a, **k):
            raise ImportError("aiohttp is required for HTTPFileSystem")

    mod = types.ModuleType("fsspec.implementations.http")
    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules.setdefault("fsspec.implementations.http", mod)
    if not hasattr(fsspec.implementations, "http"):
        fsspec.implementations.http = sys.modules[
            "fsspec.implementations.http"]


# process-local tuning only (allocator + this process's Arrow pools); the
# env-var export for Ray workers is the explicit _export_tuning_env() opt-in
_tune_malloc()
_tune_arrow_threads()
_patch_fsspec_http_threadsafe()
