"""Search results cache — the clp-package results-cache role
(clp-py-utils/initialize-results-cache.py, scheduler/query/query_scheduler.py:
completed query jobs land in a results collection; repeated jobs and stream
extractions consult it instead of re-scanning archives).

Rebuilt without MongoDB: one parquet file per (archive-state, query,
params) content key under ``<base>/_results_cache/``, written atomically
(tmp → ``os.replace``, the repo-wide sink discipline). The key hashes the
ARCHIVE MANIFEST CONTENTS, not timestamps — any compression job that adds
or rewrites an archive changes the manifests and therefore the key, so
stale hits are structurally impossible and no invalidation protocol is
needed. Concurrent writers of the same key race benignly (same bytes,
atomic rename, last-wins).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

CACHE_DIR = "_results_cache"


def _archive_state(base_dir: str) -> str:
    """Digest of every archive's manifest contents under ``base_dir``."""
    from clp_core_ray.state import catalog as cat

    h = hashlib.sha1()
    if cat.has_catalog(base_dir):
        dirs = sorted(e["dir"] for e in cat.read_catalog(base_dir))
    else:
        dirs = sorted(
            os.path.join(base_dir, d) for d in os.listdir(base_dir)
            if os.path.isdir(os.path.join(base_dir, d))
            and not d.startswith("_"))
    for d in dirs:
        h.update(os.path.relpath(d, base_dir).encode())
        mdir = os.path.join(d, "_manifests")
        if os.path.isdir(mdir):
            for name in sorted(os.listdir(mdir)):
                with open(os.path.join(mdir, name), "rb") as f:
                    h.update(name.encode())
                    h.update(f.read())
    return h.hexdigest()


def cache_key(base_dir: str, query: str, params: dict | None = None) -> str:
    payload = json.dumps({"state": _archive_state(base_dir), "q": query,
                          "p": params or {}}, sort_keys=True)
    return hashlib.sha1(payload.encode()).hexdigest()[:32]


def cached_search(base_dir: str, query: str, search_fn,
                  params: dict | None = None) -> pa.Table:
    """Return the cached result table for (archive state, query, params),
    computing and atomically persisting it on miss. ``search_fn`` is
    called with no arguments and must return a ``pa.Table`` or a Ray
    Dataset (consumed via Arrow batches)."""
    d = os.path.join(base_dir, CACHE_DIR)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, cache_key(base_dir, query, params) + ".parquet")
    if os.path.isfile(path):
        return pq.read_table(path)
    res = search_fn()
    if not isinstance(res, pa.Table):
        tabs = [pa.table(b) for b in res.iter_batches(batch_format="pyarrow")]
        res = pa.concat_tables(tabs) if tabs else pa.table({})
    tmp = f"{path}.{os.getpid()}.inprogress"
    pq.write_table(res, tmp)
    os.replace(tmp, path)
    return res
