"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB. Ray is
initialised by the driver BEFORE this module is imported: nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001 transcripts: parse → enrich → route →
    aggregate; returns the per-class count table."""
    import tempfile

    from clp_core_ray.pipelines.compress import compress

    out = tempfile.mkdtemp(prefix="clp_entry_")
    return compress(0.001, out)


def queries() -> dict[str, Callable[[str], Any]]:
    from clp_core_ray.pipelines.queries import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    from clp_core_ray.pipelines.queries import oracle_map

    return oracle_map("/root/testdata/sf0.01")
