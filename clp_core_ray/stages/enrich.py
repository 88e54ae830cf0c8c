"""Broadcast-lookup enrichment stage (J6 in SURVEY.md §2.4).

The small side (role/tool metadata) is shipped once — as a plain table for the
built-in metadata, or via ray.put ObjectRef for user tables — and attached per
batch with vectorized pc.index_in + take. No shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# built-in role metadata (the reference has no such table; required by the
# north_rule's "enriched via broadcast lookup joins (role/tool metadata)")
ROLE_META = pa.table(
    {
        "role": ["user", "assistant", "system", "tool"],
        "role_group": ["human", "model", "control", "automation"],
        "is_automated": [False, True, True, True],
    }
)
TOOL_META = pa.table(
    {
        "tool": ["search", "browser", "calculator", "code_exec", "db_query", ""],
        "tool_category": ["retrieval", "retrieval", "compute", "compute", "data", "none"],
    }
)


def lookup_join(
    batch: pa.Table, small: pa.Table, key: str, default: dict | None = None
) -> pa.Table:
    """Attach all non-key columns of ``small`` to ``batch`` by exact key match."""
    pos = pc.index_in(batch.column(key), small.column(key))
    for name in small.column_names:
        if name == key:
            continue
        col = pc.take(small.column(name), pos)
        if default and name in default:
            col = pc.fill_null(col, default[name])
        batch = batch.append_column(name, col)
    return batch


class EnrichStage:
    """Adds role_group / is_automated / tool_category columns.

    Custom small sides: pass ray.ObjectRef of {"table": pa.Table, "key": str}
    entries; they're fetched once per actor in __init__ (broadcast join)."""

    def __init__(self, extra_refs: list | None = None):
        self.extras = []
        if extra_refs:
            import ray

            self.extras = [ray.get(r) for r in extra_refs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = lookup_join(batch, ROLE_META, "role")
        batch = lookup_join(batch, TOOL_META, "tool", default={"tool_category": "none"})
        for ex in self.extras:
            batch = lookup_join(batch, ex["table"], ex["key"])
        return batch
