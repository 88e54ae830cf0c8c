"""Routing classifier: assign each turn a logtype class for fan-out sinks.

Class rule (documented so the DuckDB oracle can reproduce it in SQL):
    logtype_class = lower(tool)                  if tool != ''
                  = lower(first word of text)    otherwise, restricted to the
                    known level words {info, warn, error, debug}; else 'other'

Mirrors CLP's archive fan-out (one archive per input partition,
streaming_archive/writer/Archive.cpp) re-keyed by message class, which is what
the north_rule's "routed by logtype class to fan-out Parquet sinks" asks for.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

KNOWN_CLASSES = ("info", "warn", "error", "debug")

ROUTE_SQL_EXPR = (
    "CASE WHEN tool <> '' THEN lower(tool) "
    "WHEN lower(split_part(text, ' ', 1)) IN ('info','warn','error','debug') "
    "THEN lower(split_part(text, ' ', 1)) ELSE 'other' END"
)


def classify_batch(batch: pa.Table, text_col: str = "text") -> pa.Array:
    first_word = pc.ascii_lower(
        pc.list_element(pc.split_pattern(batch.column(text_col), " ", max_splits=1), 0)
    )
    level = pc.if_else(
        pc.is_in(first_word, value_set=pa.array(KNOWN_CLASSES)),
        first_word,
        pa.scalar("other"),
    )
    tool = batch.column("tool")
    return pc.if_else(pc.not_equal(tool, ""), pc.ascii_lower(tool), level).combine_chunks()


class RouteStage:
    """Appends the logtype_class column used as the sink partition key."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column("logtype_class", classify_batch(batch, self.text_col))
