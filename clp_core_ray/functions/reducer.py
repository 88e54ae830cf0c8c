"""User-extensible aggregation operators (reducer plug-in surface, §2.10).

Re-expresses the reference's reducer framework — ``reducer/Operator.hpp:20-51``
(push_intra_stage / push_inter_stage / get_stored_result_iterator),
``reducer/Pipeline.cpp:24-41`` (chained stages fed records or record groups),
``reducer/CountOperator.cpp:4-31`` (the one shipped operator) — as a Ray-Data
plug-in API:

* ``Operator.partial(batch)`` is the *inter-stage combiner*: it runs inside
  ``map_batches`` on every input block and must emit one row per group key
  carrying mergeable partial-state columns.  This is where 100-TB inputs are
  shrunk before the shuffle.
* ``Operator.merge_aggs()`` is the *intra-stage reducer*: a list of
  ``(column, how, alias)`` merge specs (``how`` ∈ sum/min/max) applied by the
  groupby shuffle to combine partial states from different blocks.
* ``Operator.finalize(table)`` post-processes the merged (small) result —
  e.g. avg = sum/count — as a vectorized Arrow projection.

Operators are registered by name (``register_operator``) so config-driven
pipelines can name them the way the reference's reducer server selects
operators from the query job config (``reducer/reducer_server.cpp``).
``Pipeline`` chains operators: each stage's finalized output feeds the next
stage's partial pass, matching ``Pipeline::add_pipeline_stage``/``finish``.

Scale notes: every stage is partial-before-shuffle (one row per key per
block enters the exchange), merge is an associative groupby aggregate, and
finalize touches only the already-reduced result — no driver-side state, no
full materialization.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


class Operator:
    """Base class for pluggable grouped-aggregation operators.

    Subclasses override :meth:`partial`, :meth:`merge_aggs` and (optionally)
    :meth:`finalize`.  ``keys`` is bound by the pipeline at run time, so one
    operator instance is reusable across group-bys.
    """

    #: Columns (beyond the group keys) this operator reads from the input.
    input_cols: tuple[str, ...] = ()

    def __init__(self) -> None:
        self.keys: list[str] = []

    def bind(self, keys: list[str]) -> "Operator":
        self.keys = list(keys)
        return self

    # -- inter-stage combiner (runs in map_batches over every block) ---------
    def partial(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError

    # -- intra-stage reducer (merge specs for the groupby shuffle) -----------
    def merge_aggs(self) -> list[tuple[str, str, str]]:
        """Return (partial_col, how, alias) merge specs; how ∈ sum|min|max."""
        raise NotImplementedError

    # -- post-merge projection on the small result ---------------------------
    def finalize(self, table: pa.Table) -> pa.Table:
        return table


class CountOperator(Operator):
    """Per-group row count (reducer/CountOperator.cpp:4-31).

    Output column: ``count`` — the reference's cRecordElementKey.
    """

    def __init__(self, alias: str = "count") -> None:
        super().__init__()
        self.alias = alias

    def partial(self, batch: pa.Table) -> pa.Table:
        out = (
            batch.select(self.keys)
            .group_by(self.keys)
            .aggregate([(self.keys[0], "count")])
        )
        return out.rename_columns(self.keys + [self.alias])

    def merge_aggs(self):
        return [(self.alias, "sum", self.alias)]


class SumOperator(Operator):
    """Per-group sum of a value column."""

    def __init__(self, col: str, alias: str | None = None) -> None:
        super().__init__()
        self.col = col
        self.alias = alias or f"sum_{col}"
        self.input_cols = (col,)

    def partial(self, batch: pa.Table) -> pa.Table:
        out = (
            batch.select(self.keys + [self.col])
            .group_by(self.keys)
            .aggregate([(self.col, "sum")])
        )
        return out.rename_columns(self.keys + [self.alias])

    def merge_aggs(self):
        return [(self.alias, "sum", self.alias)]


class MinMaxOperator(Operator):
    """Per-group min and max of a value column (ts-range style, A3)."""

    def __init__(self, col: str, min_alias: str | None = None,
                 max_alias: str | None = None) -> None:
        super().__init__()
        self.col = col
        self.min_alias = min_alias or f"min_{col}"
        self.max_alias = max_alias or f"max_{col}"
        self.input_cols = (col,)

    def partial(self, batch: pa.Table) -> pa.Table:
        out = (
            batch.select(self.keys + [self.col])
            .group_by(self.keys)
            .aggregate([(self.col, "min"), (self.col, "max")])
        )
        return out.rename_columns(self.keys + [self.min_alias, self.max_alias])

    def merge_aggs(self):
        return [(self.min_alias, "min", self.min_alias),
                (self.max_alias, "max", self.max_alias)]


class AvgOperator(Operator):
    """Per-group mean: sum+count partials, merged, divided in finalize.

    The canonical decomposable aggregate — demonstrates why the plug-in
    surface separates partial/merge/finalize (a naive per-group mean is not
    mergeable; sum and count are).
    """

    def __init__(self, col: str, alias: str | None = None) -> None:
        super().__init__()
        self.col = col
        self.alias = alias or f"avg_{col}"
        self._s = f"__{self.alias}_s"
        self._n = f"__{self.alias}_n"
        self.input_cols = (col,)

    def partial(self, batch: pa.Table) -> pa.Table:
        out = (
            batch.select(self.keys + [self.col])
            .group_by(self.keys)
            .aggregate([(self.col, "sum"), (self.col, "count")])
        )
        return out.rename_columns(self.keys + [self._s, self._n])

    def merge_aggs(self):
        return [(self._s, "sum", self._s), (self._n, "sum", self._n)]

    def finalize(self, table: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.cast(table.column(self._s), pa.float64()),
            pc.cast(table.column(self._n), pa.float64()),
        )
        return table.drop_columns([self._s, self._n]).append_column(self.alias, avg)


class MapPartialOperator(Operator):
    """Adapter for fully custom user logic: three callables, no subclass.

    ``partial_fn(keys, batch) -> table`` must emit keys + partial columns;
    ``merge_specs`` as in :meth:`Operator.merge_aggs`; ``finalize_fn`` is an
    optional projection over the merged result.  This is the minimal surface
    a user needs to drop a novel decomposable aggregate (hyperloglog sketch,
    top-k heap serialized to a list column, …) into any grouped pipeline.
    """

    def __init__(self, partial_fn: Callable[[list[str], pa.Table], pa.Table],
                 merge_specs: list[tuple[str, str, str]],
                 finalize_fn: Callable[[pa.Table], pa.Table] | None = None) -> None:
        super().__init__()
        self._partial_fn = partial_fn
        self._merge = list(merge_specs)
        self._finalize_fn = finalize_fn

    def partial(self, batch: pa.Table) -> pa.Table:
        return self._partial_fn(self.keys, batch)

    def merge_aggs(self):
        return self._merge

    def finalize(self, table: pa.Table) -> pa.Table:
        return self._finalize_fn(table) if self._finalize_fn else table


# --------------------------------------------------------------------------
# Registry — config-driven operator selection (reducer_server job configs).
# --------------------------------------------------------------------------

_REGISTRY: dict[str, Callable[..., Operator]] = {}


def register_operator(name: str, factory: Callable[..., Operator]) -> None:
    """Register an operator factory under ``name`` (user extension point)."""
    _REGISTRY[name] = factory


def make_operator(name: str, *args, **kwargs) -> Operator:
    if name not in _REGISTRY:
        raise KeyError(f"unknown reducer operator {name!r}; "
                       f"registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name](*args, **kwargs)


for _name, _cls in [("count", CountOperator), ("sum", SumOperator),
                    ("min_max", MinMaxOperator), ("avg", AvgOperator)]:
    register_operator(_name, _cls)


# --------------------------------------------------------------------------
# Pipeline — chained stages over a Dataset (reducer/Pipeline.cpp:24-41).
# --------------------------------------------------------------------------

_MERGE_HOW = {"sum", "min", "max"}


def _ray_aggs(specs: list[tuple[str, str, str]]):
    from ray.data.aggregate import Max, Min, Sum

    cls = {"sum": Sum, "min": Min, "max": Max}
    out = []
    for col, how, alias in specs:
        if how not in _MERGE_HOW:
            raise ValueError(f"merge how={how!r} not in {_MERGE_HOW}")
        out.append(cls[how](col, alias_name=alias))
    return out


class Pipeline:
    """Chained grouped-aggregation stages over a ``ray.data.Dataset``.

    Each stage runs partial (combiner) inside ``map_batches``, merges via the
    groupby shuffle, finalizes, and feeds the next stage — the Dataset
    re-expression of ``Pipeline::push_record`` → stage chain → ``finish()``.
    Multiple operators in ONE stage share a single shuffle (their partials
    are joined column-wise per batch, their merge specs concatenated).
    """

    def __init__(self, keys: list[str] | str) -> None:
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.stages: list[list[Operator]] = []

    def add_stage(self, ops: Operator | list[Operator]) -> "Pipeline":
        ops = [ops] if isinstance(ops, Operator) else list(ops)
        for op in ops:
            op.bind(self.keys)
        self.stages.append(ops)
        return self

    def run(self, ds):
        for ops in self.stages:
            ds = self._run_stage(ds, ops)
        return ds

    def _run_stage(self, ds, ops: list[Operator]):
        keys = self.keys

        def partial(batch: pa.Table) -> pa.Table:
            parts = [op.partial(batch) for op in ops]
            out = parts[0]
            for p in parts[1:]:
                # identical group sets per batch are not guaranteed across
                # operators (an op may drop null groups) — align by join.
                out = out.join(p, keys=keys, join_type="full outer")
            return out

        specs = [s for op in ops for s in op.merge_aggs()]
        merged = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(keys)
            .aggregate(*_ray_aggs(specs))
        )

        def finalize(batch: pa.Table) -> pa.Table:
            for op in ops:
                batch = op.finalize(batch)
            return batch

        return merged.map_batches(finalize, batch_format="pyarrow")


def run_reducer(ds, keys: list[str] | str, ops: list[Operator]):
    """One-stage convenience wrapper: ``Pipeline(keys).add_stage(ops).run(ds)``."""
    return Pipeline(keys).add_stage(ops).run(ds)
