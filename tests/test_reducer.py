"""Reducer operator plug-in surface (reducer/Operator.hpp:20-51, Pipeline.cpp:24-41)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from clp_core_ray.functions import reducer as red


def _table(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": rng.choice(["a", "b", "c", "d"], size=n),
            "v": rng.integers(0, 1000, size=n),
            "ts": rng.integers(10**6, 10**9, size=n),
        }
    )


def _collect(ds) -> dict:
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tabs)
    return {
        r["k"]: r for r in t.to_pylist()
    }


def test_builtin_operators_match_pandas(ray_session):
    import ray.data as rd

    t = _table()
    ds = rd.from_arrow(t).repartition(8)
    out = _collect(
        red.run_reducer(
            ds,
            "k",
            [
                red.CountOperator(alias="cnt"),
                red.SumOperator("v"),
                red.MinMaxOperator("ts"),
                red.AvgOperator("v"),
            ],
        )
    )
    df = t.to_pandas()
    g = df.groupby("k")
    for k, grp in g:
        row = out[k]
        assert row["cnt"] == len(grp)
        assert row["sum_v"] == grp["v"].sum()
        assert row["min_ts"] == grp["ts"].min()
        assert row["max_ts"] == grp["ts"].max()
        assert row["avg_v"] == pytest.approx(grp["v"].mean())


def test_custom_map_partial_operator(ray_session):
    """A user-defined decomposable aggregate: sum of squares via the adapter."""
    import ray.data as rd

    t = _table(2000, seed=11)
    ds = rd.from_arrow(t).repartition(6)

    def partial(keys, batch: pa.Table) -> pa.Table:
        sq = pc.multiply(batch.column("v"), batch.column("v"))
        b = batch.select(keys).append_column("__sq", sq)
        out = b.group_by(keys).aggregate([("__sq", "sum")])
        return out.rename_columns(keys + ["sum_sq"])

    op = red.MapPartialOperator(partial, [("sum_sq", "sum", "sum_sq")])
    out = _collect(red.run_reducer(ds, "k", [op]))
    df = t.to_pandas()
    for k, grp in df.groupby("k"):
        assert out[k]["sum_sq"] == (grp["v"].astype("int64") ** 2).sum()


def test_registry_round_trip_and_errors():
    op = red.make_operator("sum", "v", "total")
    assert isinstance(op, red.SumOperator) and op.alias == "total"
    with pytest.raises(KeyError):
        red.make_operator("nope")

    class TopOp(red.CountOperator):
        pass

    red.register_operator("top_test", TopOp)
    assert isinstance(red.make_operator("top_test"), TopOp)
    with pytest.raises(ValueError):
        red._ray_aggs([("c", "median", "c")])


def test_chained_pipeline_stages(ray_session):
    """Stage 2 reduces stage 1's finalized output (Pipeline::add_pipeline_stage).

    Stage 1: per-(k,ts-parity) counts. Stage 2 regroups by parity only and
    sums — chained stages see the previous stage's output as their input.
    """
    import ray.data as rd

    t = _table(3000, seed=3)
    parity = pc.bit_wise_and(t.column("ts"), 1)
    t = t.append_column("par", parity)
    ds = rd.from_arrow(t).repartition(5)

    stage1 = red.Pipeline(["k", "par"]).add_stage(red.CountOperator(alias="cnt")).run(ds)
    stage2 = red.run_reducer(stage1, ["par"], [red.SumOperator("cnt", "total")])
    out = {r["par"]: r["total"] for b in stage2.iter_batches(batch_format="pyarrow")
           for r in pa.table(b).to_pylist()}
    df = t.to_pandas()
    expect = df.groupby("par").size()
    assert out[0] == expect[0] and out[1] == expect[1]
