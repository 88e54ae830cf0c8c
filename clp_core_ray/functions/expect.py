"""Declarative data-quality expectations — a Great-Expectations-style
validation pass expressed Ray-Data-first: every rule folds to per-batch
violation counters in ONE streaming pass (vectorized pyarrow/numpy per
rule), plus one distinct-pair exchange shared by the uniqueness rules.
The report is rule-cardinality (driver-tiny at any corpus size).

Rules (each a dict):
    {"rule": name, "kind": "not_null",  "col": c}
    {"rule": name, "kind": "in_range",  "col": c, "lo": x, "hi": y}
    {"rule": name, "kind": "in_set",    "col": c, "values": [...]}
    {"rule": name, "kind": "matches",   "col": c, "pattern": re2}
    {"rule": name, "kind": "unique",    "col": c}

null handling: not_null counts nulls; every other row-level rule counts a
null as a violation too (an unparseable value is not in range / not in the
set / does not match), matching SQL FILTER predicates written with the
IS-NULL disjunct.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _violations(batch: pa.Table, rule: dict) -> int:
    col = batch.column(rule["col"]).combine_chunks()
    kind = rule["kind"]
    if kind == "not_null":
        return col.null_count
    if kind == "in_range":
        ok = pc.and_(pc.greater_equal(col, rule["lo"]),
                     pc.less_equal(col, rule["hi"]))
    elif kind == "in_set":
        ok = pc.is_in(col, value_set=pa.array(rule["values"],
                                              type=col.type))
    elif kind == "matches":
        ok = pc.match_substring_regex(col, rule["pattern"])
    else:
        raise ValueError(f"unknown expectation kind {kind!r}")
    ok = pc.fill_null(ok, False)  # null value = violation
    return batch.num_rows - pc.sum(pc.cast(ok, pa.int64())).as_py()


def run_expectations(ds, rules: list[dict]) -> pa.Table:
    """Validate ``ds`` against ``rules``; returns
    pa.Table(rule, violations, total) sorted by rule name."""
    row_rules = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]

    def partial(b: pa.Table) -> pa.Table:
        names = [r["rule"] for r in row_rules] + ["__total__"]
        viol = [_violations(b, r) for r in row_rules] + [0]
        tot = [b.num_rows] * len(names)
        return pa.table({"rule": pa.array(names),
                         "violations": pa.array(viol, type=pa.int64()),
                         "total": pa.array(tot, type=pa.int64())})

    tabs = [pa.table(x) for x in
            ds.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tabs) if tabs else pa.table(
        {"rule": pa.array([], type=pa.string()),
         "violations": pa.array([], type=pa.int64()),
         "total": pa.array([], type=pa.int64())})
    folded = (t.group_by(["rule"])
              .aggregate([("violations", "sum"), ("total", "sum")])
              .rename_columns(["rule", "violations", "total"]))
    total = 0
    idx = folded.column("rule").to_pylist()
    if "__total__" in idx:
        total = folded.column("total")[idx.index("__total__")].as_py()
        folded = folded.filter(
            pc.not_equal(folded.column("rule"), "__total__"))
    rows = folded.to_pylist()
    for r in uniq_rules:
        col = r["col"]

        def dedupe(b: pa.Table, c=col) -> pa.Table:
            return b.select([c]).group_by([c]).aggregate([])

        from clp_core_ray.pipelines.aggregate import count_by

        pairs = count_by(ds.map_batches(dedupe, batch_format="pyarrow"),
                         [col])
        n_distinct = sum(len(x["cnt"]) for x in
                         pairs.iter_batches(batch_format="pyarrow"))
        rows.append({"rule": r["rule"],
                     "violations": int(total - n_distinct),
                     "total": int(total)})
    rows.sort(key=lambda x: x["rule"])
    return pa.table({
        "rule": pa.array([x["rule"] for x in rows]),
        "violations": pa.array([x["violations"] for x in rows],
                               type=pa.int64()),
        "total": pa.array([x["total"] for x in rows], type=pa.int64())})
