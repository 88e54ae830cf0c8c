"""Structured-search filter compiler (clp_s search pipeline, SURVEY.md §2.12).

Mirrors the clp_s AST pass chain (clp-s.cpp:140-271) in miniature:

    parse (KQL-ish)  →  DNF (OrOfAndForm)  →  schema pruning (SchemaMatch)
                     →  pyarrow.compute evaluation (Output.filter)

Filter operations: EXISTS / NEXISTS / EQ / NEQ / LT / GT / LTE / GTE
(FilterOperation.hpp:8-17); values with ``*``/``?`` wildcards become
wildcard matches. Schema pruning: a conjunction requiring path P can skip
every schema table whose leaf set lacks P — the Ray-side analogue of
clp_s's schema-match pass.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


# ---- AST -------------------------------------------------------------------


@dataclass
class Pred:
    op: str  # eq neq lt gt lte gte exists nexists
    path: str
    value: object = None


@dataclass
class Bool:
    op: str  # and / or / not
    args: list


# ---- KQL-ish parser --------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:(?P<lpar>\()|(?P<rpar>\))|(?P<op>AND\b|OR\b|NOT\b)
        |(?P<cmp>(?P<cpath>[\w.]+)\s*(?P<crel>>=|<=|>|<)\s*(?P<cval>-?\d+(?:\.\d+)?))
        |(?P<kv>(?P<path>[\w.*]+)\s*:\s*(?P<val>"[^"]*"|[^\s)]+)))""",
    re.X,
)


def parse_kql(q: str):
    """Parse a KQL-ish query: `path: value`, `path > n`, AND/OR/NOT, parens.

    `path: *` means EXISTS; `NOT path: *` gives NEXISTS; quoted values keep
    spaces; unquoted values may contain wildcards.
    """
    pos = 0
    toks = []
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m:
            if q[pos:].strip():
                raise ValueError(f"cannot parse query at: {q[pos:]!r}")
            break
        pos = m.end()
        if m.group("lpar"):
            toks.append(("(",))
        elif m.group("rpar"):
            toks.append((")",))
        elif m.group("op"):
            toks.append((m.group("op"),))
        elif m.group("cmp"):
            rel = {">": "gt", "<": "lt", ">=": "gte", "<=": "lte"}[m.group("crel")]
            v = m.group("cval")
            toks.append(("pred", Pred(rel, m.group("cpath"), float(v) if "." in v else int(v))))
        else:
            path, val = m.group("path"), m.group("val")
            if val.startswith('"'):
                val = val[1:-1]
            if val == "*":
                toks.append(("pred", Pred("exists", path)))
            else:
                toks.append(("pred", Pred("eq", path, val)))

    def parse_or(i):
        node, i = parse_and(i)
        args = [node]
        while i < len(toks) and toks[i][0] == "OR":
            nxt, i = parse_and(i + 1)
            args.append(nxt)
        return (Bool("or", args) if len(args) > 1 else args[0]), i

    def parse_and(i):
        node, i = parse_not(i)
        args = [node]
        while i < len(toks) and toks[i][0] == "AND":
            nxt, i = parse_not(i + 1)
            args.append(nxt)
        return (Bool("and", args) if len(args) > 1 else args[0]), i

    def parse_not(i):
        if i < len(toks) and toks[i][0] == "NOT":
            node, i = parse_not(i + 1)
            return Bool("not", [node]), i
        return parse_atom(i)

    def parse_atom(i):
        if i >= len(toks):
            raise ValueError(f"unexpected end of query: {q!r}")
        if toks[i][0] == "(":
            node, i = parse_or(i + 1)
            if i >= len(toks) or toks[i][0] != ")":
                raise ValueError(f"unbalanced parenthesis in query: {q!r}")
            return node, i + 1
        if toks[i][0] != "pred":
            raise ValueError(f"expected predicate, got {toks[i][0]!r} in {q!r}")
        return toks[i][1], i + 1

    if not toks:
        raise ValueError(f"empty query: {q!r}")
    node, i = parse_or(0)
    if i != len(toks):
        raise ValueError("trailing tokens in query")
    return node


# ---- DNF (OrOfAndForm pass) ------------------------------------------------


def to_dnf(node) -> list[list[Pred]]:
    """AST → list of conjunctions of predicates (negations pushed inward)."""

    def push_not(n, neg=False):
        if isinstance(n, Pred):
            if not neg:
                return n
            flip = {"eq": "neq", "neq": "eq", "lt": "gte", "gte": "lt",
                    "gt": "lte", "lte": "gt", "exists": "nexists",
                    "nexists": "exists"}
            return Pred(flip[n.op], n.path, n.value)
        if n.op == "not":
            return push_not(n.args[0], not neg)
        op = n.op if not neg else ("or" if n.op == "and" else "and")
        return Bool(op, [push_not(a, neg) for a in n.args])

    def cross(n) -> list[list[Pred]]:
        if isinstance(n, Pred):
            return [[n]]
        if n.op == "and":
            acc = [[]]
            for a in n.args:
                acc = [x + y for x in acc for y in cross(a)]
            return acc
        return [c for a in n.args for c in cross(a)]

    return cross(push_not(node))


# ---- evaluation ------------------------------------------------------------


def _wildcardish(v) -> bool:
    return isinstance(v, str) and ("*" in v or "?" in v)


def eval_pred(batch: pa.Table, p: Pred) -> pa.Array:
    cols = set(batch.column_names)
    if p.op == "exists":
        return (pc.is_valid(batch.column(p.path)) if p.path in cols
                else pa.array([False] * len(batch)))
    if p.op == "nexists":
        return (pc.is_null(batch.column(p.path)) if p.path in cols
                else pa.array([True] * len(batch)))
    if p.path not in cols:
        return pa.array([False] * len(batch))
    col = batch.column(p.path)
    v = p.value
    if p.op in ("eq", "neq"):
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            try:
                v = float(v) if pa.types.is_floating(col.type) else int(v)
            except (TypeError, ValueError):
                return pa.array([p.op == "neq"] * len(batch))
            m = pc.equal(col, v)
        elif pa.types.is_boolean(col.type):
            m = pc.equal(col, str(v).lower() in ("true", "1"))
        elif _wildcardish(v):
            from clp_core_ray.pipelines.search import wildcard_match

            m = wildcard_match(col, v)
        else:
            m = pc.equal(col, str(v))
        m = pc.fill_null(m, False)
        return pc.invert(m) if p.op == "neq" else m
    rel = {"lt": pc.less, "gt": pc.greater, "lte": pc.less_equal,
           "gte": pc.greater_equal}[p.op]
    try:
        v = float(v) if pa.types.is_floating(col.type) else int(v)
    except (TypeError, ValueError):
        return pa.array([False] * len(batch))
    return pc.fill_null(rel(col, v), False)


def eval_dnf(batch: pa.Table, dnf: list[list[Pred]]) -> pa.Array:
    out = None
    for conj in dnf:
        m = None
        for p in conj:
            pm = eval_pred(batch, p)
            m = pm if m is None else pc.and_(m, pm)
        out = m if out is None else pc.or_(out, m)
    return out if out is not None else pa.array([True] * len(batch))


def conj_required_paths(conj: list[Pred]) -> set[str]:
    """Paths a record MUST have for this conjunction to hold (prunes schemas)."""
    return {p.path for p in conj if p.op in ("eq", "lt", "gt", "lte", "gte", "exists")}


# ---- clp_s archive search ---------------------------------------------------


def clps_search(out_dir: str, query: str,
                ts_range: tuple[float, float] | None = None):
    """Search a clp_s archive → Dataset[(log_event_idx, json)] of hits.

    Driver work is footer-metadata-only: schema tables whose leaf sets cannot
    satisfy any conjunction are skipped (SchemaMatch pruning), and the
    timestamp range index prunes before any data pages are read
    (EvaluateTimestampIndex). Surviving tables are scanned by map tasks —
    ClpString leaves decoded, pyarrow.compute filter, hits serialized back to
    JSON lines (Output.filter → result sink)."""
    import ray.data as rd
    import pyarrow.parquet as pq

    from clp_core_ray.pipelines.clps import (
        _decoded_view,
        _schema_files,
        _serialize_schema_table,
    )

    dnf = to_dnf(parse_kql(query))
    work: list[dict] = []
    for path in _schema_files(out_dir):
        pf = pq.ParquetFile(path)
        meta = {
            k.decode(): v.decode()
            for k, v in (pf.schema_arrow.metadata or {}).items()
        }
        ts_preds: list[Pred] = []
        if ts_range is not None and "ts_min" in meta:
            lo, hi = ts_range
            if float(meta["ts_max"]) < lo or float(meta["ts_min"]) > hi:
                continue
            # AddTimestampConditions pass: row-level ts predicates on the
            # designated timestamp leaf of surviving tables
            ts_key = meta.get("ts_key")
            if ts_key:
                ts_preds = [Pred("gte", ts_key, lo), Pred("lte", ts_key, hi)]
        leaf_paths = {k.split(":")[0] for k in json.loads(meta.get("schema_key", "[]"))}
        viable = [c + ts_preds for c in dnf if conj_required_paths(c) <= leaf_paths]
        if not viable:
            continue
        work.append({"path": path, "viable": json.dumps(_dnf_to_json(viable))})

    def scan(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq

        tbls = []
        for path, viable_js in zip(batch.column("path").to_pylist(),
                                   batch.column("viable").to_pylist()):
            t = _pq.read_table(path)
            meta = {k.decode(): v.decode() for k, v in (t.schema.metadata or {}).items()}
            view = _decoded_view(t, meta)
            viable = _dnf_from_json(json.loads(viable_js))
            mask = eval_dnf(view, viable)
            hits = view.filter(pc.fill_null(mask, False))
            if len(hits) == 0:
                continue
            tbls.append(pa.table({
                "log_event_idx": hits.column("log_event_idx").combine_chunks(),
                "json": _serialize_schema_table(hits),
            }))
        return pa.concat_tables(tbls) if tbls else pa.table(
            {"log_event_idx": pa.array([], type=pa.int64()),
             "json": pa.array([], type=pa.large_string())})

    if not work:
        return rd.from_arrow(pa.table(
            {"log_event_idx": pa.array([], type=pa.int64()),
             "json": pa.array([], type=pa.large_string())}))
    return rd.from_items(work).map_batches(scan, batch_format="pyarrow")


def _dnf_to_json(dnf: list[list[Pred]]) -> list:
    return [[{"op": p.op, "path": p.path, "value": p.value} for p in c] for c in dnf]


def _dnf_from_json(data: list) -> list[list[Pred]]:
    return [[Pred(d["op"], d["path"], d.get("value")) for d in c] for c in data]
