"""GLT (grouped logtype tables) layout — SURVEY.md §1.5.

Regroups encoded messages by logtype: each logtype's table is columnar with
one column per variable position (var_0..var_{k-1}) plus row metadata —
glt/streaming_archive/writer/LogtypeTable.hpp:13-18. Small tables are
combined into a shared 'misc' sink ordered by descending size
(GLTSegment.hpp:83-113's combine threshold) — the same small-group-skew fix,
re-expressed as a partitioned parquet layout.

This is the layout that makes per-variable-position predicates columnar
(reported 7.8x faster search vs clp, docs/core-unstructured/glt.md:6-7):
a query on "variable 2 of logtype L" reads exactly one parquet column.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

COMBINE_THRESHOLD_ROWS = 1000  # groups smaller than this go to the misc sink

# Hot-logtype salting: a dominant template (in real logs one logtype routinely
# owns >50% of rows) must not become a single map_groups task materializing the
# whole group. Logtypes bigger than this are split into ceil(size/target)
# salted sub-groups; explode_vars is row-independent, so each sub-group writes
# an independent part file under the same logtype directory.
TARGET_ROWS_PER_PART = 250_000


def explode_vars(group: pa.Table) -> pa.Table:
    """One logtype's rows → per-position var columns (vectorized reshape)."""
    ev = group.column("encoded_vars").combine_chunks()
    n = len(group)
    flat = np.asarray(ev.flatten(), dtype=np.int64)
    offsets = np.asarray(ev.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    k = int(counts[0]) if n else 0
    if n and not (counts == k).all():
        raise ValueError("rows of one logtype must have equal var counts")
    cols = {
        "conv_id": group.column("conv_id"),
        "turn_idx": group.column("turn_idx"),
        "ts": group.column("ts"),
        "logtype_id": group.column("logtype_id"),
    }
    mat = flat.reshape(n, k) if n else np.zeros((0, 0), dtype=np.int64)
    for j in range(k):
        cols[f"var_{j}"] = pa.array(mat[:, j])
    return pa.table(cols)


def write_glt(archive_dir: str, out_dir: str | None = None,
              target_rows_per_part: int = TARGET_ROWS_PER_PART,
              _test_crash_marker: str | None = None) -> dict:
    """Archive routed sinks → GLT layout on disk.

    groupby(logtype_id, _salt) — the logtype dictionary is small, so this
    shuffle moves each row once into its logtype bucket; big logtypes get
    their own directory, small ones are combined (in original list form)
    under misc/. Hot logtypes are salted into ceil(size/target) sub-groups
    so no single map_groups task materializes a dominant template's whole
    group (GLTSegment.hpp:88-113 solves small-group skew; this is the
    hot-group side). Returns {logtype_id: rows} for the dedicated tables.
    """
    import ray.data as rd

    out_dir = out_dir or os.path.join(archive_dir, "glt")
    routed = os.path.join(archive_dir, "routed")
    cols = ["conv_id", "turn_idx", "ts", "logtype_id", "encoded_vars"]
    ds = rd.read_parquet(routed, columns=cols, file_extensions=["parquet"])

    # group sizes from a partial count (cheap; drives the combine decision)
    from clp_core_ray.pipelines.aggregate import count_by

    sizes = {
        r["logtype_id"]: r["cnt"]
        for b in count_by(ds, "logtype_id").iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist()
    }
    big = sorted(
        (lid for lid, c in sizes.items() if c >= COMBINE_THRESHOLD_ROWS),
        key=lambda l: -sizes[l],
    )
    big_set = set(big)

    # salt count per logtype: 1 for small/misc groups, size/target for hot
    # ones. The per-batch cyclic assignment below spreads a logtype's rows
    # round-robin over its salts, so sub-group sizes stay ~target regardless
    # of how skewed the logtype distribution is.
    n_salt = {lid: max(1, -(-c // target_rows_per_part)) if lid in big_set else 1
              for lid, c in sizes.items()}
    salt_ids = pa.array(np.fromiter(n_salt.keys(), dtype=np.int64,
                                    count=len(n_salt)))
    salt_ns = np.fromiter(n_salt.values(), dtype=np.int64, count=len(n_salt))

    def add_salt(b: pa.Table) -> pa.Table:
        pos = np.asarray(pc.index_in(b.column("logtype_id"), salt_ids),
                         dtype=np.int64)
        ns = salt_ns[pos]
        salt = np.arange(len(b), dtype=np.int64) % np.maximum(ns, 1)
        return b.append_column("_salt", pa.array(salt))

    def route_glt(group: pa.Table) -> pa.Table:
        # content-named atomic writes (state/atomic.py): a map_groups task
        # killed mid-write leaves only an .inprogress tmp; the retried task
        # re-derives the SAME final name from the group's content and
        # replaces it — no duplicate parts, no torn files
        from clp_core_ray.state.atomic import atomic_write_table

        lid = group.column("logtype_id")[0].as_py()
        group = group.drop_columns(["_salt"])
        if _test_crash_marker and not os.path.exists(_test_crash_marker):
            # failure injection (tests only): die mid-write on the first
            # group task — leave a torn .inprogress tmp behind, the shape a
            # real OOM-kill during pq.write_table produces. Ray retries the
            # task; the content-named atomic rename must make the retry exact
            # and readers must never see the torn tmp.
            fd = os.open(_test_crash_marker, os.O_CREAT | os.O_WRONLY)
            os.close(fd)
            torn_dir = (os.path.join(out_dir, "misc") if lid not in big_set
                        else os.path.join(
                            out_dir,
                            f"logtype_id={lid & 0xFFFFFFFFFFFFFFFF:016x}"))
            os.makedirs(torn_dir, exist_ok=True)
            with open(os.path.join(
                    torn_dir, f"part-dead.{os.getpid()}.inprogress"),
                    "wb") as f:
                f.write(b"PAR1torn")
            os._exit(1)
        if lid in big_set:
            t = explode_vars(group)
            pos_dir = os.path.join(out_dir, f"logtype_id={lid & 0xFFFFFFFFFFFFFFFF:016x}")
            os.makedirs(pos_dir, exist_ok=True)
            atomic_write_table(t, pos_dir,
                               cols=["conv_id", "turn_idx", "ts"],
                               compression="zstd")
            return pa.table({"logtype_id": pa.array([lid]),
                             "rows": pa.array([len(group)]),
                             "sink": pa.array(["dedicated"])})
        misc = os.path.join(out_dir, "misc")
        os.makedirs(misc, exist_ok=True)
        atomic_write_table(group, misc,
                           cols=["conv_id", "turn_idx", "logtype_id"],
                           compression="zstd")
        return pa.table({"logtype_id": pa.array([lid]),
                         "rows": pa.array([len(group)]),
                         "sink": pa.array(["misc"])})

    result = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["logtype_id", "_salt"])
        .map_groups(route_glt, batch_format="pyarrow")
        .to_pandas()
    )
    # job complete: sweep dead attempts' .inprogress tmps (readers filter to
    # *.parquet anyway, but a stale tmp pollutes listings and size accounting)
    from clp_core_ray.pipelines.compress import sweep_inprogress

    sweep_inprogress(out_dir)
    # sub-group rows sum back to per-logtype totals
    return result.groupby("logtype_id")["rows"].sum().to_dict()


def read_var_column(glt_dir: str, logtype_id: int, position: int):
    """Read exactly one variable position of one logtype — the GLT payoff."""
    import ray.data as rd

    d = os.path.join(glt_dir, f"logtype_id={logtype_id & 0xFFFFFFFFFFFFFFFF:016x}")
    return rd.read_parquet(d, columns=["conv_id", "turn_idx", f"var_{position}"],
                           file_extensions=["parquet"])


# --------------------------------------------------------------------------
# GLT search — the column-oriented search engine over the GLT layout
# (glt/Grep.cpp's LogtypeTable search; reported 7.8x faster than clp because
# a var condition touches one column, docs/core-unstructured/glt.md:6-7)
# --------------------------------------------------------------------------

_TYPE_CODE = {"int": 0, "float": 1, "dict": 2}
_PH_TYPE = {"\x11": "int", "\x13": "float", "\x12": "dict"}


def template_placeholder_types(template: str) -> list[str]:
    """Placeholder types of a stored logtype in order ('int'|'float'|'dict').

    Honors storage escapes: '\\' escapes the next byte, so an escaped
    placeholder byte is literal text, not a variable (parsing.inc:12-33
    escape model, same as the decoder's _active_escapes)."""
    out: list[str] = []
    i = 0
    n = len(template)
    while i < n:
        c = template[i]
        if c == "\\":
            i += 2
            continue
        t = _PH_TYPE.get(c)
        if t is not None:
            out.append(t)
        i += 1
    return out


def align_positions(ph_types: list[str], cond_types: list[str]):
    """Feasible variable positions per condition, or None if infeasible.

    Conditions are an in-order subsequence over the logtype's variables
    (Query.cpp:150-172 semantics); cond i may sit at any position of matching
    type within [earliest_i, latest_i] given the other conditions."""
    k = len(ph_types)
    m = len(cond_types)
    if m == 0:
        return []
    earliest = []
    j = 0
    for t in cond_types:
        while j < k and ph_types[j] != t:
            j += 1
        if j >= k:
            return None
        earliest.append(j)
        j += 1
    latest = [0] * m
    j = k - 1
    for i in range(m - 1, -1, -1):
        while j >= 0 and ph_types[j] != cond_types[i]:
            j -= 1
        if j < 0:
            return None
        latest[i] = j
        j -= 1
    return [
        [p for p in range(earliest[i], latest[i] + 1) if ph_types[p] == cond_types[i]]
        for i in range(m)
    ]


def _lid_dir(lid: int) -> str:
    return f"logtype_id={lid & 0xFFFFFFFFFFFFFFFF:016x}"


def _rg_can_match(meta_rg, col_index: dict, specs) -> bool:
    """Row-group pruning from parquet column statistics: a row group can host
    a subquery match only if, for every condition, at least one feasible
    column's [min,max] admits an allowed value (clg's segment-intersection
    idea applied at parquet row-group granularity)."""
    for conds, pos_sets in specs:
        if not conds:
            return True
        sq_ok = True
        for allowed, positions in zip(conds, pos_sets):
            cond_ok = False
            for j in positions:
                idx = col_index.get(f"var_{j}")
                if idx is None:
                    cond_ok = True
                    break
                st = meta_rg.column(idx).statistics
                if st is None or not st.has_min_max:
                    cond_ok = True
                    break
                if ((allowed >= st.min) & (allowed <= st.max)).any():
                    cond_ok = True
                    break
            if not cond_ok:
                sq_ok = False
                break
        if sq_ok:
            return True
    return False


def _rows_matching_positions(cols: dict, n: int, k: int, specs) -> np.ndarray:
    """OR over subqueries of the positional in-order condition match."""
    keep = np.zeros(n, dtype=bool)
    for conds, pos_sets in specs:
        if not conds:
            return np.ones(n, dtype=bool)
        ok = np.ones(n, dtype=bool)
        pos = np.zeros(n, dtype=np.int64)
        for allowed, positions in zip(conds, pos_sets):
            best = np.full(n, k, dtype=np.int64)
            for j in sorted(positions, reverse=True):
                c = cols[j]
                hit = (c == allowed[0]) if len(allowed) == 1 else np.isin(c, allowed)
                sel = hit & (pos <= j)
                best[sel] = j
            ok &= best < k
            pos = np.where(ok, best + 1, pos)
        keep |= ok
        if keep.all():
            break
    return keep


def glt_search(archive_dir: str, query: str, ignore_case: bool = False,
               glt_dir: str | None = None):
    """Search the GLT layout → Dataset[(conv_id, turn_idx, text)].

    Per candidate logtype the query's var conditions are aligned to that
    logtype's variable *positions* (glt/Grep.cpp's
    get_converted_logtype_query role), so the filter phase reads ONLY the
    conditioned var columns of the dedicated tables — plus row-group
    statistics pruning — and the remaining columns are late-materialized
    for matching row groups only. The combined 'misc' sink falls back to
    the row-oriented in-order var match. Results are decode-verified with
    the effective wildcard pattern, so they equal :func:`search_archive`.
    """
    import ray
    import ray.data as rd

    from clp_core_ray.pipelines.grep import rows_matching_subquery_vars
    from clp_core_ray.pipelines.search import (
        compile_for_archive,
        subquery_logtype_prune,
        wildcard_to_regex,
    )
    from clp_core_ray.vec.decoder import decode_batch

    glt_dir = glt_dir or os.path.join(archive_dir, "glt")
    cq, ldict, var_ids, var_values, var_classes = compile_for_archive(
        archive_dir, query, ignore_case
    )
    # per-variable segment index pruning (same index the row engine consults,
    # search.py subquery_logtype_prune): a dict-var condition whose entries
    # live only in certain sink classes restricts which logtypes can host a
    # match — their GLT tables/cells are never opened.
    lt_allowed = subquery_logtype_prune(archive_dir, cq, var_ids, var_classes)

    def _empty():
        return rd.from_arrow(
            pa.table({"conv_id": pa.array([], type=pa.string()),
                      "turn_idx": pa.array([], type=pa.int32()),
                      "text": pa.array([], type=pa.large_string())})
        )

    if not cq.match_all and not cq.subqueries:
        return _empty()

    lt_ids = np.asarray(ldict.column("logtype_id"), dtype=np.int64)
    lt_values = ldict.column("logtype").to_pylist()
    template_of = dict(zip(lt_ids.tolist(), lt_values))
    if cq.match_all:
        cand = set(lt_ids.tolist())
    else:
        cand = set()
        for sq, ok in zip(cq.subqueries, lt_allowed):
            cand |= set(sq.logtype_ids.tolist()) if ok is None else ok
        if not cand:
            return _empty()

    dedicated = {}
    for name in sorted(os.listdir(glt_dir)) if os.path.isdir(glt_dir) else []:
        if name.startswith("logtype_id="):
            v = int(name.split("=", 1)[1], 16)
            dedicated[v - (1 << 64) if v >= (1 << 63) else v] = os.path.join(
                glt_dir, name
            )

    rx = wildcard_to_regex(cq.processed)
    if ignore_case:
        rx = "(?i)" + rx

    # per-dedicated-logtype scan specs: lid → (template, k, specs, filter_cols)
    items = []
    spec_by_lid = {}
    for lid, d in dedicated.items():
        if lid not in cand:
            continue
        templ = template_of.get(lid)
        if templ is None:
            continue
        ph = template_placeholder_types(templ)
        k = len(ph)
        specs = []
        if cq.match_all:
            specs.append(((), ()))
        else:
            for sq, ok in zip(cq.subqueries, lt_allowed):
                if lid not in sq.logtype_ids:
                    continue
                if ok is not None and lid not in ok:
                    continue  # segment index: this logtype's cells can't match
                pos_sets = align_positions(ph, sq.var_cond_types)
                if pos_sets is None:
                    continue
                # conds beyond the typed ones (none today) would break the
                # parallel-list assumption; guard it
                if len(sq.var_conds) != len(sq.var_cond_types):
                    pos_sets = None
                if pos_sets is None:
                    specs.append(((), ()))
                else:
                    specs.append((tuple(sq.var_conds), tuple(pos_sets)))
            if not specs:
                continue
        filter_cols = sorted({
            j for conds, pos_sets in specs for ps in pos_sets for j in ps
        })
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.endswith(".parquet")]
        for f in files:
            items.append({"path": f, "lid": lid})
        spec_by_lid[lid] = (templ, k, specs, filter_cols)

    specs_ref = ray.put(spec_by_lid)
    vdict_ref = ray.put((var_ids, var_values)) if var_ids is not None else None

    out_schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("text", pa.large_string()),
    ])

    def _empty_tbl():
        return pa.table(
            {"conv_id": pa.array([], type=pa.string()),
             "turn_idx": pa.array([], type=pa.int32()),
             "text": pa.array([], type=pa.large_string())}
        )

    def scan_dedicated(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        spec_map = ray.get(specs_ref)
        dids, dvals = ray.get(vdict_ref) if vdict_ref is not None else (None, None)
        out = []
        for path, lid in zip(batch.column("path").to_pylist(),
                             batch.column("lid").to_pylist()):
            templ, k, specs, filter_cols = spec_map[lid]
            all_var_cols = [f"var_{j}" for j in range(k)]
            vt = np.array(
                [_TYPE_CODE[t] for t in template_placeholder_types(templ)],
                dtype=np.int8,
            )
            pf = pq.ParquetFile(path)
            col_index = {}
            if pf.metadata.num_row_groups:
                rg0 = pf.metadata.row_group(0)
                col_index = {rg0.column(i).path_in_schema: i
                             for i in range(rg0.num_columns)}
            for rg in range(pf.metadata.num_row_groups):
                if filter_cols and not _rg_can_match(
                    pf.metadata.row_group(rg), col_index, specs
                ):
                    continue
                t = pf.read_row_group(
                    rg, columns=["conv_id", "turn_idx"]
                    + [f"var_{j}" for j in filter_cols]
                )
                n = len(t)
                if n == 0:
                    continue
                cols = {j: np.asarray(t.column(f"var_{j}"), dtype=np.int64)
                        for j in filter_cols}
                keep = _rows_matching_positions(cols, n, k, specs)
                if not keep.any():
                    continue
                idx = np.flatnonzero(keep)
                # late materialization: remaining var columns only for hits
                if k:
                    full = pf.read_row_group(rg, columns=all_var_cols)
                    mat = np.column_stack([
                        np.asarray(full.column(c), dtype=np.int64)
                        for c in all_var_cols
                    ])[idx]
                else:
                    mat = np.zeros((len(idx), 0), dtype=np.int64)
                nh = len(idx)
                offs = pa.array(np.arange(nh + 1, dtype=np.int32) * k)
                ev = pa.ListArray.from_arrays(offs, pa.array(mat.ravel()))
                vts = pa.ListArray.from_arrays(offs, pa.array(np.tile(vt, nh)))
                templ_arr = pa.array([templ] * nh, type=pa.large_string())
                text = decode_batch(templ_arr, ev, vts,
                                    dict_ids=dids, dict_values=dvals)
                m = pc.match_substring_regex(text, rx)
                hit = pa.table({
                    "conv_id": t.column("conv_id").take(pa.array(idx)),
                    "turn_idx": t.column("turn_idx").take(pa.array(idx)),
                    "text": text,
                }).filter(m)
                if hit.num_rows:
                    out.append(hit)
        if not out:
            return _empty_tbl()
        return pa.concat_tables(out).cast(pa.schema(out[0].schema))

    pieces = []
    if items:
        dds = rd.from_arrow(pa.table({
            "path": pa.array([i["path"] for i in items]),
            "lid": pa.array([i["lid"] for i in items], type=pa.int64()),
        }))
        # one file per block → file-level parallelism for the scanners
        dds = dds.repartition(max(1, len(items)))
        pieces.append(dds.map_batches(scan_dedicated, batch_format="pyarrow"))

    misc = os.path.join(glt_dir, "misc")
    misc_cand = sorted(c for c in cand if c not in dedicated)
    if os.path.isdir(misc) and misc_cand:
        cand_arr = pa.array(np.array(misc_cand, dtype=np.int64))
        # per-lid var_types + template for decode (derived from the template,
        # identical for every row of a logtype)
        types_seqs = [
            np.array([_TYPE_CODE[t]
                      for t in template_placeholder_types(template_of[c])],
                     dtype=np.int8)
            for c in misc_cand
        ]
        type_lens = np.array([len(s) for s in types_seqs], dtype=np.int64)
        type_starts = np.concatenate([[0], np.cumsum(type_lens)])[:-1]
        types_flat = (np.concatenate(types_seqs) if types_seqs
                      else np.zeros(0, dtype=np.int8))
        templates_arr = pa.array([template_of[c] for c in misc_cand],
                                 type=pa.large_string())
        subqueries = cq.subqueries
        match_all = cq.match_all

        def scan_misc(b: pa.Table) -> pa.Table:
            dids, dvals = ray.get(vdict_ref) if vdict_ref is not None else (None, None)
            lt = b.column("logtype_id")
            pos = pc.index_in(lt, cand_arr)
            keep = np.asarray(pc.is_valid(pos), dtype=bool)
            if not match_all:
                m = np.zeros(len(b), dtype=bool)
                for sq in subqueries:
                    s = np.asarray(
                        pc.is_in(lt, value_set=pa.array(sq.logtype_ids)), dtype=bool
                    )
                    if sq.var_conds and s.any():
                        s &= rows_matching_subquery_vars(
                            b.column("encoded_vars"), sq.var_conds
                        )
                    m |= s
                keep &= m
            b = b.filter(pa.array(keep))
            if len(b) == 0:
                return _empty_tbl()
            pos = np.asarray(
                pc.index_in(b.column("logtype_id"), cand_arr), dtype=np.int64
            )
            lens = type_lens[pos]
            offs = np.concatenate([[0], np.cumsum(lens)])
            flat = types_flat[
                np.repeat(type_starts[pos], lens)
                + (np.arange(int(offs[-1])) - np.repeat(offs[:-1], lens))
            ]
            vts = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()), pa.array(flat)
            )
            templ_arr = pc.take(templates_arr, pa.array(pos))
            text = decode_batch(
                templ_arr.cast(pa.large_string()), b.column("encoded_vars"),
                vts, dict_ids=dids, dict_values=dvals,
            )
            m = pc.match_substring_regex(text, rx)
            return pa.table({
                "conv_id": b.column("conv_id").combine_chunks(),
                "turn_idx": b.column("turn_idx").combine_chunks(),
                "text": text,
            }).filter(m)

        mds = rd.read_parquet(
            misc, columns=["conv_id", "turn_idx", "logtype_id", "encoded_vars"],
            file_extensions=["parquet"],
        )
        pieces.append(mds.map_batches(scan_misc, batch_format="pyarrow"))

    if not pieces:
        return _empty()
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out.map_batches(
        lambda t: t.cast(out_schema) if t.num_rows else _empty_tbl(),
        batch_format="pyarrow",
    )
