"""CLP-style search over the routed archive (SURVEY.md §2.11).

Mirrors the clp/clg flow (Grep.cpp:410-628, 900-959) restructured for Ray
Data:

1. **Compile** (driver): the wildcard query (implicitly ``*q*``) is matched
   against the logtype dictionary — placeholders stand for "any variable", so
   each placeholder byte is replaced by ``*`` before matching — producing a
   candidate logtype_id set (possible-logtypes pruning, Grep.cpp:482-495).
2. **Prune** (storage): only sink partitions whose manifest counts say they
   contain candidate logtypes need reading; here we read the encoded columns
   of the routed Parquet with column pruning.
3. **Scan** (vectorized): filter rows by ``logtype_id ∈ candidates`` (cheap
   int isin), then decode only the candidate rows and wildcard re-check the
   full text — CLP's "imprecise subquery → decode and match" fallback
   (Grep.cpp:900-959). Matching uses translated-regex, equivalent to CLP's
   wildcard_match_unsafe (string_utils.cpp, M10).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def wildcard_to_regex(pattern: str, full_match: bool = True) -> str:
    """CLP wildcard (* = any run, ? = any char) → anchored regex.

    '\\' escapes the next character (it becomes a literal, whatever it is —
    the reference silently treats unsupported escapes like ``\\a`` as the bare
    character; string_utils.cpp advance_tame_to_next_match handles '\\\\').
    A dangling trailing '\\' is dropped, mirroring
    clean_up_wildcard_search_string's no-dangling-escape guarantee.
    """
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 < n:
                out.append(re.escape(pattern[i + 1]))
            i += 2
        elif ch == "*":
            out.append("[\\s\\S]*")
            i += 1
        elif ch == "?":
            out.append("[\\s\\S]")
            i += 1
        else:
            out.append(re.escape(ch))
            i += 1
    body = "".join(out)
    return f"^{body}$" if full_match else body


def wildcard_match(texts: pa.Array, pattern: str) -> pa.Array:
    """Vectorized CLP wildcard match (M10)."""
    return pc.match_substring_regex(texts, wildcard_to_regex(pattern))


def candidate_logtype_ids(
    logtype_ids: pa.Array, logtypes: pa.Array, query: str
) -> np.ndarray:
    """Driver-side compile: which logtypes could contain a match.

    Each placeholder byte in the template is treated as '*' (a variable can be
    anything), then the implicit-*query*-wildcard is matched against it.
    """
    templ = logtypes
    for ph in ("\x11", "\x12", "\x13"):
        templ = pc.replace_substring(templ, ph, "*")
    # collapse escape chars: '\' + c → c (escaped literal)
    templ_py = [re.sub(r"\\([\s\S])", r"\1", t) for t in templ.to_pylist()]
    wquery = f"*{query.strip('*')}*" if query.strip("*") else "*"
    rx = re.compile(wildcard_to_regex(wquery))
    # a template-with-*-vars matches the query pattern iff an interleaving
    # exists; conservative candidate test: match query against template where
    # template '*'s absorb anything — implemented by regexifying the template
    # and testing symbolically is overkill; CLP's own approach is wildcard
    # match of query tokens against the logtype. We use: template matches if
    # rx matches template text with '*' treated as matching anything — i.e.
    # test query-regex against template with '*' expanded; to stay
    # conservative (no false negatives), also keep any template containing a
    # '*' adjacent overlap. Simplest sound rule: keep template if the
    # *constant parts of the query* (split on wildcards) appear in order in
    # the template-with-*-vars pattern allowing '*' gaps.
    keep = []
    ids = logtype_ids.to_pylist()
    consts = [c for c in re.split(r"[*?]+", query) if c]
    for i, t in enumerate(templ_py):
        # in-order scan: each query constant must appear in the template text
        # OR be absorbable by a '*' (variable) — absorbable is always possible
        # if a '*' exists between the previous match position and the end.
        pos = 0
        ok = True
        for c in consts:
            j = t.find(c, pos)
            k = t.find("*", pos)
            if j >= 0:
                pos = j + len(c)
            elif k >= 0:
                pos = k  # a variable can absorb this constant (imprecise)
            else:
                ok = False
                break
        if ok:
            keep.append(ids[i])
    return np.array(keep, dtype=np.int64)


def regex_to_wildcard(rx: str) -> str:
    """Translate a simple regex into CLP wildcard syntax (M12).

    Mirrors regex_utils::RegexToWildcardTranslator's supported subset:
    literals, escaped metacharacters, '.', '.*', '.+', and the ^/$ anchors
    (absence of an anchor appends/prepends '*'). Anything else (classes,
    groups, alternation, counted quantifiers) raises ValueError, like the
    reference's error codes.
    """
    out: list[str] = []
    i = 0
    n = len(rx)
    anchored_start = rx.startswith("^")
    if anchored_start:
        i = 1
    anchored_end = rx.endswith("$") and not rx.endswith("\\$")
    end = n - 1 if anchored_end else n
    while i < end:
        c = rx[i]
        if c == "\\":
            if i + 1 >= end:
                raise ValueError("trailing backslash")
            nxt = rx[i + 1]
            if nxt.isalnum():
                raise ValueError(f"unsupported escape sequence \\{nxt}")
            # escaped regex metachar → literal char in wildcard syntax; chars
            # that are wildcard metachars must stay escaped (reference
            # regex_translation_utils.cpp append_char_to_wildcard)
            out.append("\\" + nxt if nxt in "*?\\" else nxt)
            i += 2
        elif c == ".":
            if i + 1 < end and rx[i + 1] == "*":
                out.append("*")
                i += 2
            elif i + 1 < end and rx[i + 1] == "+":
                out.append("?*")
                i += 2
            else:
                out.append("?")
                i += 1
        elif c in "[](){}|+*?^$":
            raise ValueError(f"unsupported regex construct {c!r} at {i}")
        else:
            out.append(c)
            i += 1
    body = "".join(out)
    if not anchored_start:
        body = "*" + body
    if not anchored_end:
        body = body + "*"
    return body


def compile_var_conditions(query: str) -> list[int]:
    """Extract the *precise* typed-variable requirements of a wildcard query.

    Mirrors Grep's query compilation (Grep.cpp:499-628) restricted to the
    precise cases: each wildcard-free variable token inside the query encodes
    to exactly one int64 (int value, packed float, or dict-var content hash) a
    matching message must contain — in order, not necessarily contiguously
    (Query.cpp:150-172). Tokens touching a ``*`` (partial tokens) are
    ambiguous in CLP (cartesian subqueries); here they are simply left
    imprecise — the decode-and-wildcard-verify pass keeps results exact.
    """
    from clp_core_ray import encoding as E

    required: list[int] = []
    segs = query.split("*")
    for si, seg in enumerate(segs):
        if not seg or "?" in seg:
            continue
        logtype, evs, vts, dvs = E.encode_message(seg)
        bounds = list(E.token_bounds(seg))
        for (b, e), ev in zip(bounds, evs):
            partial_left = si > 0 and b == 0
            partial_right = si < len(segs) - 1 and e == len(seg)
            if partial_left or partial_right:
                continue
            required.append(ev)
    return required


def rows_matching_var_subsequence(encoded_vars, required: list[int]) -> np.ndarray:
    """Vectorized in-order (gaps allowed) subsequence test per row."""
    if isinstance(encoded_vars, pa.ChunkedArray):
        encoded_vars = encoded_vars.combine_chunks()
    offsets = np.asarray(encoded_vars.offsets, dtype=np.int64)
    offsets = offsets - offsets[0]
    flat = np.asarray(encoded_vars.flatten(), dtype=np.int64)
    nrows = len(offsets) - 1
    ok = np.ones(nrows, dtype=bool)
    if not required:
        return ok
    BIG = np.iinfo(np.int64).max
    pos = np.zeros(nrows, dtype=np.int64)
    for v in required:
        cand = np.flatnonzero(flat == v)
        rows_of = np.searchsorted(offsets, cand, side="right") - 1
        rel = cand - offsets[rows_of]
        valid = rel >= pos[rows_of]
        best = np.full(nrows, BIG, dtype=np.int64)
        np.minimum.at(best, rows_of[valid], rel[valid])
        ok &= best < BIG
        pos = np.where(best < BIG, best + 1, pos)
    return ok


def _probe_var_dict(vfiles: list, query: str, ignore_case: bool):
    """Distributed variable-dictionary probe: scan the dict with Ray and
    return only entries the query's tokens could select (exact needles +
    wildcard regexes from :func:`grep.dict_probe_patterns`).

    compile_query's dict lookups are selections over (value → var_id), so
    compiling against the probed subset produces identical subqueries while
    driver memory stays bounded by the number of MATCHING entries — not by
    dictionary size, which at 100-TB archives can exceed driver RAM (the
    reference's clg holds dicts in memory, DictionaryReader.hpp:19 role).
    Returns None when the query performs no dict lookups.
    """
    import ray.data as rd

    from clp_core_ray.pipelines.grep import dict_probe_patterns

    exact, regexes = dict_probe_patterns(query, ignore_case)
    if not exact and not regexes:
        return None

    def keep(b: pa.Table) -> pa.Table:
        v = b.column("value").combine_chunks()
        vc = pc.utf8_lower(v) if ignore_case else v
        m = np.zeros(len(b), dtype=bool)
        if exact:
            m |= np.asarray(pc.is_in(vc, value_set=pa.array(exact)), dtype=bool)
        for rx in regexes:
            m |= np.asarray(pc.match_substring_regex(vc, rx), dtype=bool)
        return b.filter(pa.array(m))

    hits = [
        pa.table(b)
        for b in rd.read_parquet(vfiles)
        .map_batches(keep, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not hits:  # no matching entries: empty dict → conds prune to WontMatch
        import pyarrow.parquet as pq

        return pq.read_table(vfiles[0]).slice(0, 0)
    return pa.concat_tables(hits)


def compile_for_archive(archive_dir: str, query: str, ignore_case: bool = False):
    """Load an archive's dictionaries and compile ``query`` against them.

    Shared by row-oriented search (:func:`search_archive`) and the GLT
    column-oriented search (:func:`clp_core_ray.pipelines.glt.glt_search`).
    Returns ``(cq, ldict, var_ids, var_values, var_classes)`` where ``ldict``
    is the logtype dictionary table and ``var_classes`` the per-variable
    segment index column (DictionaryWriter.hpp:179-202), if persisted.
    """
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from clp_core_ray.pipelines.grep import compile_query
    from clp_core_ray.state.dictionaries import logtype_dict

    routed = os.path.join(archive_dir, "routed")
    dict_path = os.path.join(archive_dir, "logtype.dict.parquet")
    if os.path.exists(dict_path):
        ldict = pq.read_table(dict_path)
    else:  # archive without persisted dicts: derive (distributed distinct)
        dict_ds = rd.read_parquet(routed, columns=["logtype_id", "logtype", "n_vars"],
                                   file_extensions=["parquet"])
        ldict = pa.concat_tables(
            pa.table(b)
            for b in logtype_dict(dict_ds).iter_batches(batch_format="pyarrow")
        )

    # variable dictionary (small side) for precise/wildcard dict-token lookup;
    # its `classes` column is the per-variable segment index (dict entry →
    # containing sink partitions, DictionaryWriter.hpp:179-202)
    var_ids = var_values = var_classes = None
    var_dict_path = os.path.join(archive_dir, "var.dict")
    if os.path.isdir(var_dict_path):
        vfiles = [
            os.path.join(var_dict_path, f)
            for f in sorted(os.listdir(var_dict_path)) if f.endswith(".parquet")
        ]
        if vfiles:
            # size-aware: small dicts load directly; a dict too big for the
            # driver is probed distributedly — only entries the query's
            # tokens could select come back (bounded by matches, not dict
            # size), and compile_query sees identical lookups either way
            cap = int(os.environ.get("CLP_VAR_DICT_DRIVER_BYTES", 64 << 20))
            if sum(os.path.getsize(f) for f in vfiles) <= cap:
                vtbl = pa.concat_tables(pq.read_table(f) for f in vfiles)
            else:
                vtbl = _probe_var_dict(vfiles, query, ignore_case)
            if vtbl is not None:
                # sorted by var_id → decode_batch takes its binary-search
                # path instead of a per-batch hash build over the whole dict
                vtbl = vtbl.sort_by("var_id")
                var_ids = np.asarray(vtbl.column("var_id"), dtype=np.int64)
                var_values = vtbl.column("value").combine_chunks()
                if "classes" in vtbl.column_names:
                    var_classes = vtbl.column("classes").combine_chunks()

    cq = compile_query(
        query,
        ldict.column("logtype_id"), ldict.column("logtype").combine_chunks(),
        var_ids=var_ids, var_values=var_values, ignore_case=ignore_case,
    )
    return cq, ldict, var_ids, var_values, var_classes


def subquery_logtype_prune(archive_dir: str, cq, var_ids, var_classes):
    """Per-subquery allowed-logtype sets from the class→logtype index refined
    by the per-variable segment index (DictionaryWriter.hpp:179-202;
    clg.cpp:249-298 segment intersection).

    Returns a list parallel to ``cq.subqueries``: each entry is the set of
    logtype_ids that can possibly host a match for that subquery given which
    sink classes contain BOTH the subquery's logtypes AND every
    dictionary-var condition's entries — or ``None`` when no index exists to
    prune on. A subquery whose intersection is empty gets ``set()`` (it
    cannot match anywhere in this archive).
    """
    import json
    import os

    idx_path = os.path.join(archive_dir, "class_logtypes.json")
    if cq.match_all or not os.path.exists(idx_path):
        return [None] * len(cq.subqueries)
    with open(idx_path) as f:
        by_class = json.load(f)

    def classes_of_cond(cond: np.ndarray):
        if var_classes is None:
            return None
        pos = pc.index_in(pa.array(cond, type=pa.int64()), pa.array(var_ids))
        allowed: set = set()
        for p in pos.to_pylist():
            if p is None:
                return None
            cls_list = var_classes[p].as_py()
            if not cls_list or "" in cls_list:
                return None
            allowed.update(cls_list)
        return allowed

    out = []
    for sq in cq.subqueries:
        sq_lt = set(sq.logtype_ids.tolist())
        sq_classes = {c for c, ids in by_class.items() if sq_lt.intersection(ids)}
        for cond in sq.dict_conds:
            if not sq_classes:
                break
            allowed = classes_of_cond(cond)
            if allowed is not None:
                sq_classes &= allowed
        lt_allowed: set = set()
        for c in sq_classes:
            lt_allowed.update(by_class[c])
        out.append(sq_lt & lt_allowed)
    return out


def _prune_keep_classes(archive_dir: str, cq, var_ids, var_classes):
    """Partition pruning: class→logtype index (J4) refined per subquery by
    the per-variable segment index — a partition can host a subquery match
    only if it contains the subquery's logtypes AND, for every dict-var
    condition, at least one of that condition's dict entries
    (clg.cpp:249-298 segment intersection).

    Returns the sorted list of keep classes, or None when pruning is
    unavailable (match_all query, or no index on disk)."""
    import json
    import os

    idx_path = os.path.join(archive_dir, "class_logtypes.json")
    if cq.match_all or not os.path.exists(idx_path):
        return None
    with open(idx_path) as f:
        by_class = json.load(f)

    def classes_of_cond(cond: np.ndarray) -> set | None:
        """Union of partition classes over the cond's dict ids; None =
        unknown (no index / unindexed entry) → can't prune on it."""
        if var_classes is None:
            return None
        pos = pc.index_in(pa.array(cond, type=pa.int64()), pa.array(var_ids))
        allowed: set = set()
        for p in pos.to_pylist():
            if p is None:
                return None
            cls_list = var_classes[p].as_py()
            if not cls_list or "" in cls_list:
                return None
            allowed.update(cls_list)
        return allowed

    keep_set: set = set()
    for sq in cq.subqueries:
        sq_lt = set(sq.logtype_ids.tolist())
        sq_classes = {c for c, ids in by_class.items()
                      if sq_lt.intersection(ids)}
        for cond in sq.dict_conds:
            if not sq_classes:
                break
            allowed = classes_of_cond(cond)
            if allowed is not None:
                sq_classes &= allowed
        keep_set |= sq_classes
    return sorted(keep_set)


def _class_paths(routed: str, keep):
    """Sink paths for the keep classes; the whole routed dir when keep is
    None (pruning unavailable)."""
    import os

    if keep is None:
        return routed
    return [
        os.path.join(routed, f"logtype_class={c}", f)
        for c in keep
        for f in sorted(os.listdir(os.path.join(routed, f"logtype_class={c}")))
        if f.endswith(".parquet")
    ]


def search_archive(archive_dir: str, query: str, columns=None,
                   ignore_case: bool = False):
    """Search a compressed archive → Dataset[(conv_id, turn_idx, text)].

    Compile (driver): the Grep subquery compiler (pipelines.grep) enumerates
    interpretations of ambiguous tokens against the archive's logtype and
    variable dictionaries — possible-logtype sets plus in-order var
    conditions per subquery (Grep.cpp:499-628). Prune: sink partitions
    are skipped via the class→logtype index (J4). Scan (vectorized): rows
    matching any subquery are decoded and wildcard-verified (the verify
    keeps results exact even where subqueries are imprecise,
    Grep.cpp:900-959). ``ignore_case`` mirrors wildcard_match_unsafe's
    lowercase-both mode (string_utils.hpp:88-94).
    """
    import json
    import os

    import ray.data as rd

    from clp_core_ray.pipelines.grep import rows_matching_subquery_vars
    from clp_core_ray.vec.decoder import decode_batch

    if os.path.basename(os.path.normpath(archive_dir)) == "routed":
        archive_dir = os.path.dirname(os.path.normpath(archive_dir))
    routed = os.path.join(archive_dir, "routed")
    import pyarrow.parquet as pq

    # passthrough columns (e.g. ts for count-by-time over results): carried
    # from the sink rows into the match table. The sink footer is read ONLY
    # when extra columns are requested or a scan will actually run — a
    # dictionary-miss query returns empty without touching sink files, and
    # an archive with an empty routed/ dir yields an empty Dataset (r2
    # ADVICE: it used to raise FileNotFoundError on the footer read).
    extra = [c for c in (columns or [])
             if c not in ("conv_id", "turn_idx", "text")]
    first = _first_parquet_file_or_none(routed)
    sink_schema = None
    if extra:
        sink_schema = (pq.ParquetFile(first).schema_arrow if first
                       else pa.schema([]))
        missing = [c for c in extra if c not in sink_schema.names]
        if missing:
            raise KeyError(f"columns not in archive sinks: {missing}")

    def _empty():
        t = {"conv_id": pa.array([], type=pa.string()),
             "turn_idx": pa.array([], type=pa.int32()),
             "text": pa.array([], type=pa.large_string())}
        for c in extra:
            t[c] = pa.array([], type=sink_schema.field(c).type)
        return rd.from_arrow(pa.table(t))

    if first is None:  # routed/ exists but holds no sink files yet
        return _empty()

    cq, ldict, var_ids, var_values, var_classes = compile_for_archive(
        archive_dir, query, ignore_case
    )

    if not cq.match_all and not cq.subqueries:
        return _empty()
    if sink_schema is None:
        sink_schema = pq.ParquetFile(first).schema_arrow
    cand = cq.all_logtype_ids()

    # partition pruning: class→logtype index (J4) refined per subquery by the
    # per-variable segment index — a partition can host a subquery match only
    # if it contains the subquery's logtypes AND, for every dictionary-var
    # condition, at least one of that condition's dict entries
    # (clg.cpp:249-298 segment intersection)
    keep = _prune_keep_classes(archive_dir, cq, var_ids, var_classes)
    if keep is not None and not keep:
        return _empty()
    paths = _class_paths(routed, keep)

    inline = "dict_vars" in sink_schema.names
    cols = ["conv_id", "turn_idx", "logtype_id", "encoded_vars", "var_types"]
    cols += [c for c in extra if c not in cols]
    if inline:
        cols += ["logtype", "dict_vars"]
    ds = rd.read_parquet(paths, columns=cols, file_extensions=["parquet"])
    rx = wildcard_to_regex(cq.processed)
    if ignore_case:
        rx = "(?i)" + rx
    subqueries = cq.subqueries
    match_all = cq.match_all

    import ray

    if inline:
        dicts_ref = None
    else:
        from clp_core_ray.pipelines.decompress import load_dicts

        dicts_ref = ray.put(load_dicts(archive_dir))

    class Scan:
        """Phase-3 scan: subquery prune → decode candidates → wildcard check.

        Dictionaries resolve lazily per task (zero-copy plasma get): an
        eager get in the driver-side constructor would pickle the full dict
        tables into every task's closure instead of shipping the ref."""

        def __init__(self):
            self._loaded = False

        def _load(self):
            if dicts_ref is not None:
                ldict, vdict = ray.get(dicts_ref)
                self.lt_ids = ldict.column("logtype_id").combine_chunks()
                self.lt_values = ldict.column("logtype").combine_chunks()
                self.var_ids = np.asarray(vdict.column("var_id"), dtype=np.int64)
                self.var_values = vdict.column("value").combine_chunks()
            self._loaded = True

        def __call__(self, batch: pa.Table) -> pa.Table:
            if not self._loaded:
                self._load()
            if not match_all:
                keep = np.zeros(len(batch), dtype=bool)
                lt = batch.column("logtype_id")
                for sq in subqueries:
                    m = np.asarray(
                        pc.is_in(lt, value_set=pa.array(sq.logtype_ids)), dtype=bool
                    )
                    if sq.var_conds and m.any():
                        m &= rows_matching_subquery_vars(
                            batch.column("encoded_vars"), sq.var_conds
                        )
                    keep |= m
                    if keep.all():
                        break
                batch = batch.filter(pa.array(keep))
            if len(batch) == 0:
                t = {"conv_id": pa.array([], type=pa.string()),
                     "turn_idx": pa.array([], type=pa.int32()),
                     "text": pa.array([], type=pa.large_string())}
                for c in extra:
                    t[c] = pa.array([], type=sink_schema.field(c).type)
                return pa.table(t)
            if dicts_ref is None:
                text = decode_batch(
                    batch.column("logtype"), batch.column("encoded_vars"),
                    batch.column("var_types"), dict_vars=batch.column("dict_vars"),
                )
            else:
                pos = pc.index_in(batch.column("logtype_id"), self.lt_ids)
                text = decode_batch(
                    pc.take(self.lt_values, pos),
                    batch.column("encoded_vars"),
                    batch.column("var_types"),
                    dict_ids=self.var_ids,
                    dict_values=self.var_values,
                )
            m = pc.match_substring_regex(text, rx)
            t = {"conv_id": batch.column("conv_id").combine_chunks(),
                 "turn_idx": batch.column("turn_idx").combine_chunks(),
                 "text": text}
            for c in extra:
                t[c] = batch.column(c).combine_chunks()
            return pa.table(t).filter(m)

    # task-based: Scan's state (broadcast dicts) is a cheap zero-copy
    # plasma get per task, while an actor pool costs ~3s spin-up per query
    # in this sandbox — wrong trade for interactive search. batch_size
    # bundles the small per-class sink files into real batches so per-call
    # fixed costs (dict lookup setup, regex launch) amortize.
    return ds.map_batches(Scan(), batch_format="pyarrow", batch_size=32 * 1024)


def search_archive_multi(archive_dir: str, queries: list[str],
                         ignore_case: bool = False):
    """Batched multi-query search: N wildcard queries, ONE archive scan.

    The reference executes one query per clg invocation (clg.cpp main loop);
    at fleet scale the dominant cost of a query batch is re-reading and
    re-decoding the same sink files N times. Here every query compiles
    against the dictionaries on the driver (cheap — dictionaries are small),
    the scan reads the UNION of the queries' pruned partitions once, each
    batch computes every query's candidate mask, and decode — the expensive
    kernel — runs once over the union of candidates; per-query wildcard
    verify then fans the decoded text back out. Returns
    Dataset[(query_idx int64, conv_id, turn_idx, text)]; query_idx is the
    position in ``queries``.
    """
    import os

    import ray
    import ray.data as rd

    from clp_core_ray.pipelines.grep import rows_matching_subquery_vars
    from clp_core_ray.vec.decoder import decode_batch

    if os.path.basename(os.path.normpath(archive_dir)) == "routed":
        archive_dir = os.path.dirname(os.path.normpath(archive_dir))
    routed = os.path.join(archive_dir, "routed")
    import pyarrow.parquet as pq

    def _empty():
        return rd.from_arrow(pa.table({
            "query_idx": pa.array([], type=pa.int64()),
            "conv_id": pa.array([], type=pa.string()),
            "turn_idx": pa.array([], type=pa.int32()),
            "text": pa.array([], type=pa.large_string())}))

    first = _first_parquet_file_or_none(routed)
    if first is None:
        return _empty()

    compiled = []  # (query_idx, cq, regex)
    keeps = []     # per live query: sorted class list or None (no prune)
    for qi, q in enumerate(queries):
        cq, _ldict, var_ids, _var_values, var_classes = compile_for_archive(
            archive_dir, q, ignore_case)
        if not cq.match_all and not cq.subqueries:
            continue  # dictionary miss: this query can't match anything
        rx = wildcard_to_regex(cq.processed)
        if ignore_case:
            rx = "(?i)" + rx
        keep = _prune_keep_classes(archive_dir, cq, var_ids, var_classes)
        if keep is not None and not keep:
            continue  # index-pruned to nothing
        compiled.append((qi, cq, rx))
        keeps.append(keep)
    if not compiled:
        return _empty()

    # union of pruned partitions; one unprunable query forces the full scan
    keep_union = (None if any(k is None for k in keeps)
                  else sorted(set().union(*keeps)))
    paths = _class_paths(routed, keep_union)

    sink_schema = pq.ParquetFile(first).schema_arrow
    inline = "dict_vars" in sink_schema.names
    cols = ["conv_id", "turn_idx", "logtype_id", "encoded_vars", "var_types"]
    if inline:
        cols += ["logtype", "dict_vars"]
    ds = rd.read_parquet(paths, columns=cols, file_extensions=["parquet"])

    if inline:
        dicts_ref = None
    else:
        from clp_core_ray.pipelines.decompress import load_dicts

        dicts_ref = ray.put(load_dicts(archive_dir))

    class MultiScan:
        """All queries' candidate masks per batch; one decode of the union.

        Lazy per-task dictionary resolution — same reasoning as Scan."""

        def __init__(self):
            self._loaded = False

        def _load(self):
            if dicts_ref is not None:
                ldict, vdict = ray.get(dicts_ref)
                self.lt_ids = ldict.column("logtype_id").combine_chunks()
                self.lt_values = ldict.column("logtype").combine_chunks()
                self.var_ids = np.asarray(vdict.column("var_id"),
                                          dtype=np.int64)
                self.var_values = vdict.column("value").combine_chunks()
            self._loaded = True

        def __call__(self, batch: pa.Table) -> pa.Table:
            if not self._loaded:
                self._load()
            n = len(batch)
            lt = batch.column("logtype_id")
            masks = []
            for _qi, cq, _rx in compiled:
                if cq.match_all:
                    masks.append(np.ones(n, dtype=bool))
                    continue
                keep = np.zeros(n, dtype=bool)
                for sq in cq.subqueries:
                    m = np.asarray(
                        pc.is_in(lt, value_set=pa.array(sq.logtype_ids)),
                        dtype=bool)
                    if sq.var_conds and m.any():
                        m &= rows_matching_subquery_vars(
                            batch.column("encoded_vars"), sq.var_conds)
                    keep |= m
                    if keep.all():
                        break
                masks.append(keep)
            union = np.logical_or.reduce(masks) if masks else np.zeros(
                n, dtype=bool)
            if not union.any():
                return pa.table({
                    "query_idx": pa.array([], type=pa.int64()),
                    "conv_id": pa.array([], type=pa.string()),
                    "turn_idx": pa.array([], type=pa.int32()),
                    "text": pa.array([], type=pa.large_string())})
            ub = batch.filter(pa.array(union))
            if dicts_ref is None:
                text = decode_batch(
                    ub.column("logtype"), ub.column("encoded_vars"),
                    ub.column("var_types"), dict_vars=ub.column("dict_vars"))
            else:
                pos = pc.index_in(ub.column("logtype_id"), self.lt_ids)
                text = decode_batch(
                    pc.take(self.lt_values, pos), ub.column("encoded_vars"),
                    ub.column("var_types"), dict_ids=self.var_ids,
                    dict_values=self.var_values)
            conv = ub.column("conv_id").combine_chunks()
            tidx = ub.column("turn_idx").combine_chunks()
            parts = []
            for (qi, _cq, rx), mask in zip(compiled, masks):
                sub = pa.array(mask[union])
                verified = pc.and_(sub, pc.match_substring_regex(text, rx))
                parts.append(pa.table({
                    "query_idx": pa.array(
                        np.full(len(ub), qi, dtype=np.int64)),
                    "conv_id": conv, "turn_idx": tidx,
                    "text": text}).filter(verified))
            return pa.concat_tables(parts)

    return ds.map_batches(MultiScan(), batch_format="pyarrow",
                          batch_size=32 * 1024)


def _first_parquet_file(routed: str):
    p = _first_parquet_file_or_none(routed)
    if p is None:
        raise FileNotFoundError(routed)
    return p


def _first_parquet_file_or_none(routed: str):
    import os

    for root, _, files in os.walk(routed):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return None


# ---------------------------------------------------------------------------
# Multi-archive search (clg's archive iteration): a base dir holds many
# self-contained archives (own dicts + sinks + manifests), the query driver
# selects archives from their manifests by path glob and time range before
# opening any archive data (clg.cpp:132-145 archive selection;
# query_scheduler.py:369-398 metadata filtering), searches each, and unions
# the match Datasets. Archives are visited newest-first (end-timestamp
# descending, query_scheduler.py:389 ordering) so a limit consumer sees
# recent matches first.
# ---------------------------------------------------------------------------


def list_archives(base_dir: str) -> list[dict]:
    """[{dir, ts_min, ts_max, input, tags}] for every archive under
    ``base_dir``.

    An archive is any direct subdirectory with a ``routed/`` sink; its time
    range, input label and tags come from the lineage manifest (the
    per-archive begin/end timestamp + tags CLP's metadata DB rows carry —
    tags are the package-level archive attribute the query scheduler
    filters on).

    When ``base_dir`` carries a global catalog (``_catalog/`` — the
    GlobalSQLiteMetadataDB role, state/catalog.py), discovery reads the
    catalog entries ONLY: no directory scan, no per-archive manifest walk —
    selection stays O(archives-listed) when thousands of archives share the
    base dir, and concurrent compress jobs register lock-free."""
    import os

    from clp_core_ray.state import catalog as cat
    from clp_core_ray.state import manifest as mf

    if cat.has_catalog(base_dir):
        return cat.read_catalog(base_dir)
    out = []
    for name in sorted(os.listdir(base_dir)):
        d = os.path.join(base_dir, name)
        if not os.path.isdir(os.path.join(d, "routed")):
            continue
        info = {"dir": d, "ts_min": None, "ts_max": None, "input": None,
                "tags": set()}
        for m in mf.read_manifests(d):
            info["tags"].update(m.get("tags") or [])
            if m.get("ts_min") is not None:
                info["ts_min"] = (m["ts_min"] if info["ts_min"] is None
                                  else min(info["ts_min"], m["ts_min"]))
            if m.get("ts_max") is not None:
                info["ts_max"] = (m["ts_max"] if info["ts_max"] is None
                                  else max(info["ts_max"], m["ts_max"]))
            info["input"] = info["input"] or m.get("input")
        out.append(info)
    return out


def select_archives(base_dir: str, path_glob: str | None = None,
                    ts_min: int | None = None,
                    ts_max: int | None = None,
                    tags: list | None = None) -> list[str]:
    """Archive dirs matching the path/time/tag predicates, newest-first.

    Conservative: an archive with no recorded time range cannot be pruned by
    time (unknown → keep), mirroring clg's metadata selection semantics.
    ``ts_min``/``ts_max`` are epoch microseconds (the manifest unit).
    ``tags``: keep archives carrying ANY of the given tags (the package
    scheduler's tag-filtered archive selection)."""
    import fnmatch

    keep = []
    for a in list_archives(base_dir):
        if tags and not (set(tags) & a["tags"]):
            continue
        if path_glob and a["input"] and not fnmatch.fnmatch(a["input"], path_glob):
            continue
        if ts_min is not None and a["ts_max"] is not None and a["ts_max"] < ts_min:
            continue
        if ts_max is not None and a["ts_min"] is not None and a["ts_min"] > ts_max:
            continue
        keep.append(a)
    keep.sort(key=lambda a: (a["ts_max"] is not None, a["ts_max"] or 0),
              reverse=True)
    return [a["dir"] for a in keep]


def search_archives(base_dir: str, query: str, ignore_case: bool = False,
                    columns=None, path_glob: str | None = None,
                    ts_min: int | None = None, ts_max: int | None = None,
                    tags: list | None = None):
    """Search every selected archive under ``base_dir`` → one match Dataset.

    Each archive compiles against its OWN dictionaries (per-archive subquery
    compilation, as clg does per archive) and contributes a lazy Dataset;
    the union streams — no per-archive materialization."""
    dirs = select_archives(base_dir, path_glob, ts_min, ts_max, tags=tags)
    if not dirs:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"conv_id": pa.array([], type=pa.string()),
                      "turn_idx": pa.array([], type=pa.int32()),
                      "text": pa.array([], type=pa.large_string())})
        )
    parts = [search_archive(d, query, columns=columns, ignore_case=ignore_case)
             for d in dirs]
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


def search_archives_multi(base_dir: str, queries: list[str],
                          ignore_case: bool = False,
                          path_glob: str | None = None,
                          ts_min: int | None = None,
                          ts_max: int | None = None,
                          tags: list | None = None):
    """Batched multi-query search across every selected archive: each archive
    compiles the whole query batch against its OWN dictionaries and runs one
    scan (see :func:`search_archive_multi`); the per-archive Datasets union
    lazily. Manifest time/path/tag pruning applies before any archive is
    read."""
    dirs = select_archives(base_dir, path_glob, ts_min, ts_max, tags=tags)
    if not dirs:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"query_idx": pa.array([], type=pa.int64()),
                      "conv_id": pa.array([], type=pa.string()),
                      "turn_idx": pa.array([], type=pa.int32()),
                      "text": pa.array([], type=pa.large_string())})
        )
    parts = [search_archive_multi(d, queries, ignore_case=ignore_case)
             for d in dirs]
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


def _archive_passes(archive_dir: str, path_glob: str | None = None,
                    ts_min: int | None = None, ts_max: int | None = None,
                    tags: list | None = None) -> bool:
    """Manifest-based path/time/tag pruning for ONE archive (same
    conservative semantics as :func:`select_archives`: unknown range →
    keep; tag filtering requires an actual tag match)."""
    import fnmatch

    from clp_core_ray.state import manifest as mf

    lo = hi = None
    inp = None
    have_tags: set = set()
    for m in mf.read_manifests(archive_dir):
        if m.get("ts_min") is not None:
            lo = m["ts_min"] if lo is None else min(lo, m["ts_min"])
        if m.get("ts_max") is not None:
            hi = m["ts_max"] if hi is None else max(hi, m["ts_max"])
        inp = inp or m.get("input")
        have_tags.update(m.get("tags") or [])
    if tags and not (set(tags) & have_tags):
        return False
    if path_glob and inp and not fnmatch.fnmatch(inp, path_glob):
        return False
    if ts_min is not None and hi is not None and hi < ts_min:
        return False
    if ts_max is not None and lo is not None and lo > ts_max:
        return False
    return True


def search_fragments(out_dir: str, query: str, ignore_case: bool = False,
                     columns=None, path_glob: str | None = None,
                     ts_min: int | None = None, ts_max: int | None = None,
                     **_ignored):
    """Search the ingest scheduler's fragment archives (pipelines/ingest.py
    sinks: non-compact rows with INLINE logtype/dict_vars, no archive
    dictionaries to compile against).

    Manifest-pruned fragment selection first (select_fragments — the same
    metadata-DB time/path narrowing clg does before opening archives), then
    a column-pruned scan → vectorized inline decode (DecodeStage) →
    wildcard verify. Fragments hold recent arrivals awaiting merge into
    dictionary archives (merge_archives), so the decode-scan cost is
    bounded by the un-compacted tail, not the corpus."""
    import ray.data as rd

    from clp_core_ray.stages.encode import DecodeStage
    from clp_core_ray.state import manifest as mf

    ts_range = None
    if ts_min is not None or ts_max is not None:
        lo = ts_min if ts_min is not None else -(1 << 62)
        hi = ts_max if ts_max is not None else (1 << 62)
        ts_range = (lo, hi)
    frags = mf.select_fragments(out_dir, path_glob=path_glob,
                                ts_range=ts_range)
    extra = [c for c in (columns or [])
             if c not in ("conv_id", "turn_idx", "text")]

    def _empty():
        t = {"conv_id": pa.array([], type=pa.string()),
             "turn_idx": pa.array([], type=pa.int32()),
             "text": pa.array([], type=pa.large_string())}
        for c in extra:
            t[c] = pa.array([])
        return rd.from_arrow(pa.table(t))

    # format dispatch: 'clp' fragments (textlog ingest) are full dictionary
    # archives — route them through the two-phase compiled search; inline
    # fragments (transcript ingest) take the decode-scan below
    archive_parts = [
        search_archive(f["sink"], query, columns=columns,
                       ignore_case=ignore_case)
        for f in frags if f.get("sink") and f.get("format") == "clp"]
    sinks = [f["sink"] for f in frags
             if f.get("sink") and f.get("format") != "clp"]
    if not sinks:
        if archive_parts:
            return (archive_parts[0].union(*archive_parts[1:])
                    if len(archive_parts) > 1 else archive_parts[0])
        return _empty()
    need = ["conv_id", "turn_idx", "logtype", "logtype_id", "encoded_vars",
            "var_types", "dict_vars"] + extra
    ds = rd.read_parquet(sinks, columns=need, file_extensions=["parquet"])
    decode = DecodeStage(out_col="text")
    wq = query if ("*" in query or "?" in query) else f"*{query}*"
    # lowercase-both mode (string_utils.hpp:88-94): lower the QUERY before
    # regex build — lowering the built regex would corrupt [\s\S] classes
    rx = wildcard_to_regex(wq.lower() if ignore_case else wq)
    # two-phase discipline even without dictionaries: the candidate test
    # runs per UNIQUE inline template (placeholders absorb, conservative —
    # verify fixes false positives, never false negatives), so non-matching
    # templates' rows skip decode entirely
    consts = [c for c in re.split(r"[*?]+", wq.lower() if ignore_case
                                  else wq) if c]

    def _candidate_templates(uniq: pa.Array) -> np.ndarray:
        templ = uniq
        for ph in ("\x11", "\x12", "\x13"):
            templ = pc.replace_substring(templ, ph, "*")
        tl = [re.sub(r"\\([\s\S])", r"\1", t) for t in templ.to_pylist()]
        if ignore_case:
            tl = [t.lower() for t in tl]
        cand = np.zeros(len(tl), dtype=bool)
        for i, t in enumerate(tl):
            pos = 0
            ok = True
            for c in consts:
                j = t.find(c, pos)
                k = t.find("*", pos)
                if j >= 0 and (k < 0 or j < k):
                    pos = j + len(c)
                elif k >= 0:
                    break  # a variable absorbs the rest — conservative keep
                else:
                    ok = False
                    break
            cand[i] = ok
        return cand

    def scan(b: pa.Table) -> pa.Table:
        if consts and b.num_rows:
            enc = b.column("logtype").combine_chunks().dictionary_encode()
            cand = _candidate_templates(enc.dictionary)
            if not cand.all():
                b = b.filter(pa.array(
                    cand[np.asarray(enc.indices, dtype=np.int64)]))
        b = decode(b)
        text = b.column("text").combine_chunks()
        if ignore_case:
            hit = pc.match_substring_regex(pc.utf8_lower(text), rx)
        else:
            hit = pc.match_substring_regex(text, rx)
        b = b.filter(hit)
        return b.select(["conv_id", "turn_idx", "text"] + extra)

    out = ds.map_batches(scan, batch_format="pyarrow")
    return out.union(*archive_parts) if archive_parts else out


def _is_fragment_base(target: str) -> bool:
    import os

    return (os.path.isdir(os.path.join(target, "_manifests"))
            and any(n.startswith("fragment=")
                    for n in os.listdir(target)))


def _search_target(target: str, query: str, ignore_case: bool, columns=None,
                   **prune):
    """Dispatch: a dir containing routed/ is one archive; a dir of
    ``fragment=`` sinks + manifests is an ingest-scheduler fragment base;
    otherwise treat it as a base dir of archives. Prune kwargs
    (ts_min/ts_max/path_glob) apply to a single archive too via its
    manifest time range (r2 ADVICE: they were silently dropped)."""
    import os

    import ray.data as rd

    if os.path.isdir(os.path.join(target, "routed")) or \
            os.path.basename(os.path.normpath(target)) == "routed":
        arch = target
        if os.path.basename(os.path.normpath(target)) == "routed":
            arch = os.path.dirname(os.path.normpath(target))
        if prune and not _archive_passes(arch, **prune):
            return rd.from_arrow(
                pa.table({"conv_id": pa.array([], type=pa.string()),
                          "turn_idx": pa.array([], type=pa.int32()),
                          "text": pa.array([], type=pa.large_string())})
            )
        return search_archive(target, query, columns=columns,
                              ignore_case=ignore_case)
    if _is_fragment_base(target):
        return search_fragments(target, query, ignore_case=ignore_case,
                                columns=columns, **prune)
    return search_archives(target, query, ignore_case=ignore_case,
                           columns=columns, **prune)


def search_federated(targets: list[str], query: str,
                     ignore_case: bool = False, columns=None, **prune):
    """One query across MULTIPLE storage tiers — e.g. the ingest
    scheduler's hot fragment base plus the catalog of compacted cold
    archives: each target resolves through the normal dispatcher (archive /
    fragment base / archive base, with its own pruning stack) and the lazy
    Datasets union.

    Consistency note: compaction retires fragments only after its archive
    commits, so steady-state federated results are exact; in the crash
    window between archive commit and full retirement the same rows can
    appear in both tiers (temporarily double-stored, never lost) until a
    compaction re-run finishes retirement."""
    if not targets:
        raise ValueError("search_federated needs at least one target")
    parts = [_search_target(t, query, ignore_case, columns=columns, **prune)
             for t in targets]
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


def search_count(target: str, query: str, ignore_case: bool = False,
                 **prune) -> pa.Table:
    """clg --count: total number of matching messages (reducer CountOperator
    role, reducer/CountOperator.cpp:4-31 — the cross-task merge is a sum of
    per-block partial counts, not a row materialization)."""
    ds = _search_target(target, query, ignore_case, **prune)

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({"cnt": pa.array([len(b)], type=pa.int64())})

    tot = 0
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        tot += sum(pa.table(b).column("cnt").to_pylist())
    return pa.table({"cnt": pa.array([tot], type=pa.int64())})


def search_count_multi(archive_dir: str, queries: list[str],
                       ignore_case: bool = False) -> pa.Table:
    """Per-query match counts for a query batch in ONE scan (clg --count ×N
    without re-reading the archive N times). Queries with no matches —
    including dictionary misses that never reach the scan — report 0.
    Returns pa.Table[(query_idx, cnt)], one row per input query."""
    ds = search_archive_multi(archive_dir, queries, ignore_case=ignore_case)
    got = {}
    for b in (ds.groupby("query_idx").count()
              .iter_batches(batch_format="pyarrow")):
        if "query_idx" not in b.column_names:
            continue
        for qi, c in zip(b.column("query_idx").to_pylist(),
                         b.column("count()").to_pylist()):
            got[int(qi)] = int(c)
    return pa.table({
        "query_idx": pa.array(range(len(queries)), type=pa.int64()),
        "cnt": pa.array([got.get(i, 0) for i in range(len(queries))],
                        type=pa.int64())})


def search_count_by_time(target: str, query: str, granularity: str = "hour",
                         ignore_case: bool = False, ts_col: str = "ts",
                         bucket_ms: int | None = None, **prune):
    """clo count-by-time: matches bucketed by truncated event timestamp
    (OutputHandler.hpp:255-286 bucket = ts/size*size; the reducer merge is
    the groupby shuffle over per-batch partials). ``bucket_ms`` mirrors the
    CLI's arbitrary millisecond bucket; ``granularity`` the calendar units."""
    from clp_core_ray.pipelines.aggregate import add_time_bucket, count_by

    ds = _search_target(target, query, ignore_case, columns=[ts_col], **prune)
    return count_by(
        add_time_bucket(ds, ts_col=ts_col, granularity=granularity,
                        bucket_ms=bucket_ms), "bucket"
    )


def search_context(archive_dir: str, query: str, before: int = 1,
                   after: int = 1, ignore_case: bool = False):
    """Matches plus surrounding conversation turns (grep -B/-A semantics
    applied to CLP search results; the reference's clg prints bare matches —
    clg.cpp:400-460 — so the context radius is this repo's extension for
    conversational logs).

    Two-phase, both sides pruned:
    1. the normal index-pruned search yields the (small) match set;
    2. matched (conv_id, turn_idx±r) keys broadcast via ray.put, and the
       archive is re-read with a conv_id prefilter BEFORE the decode stage —
       unmatched conversations are dropped from the encoded rows, so decode
       cost is O(matched conversations), not O(archive).

    Returns Dataset[(conv_id, turn_idx, text, is_match)].
    """
    import numpy as np
    import ray
    import ray.data as rd

    from clp_core_ray.pipelines.decompress import decompress

    matches = search_archive(archive_dir, query, ignore_case=ignore_case)
    mt = pa.concat_tables(
        [pa.table({"conv_id": pa.array([], pa.string()),
                   "turn_idx": pa.array([], pa.int64())})]
        + [pa.table(b).select(["conv_id", "turn_idx"])
           .cast(pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64())]))
           for b in matches.iter_batches(batch_format="pyarrow")]
    )
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int64()),
                      "text": pa.array([], pa.large_string()),
                      "is_match": pa.array([], pa.bool_())})
    if len(mt) == 0:
        return rd.from_arrow(empty)

    conv = mt.column("conv_id").combine_chunks()
    idx = np.asarray(mt.column("turn_idx"), dtype=np.int64)

    def keys_of(conv_arr: pa.Array, idx_arr: np.ndarray) -> pa.Array:
        return pc.binary_join_element_wise(
            pc.cast(conv_arr, pa.string()),
            pa.array(idx_arr.astype("U"), type=pa.string()), ":",
        )

    # match keys (for the is_match flag) + the ±r expanded context keys
    match_keys = pc.unique(keys_of(conv, idx))
    offs = np.arange(-before, after + 1, dtype=np.int64)
    exp_conv = pa.concat_arrays([conv] * len(offs))
    exp_idx = np.concatenate([idx + o for o in offs])
    ctx_keys = pc.unique(keys_of(exp_conv, exp_idx))
    conv_set = pc.unique(conv)
    side_ref = ray.put((conv_set, ctx_keys, match_keys))

    def conv_prefilter(batch: pa.Table) -> pa.Table:
        cs, _k, _m = ray.get(side_ref)
        return batch.filter(pc.is_in(pc.cast(batch.column("conv_id"),
                                             pa.string()), value_set=cs))

    def ctx_filter(batch: pa.Table) -> pa.Table:
        _cs, keys, mkeys = ray.get(side_ref)
        k = keys_of(batch.column("conv_id").combine_chunks(),
                    np.asarray(batch.column("turn_idx"), dtype=np.int64))
        keep = pc.is_in(k, value_set=keys)
        out = batch.filter(keep)
        k_kept = k.filter(keep) if len(out) else k.slice(0, 0)
        return out.append_column("is_match",
                                 pc.is_in(k_kept, value_set=mkeys))

    return (
        decompress(archive_dir, prefilter=conv_prefilter)
        .map_batches(ctx_filter, batch_format="pyarrow")
    )
