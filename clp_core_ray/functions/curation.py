"""Training-data curation operators: PII redaction, benchmark
decontamination, stratified sampling.

Standard large-scale LLM-data-pipeline stages, expressed Ray-Data-first:

- :func:`redact_pii` — vectorized regex replacement (pyarrow.compute's RE2
  kernels; patterns compiled once per stage construction). Equivalent to a
  chain of DuckDB ``regexp_replace(..., 'g')`` calls (both engines run RE2),
  which is exactly how the oracle checks it.
- :class:`Decontaminator` / :func:`decontaminate` — flag documents containing
  any benchmark word n-gram: the benchmark set's shingle hashes are built
  once and broadcast via ``ray.put`` (never re-shipped per batch); each batch
  intersects its own shingle hashes vectorized. The 100-TB shape: benchmark
  sets are tiny (MBs of hashes) next to the corpus, so this is a broadcast
  semi-join, not a shuffle.
- :func:`stratified_sample` — deterministic per-stratum downsampling by an
  id residue (``id % mod < rate[stratum]``): exact, restartable, and
  SQL-reproducible — no RNG state to coordinate across workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clp_core_ray.functions.text import word_shingle_hashes

#: default PII patterns (RE2 syntax — the same engine in Arrow and DuckDB)
DEFAULT_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[- .]\d{3}[- .]\d{4}\b", "<PHONE>"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CARD>"),
)


def redact_batch(texts: pa.Array,
                 patterns=DEFAULT_PII_PATTERNS) -> pa.Array:
    """Apply each (pattern, replacement) in order — one RE2 pass per rule
    over the whole column."""
    out = texts
    for rx, rep in patterns:
        out = pc.replace_substring_regex(out, rx, rep)
    return out


def redact_pii(ds, text_col: str = "text", out_col: str = "text_redacted",
               patterns=DEFAULT_PII_PATTERNS):
    """Dataset → Dataset with ``out_col`` added (original column kept)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, redact_batch(batch.column(text_col).combine_chunks(),
                                  patterns)
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class Decontaminator:
    """Stateless-task stage: the benchmark n-gram hash set rides a plasma
    ref inside the pickled instance, resolved lazily per task (zero-copy
    numpy view) — the stage fuses with its upstream read instead of paying
    an actor pool's per-block object-store hop."""

    def __init__(self, bench_ref, n: int, text_col: str, flag_col: str):
        self.bench_ref = bench_ref
        self.bench = bench_ref if isinstance(bench_ref, np.ndarray) else None
        self.n = n
        self.text_col = text_col
        self.flag_col = flag_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.bench is None:
            import ray

            self.bench = ray.get(self.bench_ref)
        sh, offs = word_shingle_hashes(
            batch.column(self.text_col).combine_chunks(), k=self.n
        )
        hit = np.isin(sh, self.bench)
        # per-row any() via add.reduceat over the offsets
        n_rows = len(offs) - 1
        flags = np.zeros(n_rows, dtype=bool)
        if len(sh):
            counts = np.diff(offs)
            idx = offs[:-1].clip(0, max(len(sh) - 1, 0))
            red = np.bitwise_or.reduceat(hit, idx)
            flags[counts > 0] = red[counts > 0]
        return batch.append_column(self.flag_col, pa.array(flags))


def benchmark_shingles(bench_texts, n: int = 8) -> np.ndarray:
    """Benchmark texts → sorted unique word-n-gram hash array (the broadcast
    side)."""
    sh, _ = word_shingle_hashes(
        pa.array(list(bench_texts), type=pa.large_string()), k=n
    )
    return np.unique(sh)


def decontaminate(ds, bench_texts, n: int = 8, text_col: str = "text",
                  flag_col: str = "contaminated", drop: bool = False):
    """Flag (or drop) documents sharing any word n-gram with the benchmark
    set. ``bench_texts``: iterable of benchmark strings (small side)."""
    import ray

    ref = ray.put(benchmark_shingles(bench_texts, n))
    out = ds.map_batches(
        Decontaminator(ref, n, text_col, flag_col), batch_format="pyarrow",
    )
    if drop:
        out = out.map_batches(
            lambda b: b.filter(pc.invert(b.column(flag_col)))
            .drop_columns([flag_col]),
            batch_format="pyarrow",
        )
    return out


def pack_sequences(ds, seq_len: int, id_col: str = "doc_id",
                   text_col: str = "text", bucket_size: int = 100_000):
    """Concat-then-chunk sequence packing (GPT-style pretraining prep):
    documents are laid out token-contiguously in ``id_col`` order and cut
    into fixed ``seq_len`` chunks; each doc gets its global ``token_start``
    and the [seq_first, seq_last] chunk range it lands in.

    Distributed global prefix sum in two bounded passes — no driver
    materialization of per-doc data and no full sort:
      1. per-ID-RANGE token sums (``bucket = id // bucket_size``) via one
         small groupby; the driver cumsums the per-bucket totals (#buckets =
         id_space / bucket_size — thousands, not billions);
      2. a bucket-partitioned pass computes the intra-bucket exclusive cumsum
         vectorized and adds the broadcast bucket offset.
    Requires unique non-negative integer ids; ordering is by id (ties
    impossible). SQL-reproducible with one window cumsum, which is how the
    oracle checks it."""
    import ray
    from ray.data.aggregate import Sum

    from clp_core_ray.functions.text import token_counts

    def with_tokens(batch: pa.Table) -> pa.Table:
        n = token_counts(batch.column(text_col).combine_chunks())
        ids = batch.column(id_col).combine_chunks().cast(pa.int64())
        bucket = pc.divide(ids, bucket_size)
        return pa.table({id_col: ids, "n_tokens": n.cast(pa.int64()),
                         "_bucket": bucket})

    toks = ds.map_batches(with_tokens, batch_format="pyarrow").materialize()

    per_bucket = toks.groupby("_bucket").aggregate(
        Sum("n_tokens", alias_name="bucket_tokens")
    ).to_pandas().sort_values("_bucket")
    offsets = {}
    run = 0
    for b, t in zip(per_bucket["_bucket"], per_bucket["bucket_tokens"]):
        offsets[int(b)] = run
        run += int(t)
    off_ref = ray.put(offsets)

    def place(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        n = np.asarray(group.column("n_tokens"), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        start_sorted = np.concatenate([[0], np.cumsum(n[order])[:-1]])
        start = np.empty_like(start_sorted)
        start[order] = start_sorted
        start += off[int(group.column("_bucket")[0].as_py())]
        last = start + np.maximum(n, 1) - 1
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n),
            "token_start": pa.array(start),
            "seq_first": pa.array(start // seq_len),
            "seq_last": pa.array(last // seq_len),
        })

    return toks.groupby("_bucket").map_groups(place, batch_format="pyarrow")


def stratified_sample(ds, key_col: str, rates: dict[str, int],
                      id_col: str = "doc_id", mod: int = 100,
                      default_rate: int = 0):
    """Keep a row iff ``id % mod < rates.get(key, default_rate)`` —
    deterministic per-stratum downsampling (rate units: kept residues out of
    ``mod``). Exact and coordination-free: reruns and retries keep the same
    rows, and the oracle reproduces it in SQL verbatim."""
    keys = pa.array(list(rates.keys()), type=pa.string())
    vals = np.fromiter(rates.values(), dtype=np.int64, count=len(rates))

    def fn(batch: pa.Table) -> pa.Table:
        pos = pc.index_in(batch.column(key_col), keys)
        pos_np = np.asarray(pc.fill_null(pos, -1), dtype=np.int64)
        rate = np.where(pos_np >= 0, vals[pos_np.clip(0, max(len(vals) - 1, 0))],
                        default_rate)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        # fmod keeps the dividend's sign, matching SQL % (numpy % would
        # disagree with the oracle for negative ids)
        return batch.filter(pa.array(np.fmod(ids, mod) < rate))

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_keep_min(ds, id_col: str = "doc_id", text_col: str = "text",
                   num_buckets: int = 64):
    """First-wins exact dedup that KEEPS the row payload: one shuffle by
    content-hash bucket, then a vectorized keep-min-id-per-hash pass inside
    each bucket (lexsort + run boundaries). The 100-TB shape when downstream
    stages still need the text — `exact_dedup_survivors` is the cheaper
    ids-only variant."""
    from clp_core_ray.functions.text import fingerprints

    def tag(batch: pa.Table) -> pa.Table:
        h = fingerprints(batch.column(text_col))
        b = np.asarray(h, dtype=np.int64).view(np.uint64) % np.uint64(num_buckets)
        return batch.append_column("_h", h).append_column(
            "_bucket", pa.array(b.astype(np.int32)))

    def per_bucket(g: pa.Table) -> pa.Table:
        h = np.asarray(g.column("_h"), dtype=np.int64)
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        order = np.lexsort((ids, h))
        first = np.ones(len(h), dtype=bool)
        hs = h[order]
        first[1:] = hs[1:] != hs[:-1]
        keep = pa.array(order[first])
        out = g.take(keep)
        return out.drop_columns(["_h", "_bucket"])

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def curation_pipeline(
    ds,
    bench_texts,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    strat_col: str = "lang",
    min_words: int = 20,
    top_word_max_ratio: int = 5,
    n_gram: int = 8,
    rates: dict | None = None,
    default_rate: int = 10,
):
    """The composed LLM-curation flow, end to end on one streaming Dataset:

      repetition-quality filter → exact dedup (first wins) →
      benchmark decontamination → stratified sampling

    Every stage is a stage documented elsewhere in this module /
    functions/text.py; the composition itself is the point — one shuffle
    total (the dedup bucket groupby), everything else stateless or
    broadcast. The text-keyed filters commute with the text-keyed dedup
    (duplicates share contamination/quality verdicts), so stage order only
    affects cost, not the result set.

    Returns Dataset[(id_col,)] of surviving documents.
    """
    from clp_core_ray.functions.text import repetition_stats

    rates = rates if rates is not None else {"en": 50, "de": 25}

    def qfilter(batch: pa.Table) -> pa.Table:
        stats = repetition_stats(batch.select([id_col, text_col]),
                                 text_col=text_col)
        keep = pc.and_(
            pc.greater_equal(stats.column("n_words"),
                             pa.scalar(min_words, pa.int64())),
            pc.less_equal(
                pc.multiply(stats.column("top_word_cnt"),
                            pa.scalar(top_word_max_ratio, pa.int64())),
                stats.column("n_words"),
            ),
        )
        return batch.filter(keep)

    filtered = ds.map_batches(qfilter, batch_format="pyarrow")
    deduped = dedup_keep_min(filtered, id_col=id_col, text_col=text_col)
    clean = decontaminate(deduped, bench_texts, n=n_gram,
                          text_col=text_col, drop=True)
    sampled = stratified_sample(clean, strat_col, rates, id_col=id_col,
                                default_rate=default_rate)
    return sampled.select_columns([id_col])


def mixture_sample(ds, key_col: str, weights: dict[str, float],
                   id_col: str = "doc_id", mod: int = 100):
    """Domain-mixture sampling: downsample each group so the output matches
    the target proportions ``weights`` while keeping as much data as possible.

    Two phases: a partial-aggregated count_by(key) (the only shuffle, k rows
    out) gives group sizes n_g; the driver solves the tiny LP — output size
    N = min_g(n_g / w_g), per-group keep rate r_g = floor(w_g·N/n_g·mod) —
    and the deterministic id-residue filter (``id % mod < r_g``) applies it
    coordination-free: reruns, retries and resumes keep the same rows.
    Groups absent from ``weights`` are dropped. The achieved mixture is
    exact in expectation (residues are equidistributed for dense ids); the
    selected row SET is exactly reproducible in SQL with the same float64
    expression, which is what the oracle checks.
    """
    from clp_core_ray.pipelines.aggregate import _to_small_table, count_by

    cnt = _to_small_table(count_by(ds.select_columns([key_col]), key_col))
    n = dict(zip(cnt.column(key_col).to_pylist(),
                 cnt.column("cnt").to_pylist()))
    bad = [g for g, w in weights.items() if w <= 0]
    if bad:
        raise ValueError(f"mixture weights must be positive: {bad}")
    present = {g: w for g, w in weights.items() if n.get(g)}
    if not present:
        # empty result, schema preserved — no per-row Python filter
        return ds.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")
    cap = min(n[g] / w for g, w in present.items())
    rates = {g: int(np.floor(w * cap / n[g] * mod))
             for g, w in present.items()}

    keys = pa.array(list(rates.keys()), type=pa.string())
    vals = np.fromiter(rates.values(), dtype=np.int64, count=len(rates))

    def fn(batch: pa.Table) -> pa.Table:
        pos = pc.index_in(batch.column(key_col), keys)
        pos_np = np.asarray(pc.fill_null(pos, -1), dtype=np.int64)
        rate = np.where(pos_np >= 0,
                        vals[pos_np.clip(0, max(len(vals) - 1, 0))], 0)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        # fmod keeps the dividend's sign, matching SQL % for negative ids
        return batch.filter(pa.array(np.fmod(ids, mod) < rate))

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Snapshot diff (incremental corpus delta)
# --------------------------------------------------------------------------


def content_hash64(texts: pa.Array) -> pa.Array:
    """Exact 64-bit FNV-1a over the raw text bytes (no normalization —
    any byte change is a change)."""
    from clp_core_ray.vec.tokenizer import _fnv1a64_tokens, _string_buffers

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    arr = pc.fill_null(arr, "")
    offsets, data = _string_buffers(arr)
    return pa.array(
        _fnv1a64_tokens(data, offsets[:-1], np.diff(offsets)).view(np.int64))


def snapshot_diff(old_ds, new_ds, id_col: str = "doc_id",
                  content_col: str = "text", num_buckets: int = 64,
                  precomputed_hash: bool = False):
    """Delta between two corpus snapshots → Dataset[(id, status)] with status
    in {'added','removed','changed'}; unchanged ids produce no row.

    The incremental-pipeline primitive: re-running a 100-TB curation job
    should touch only the delta. Each side projects per batch to
    (id, content_hash, side) — a ~20 B/row exchange regardless of document
    size — then ONE id-bucket groupby resolves both anti-joins and the
    inner hash-compare per id in a single vectorized lexsort pass (ids are
    unique per side, so every id-run has ≤ 2 rows; no row loop, no second
    shuffle).

    Ids may be int or string (strings bucket by 64-bit hash but resolve by
    exact value via dictionary codes — collisions cannot corrupt statuses).
    ``precomputed_hash=True`` treats ``content_col`` as an int64 content
    hash already computed upstream (e.g. conversation-level rollups)."""
    from clp_core_ray.pipelines.temporal import _key_and_bucket

    def project(side: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column(id_col).combine_chunks()
            if precomputed_hash:
                h = b.column(content_col).combine_chunks().cast(pa.int64())
            else:
                h = content_hash64(b.column(content_col))
            _, bucket = _key_and_bucket(ids, num_buckets)
            return pa.table({
                id_col: ids,
                "_h": h,
                "_side": pa.array(np.full(len(b), side, dtype=np.int8)),
                "_bucket": bucket,
            })
        return fn

    tagged = (old_ds.map_batches(project(0), batch_format="pyarrow")
              .union(new_ds.map_batches(project(1), batch_format="pyarrow")))

    def resolve(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out_schema = pa.schema([(id_col, t.schema.field(id_col).type),
                                ("status", pa.large_string())])
        if n == 0:
            return out_schema.empty_table()
        id_arr = t.column(id_col).combine_chunks()
        if pa.types.is_string(id_arr.type) or pa.types.is_large_string(id_arr.type):
            # exact identity via dictionary codes (hash only places buckets)
            ids = np.asarray(id_arr.dictionary_encode().indices, dtype=np.int64)
        else:
            ids = np.asarray(pc.cast(id_arr, pa.int64()))
        side = np.asarray(t.column("_side").combine_chunks())
        h = np.asarray(t.column("_h").combine_chunks())
        perm = np.lexsort((side, ids))
        ids_s, side_s, h_s = ids[perm], side[perm], h[perm]
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, n))
        # singleton runs: present on one side only
        solo = starts[lens == 1]
        added = solo[side_s[solo] == 1]
        removed = solo[side_s[solo] == 0]
        # paired runs (old then new after the lexsort): changed iff hash differs
        both = starts[lens == 2]
        changed = both[h_s[both] != h_s[both + 1]]
        out_idx = np.concatenate([added, removed, changed])
        labels = np.concatenate([
            np.full(len(added), 0, dtype=np.int8),
            np.full(len(removed), 1, dtype=np.int8),
            np.full(len(changed), 2, dtype=np.int8),
        ])
        names = pa.array(["added", "removed", "changed"], type=pa.large_string())
        orig = t.column(id_col).combine_chunks().take(
            pa.array(perm[out_idx], type=pa.int64()))
        return pa.table({id_col: orig,
                         "status": names.take(pa.array(labels, type=pa.int8()))})

    return (tagged.groupby("_bucket")
            .map_groups(resolve, batch_format="pyarrow"))


def hash_split(ds, key_col: str, fractions: dict[str, float],
               mod: int = 4294967296):
    """Deterministic, group-stable train/val/test split: every row whose
    ``key_col`` hashes into the same residue band lands in the same split,
    so multi-row groups (all turns of a conversation, all chunks of a
    document) never straddle the boundary — the leakage-safe way to split
    training corpora. Stateless per batch (one multiplicative hash + one
    searchsorted), zero coordination, identical assignment on any re-run,
    retry, or repartitioning.

    ``fractions`` maps split name → fraction; they must sum to ~1. Returns
    the input with a ``split`` column appended. Keys hash with Knuth's
    multiplicative scheme (h = key * 2654435761 mod 2^32 — same as the
    sampling ops, SQL-reproducible); band edges are ``floor(cumfrac *
    mod)``, so fractions are exact in expectation for dense ids.
    """
    names = list(fractions)
    fracs = np.array([fractions[n] for n in names], dtype=np.float64)
    if not np.isclose(fracs.sum(), 1.0, atol=1e-6):
        raise ValueError(f"fractions sum to {fracs.sum()}, want 1.0")
    edges = np.floor(np.cumsum(fracs)[:-1] * mod).astype(np.int64)
    names_arr = pa.array(names, type=pa.string())

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("split",
                                       pa.array([], type=pa.string()))
        keys = batch.column(key_col).combine_chunks()
        if pa.types.is_integer(keys.type):
            h = (np.asarray(keys, dtype=np.int64) * 2654435761) % mod
        else:
            hv = np.asarray(content_hash64(pc.cast(keys, pa.large_string())),
                            dtype=np.int64)
            h = (hv % mod + mod) % mod
        band = np.searchsorted(edges, h, side="right")
        return batch.append_column(
            "split", pc.take(names_arr, pa.array(band, type=pa.int64())))

    return ds.map_batches(assign, batch_format="pyarrow")


def chunk_documents(ds, chunk_words: int = 32, overlap: int = 8,
                    id_col: str = "doc_id", text_col: str = "text"):
    """RAG-style document chunking: split each document's whitespace tokens
    into windows of ``chunk_words`` words advancing by ``chunk_words -
    overlap`` (so consecutive chunks share ``overlap`` words), emitting
    ``(id, chunk_idx, word_start, n_words, chunk_text)`` rows.

    Chunk count per doc is ``1`` when ``n <= chunk_words`` else
    ``ceil((n - chunk_words) / stride) + 1`` — the last chunk may be shorter
    and always ends at the document's final word, never past it.

    Fully streaming flat-map — one task per block, no shuffle, no state:
    each batch splits its texts once (Arrow ``split_pattern_regex``), then
    all chunk boundaries and the overlapped word gather are computed with
    numpy offset arithmetic on the FLAT word buffer (one ``take`` + one
    ``binary_join`` re-materializes every chunk string); no per-document
    Python loop. At 100 TB this is the canonical embarrassingly-parallel
    shape: output size ~ input x (1 + overlap/stride).
    """
    if not (0 <= overlap < chunk_words):
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().cast(pa.int64())
        words = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                batch.column(text_col).cast(pa.large_string())),
            r"\s+").combine_chunks()
        flat = words.flatten()
        offs = np.asarray(words.offsets, dtype=np.int64)
        doc_off, n = offs[:-1], np.diff(offs)
        # chunks per doc; every doc (even empty-text -> [""]) gets >= 1
        n_chunks = np.where(n <= chunk_words, 1,
                            (n - chunk_words + stride - 1) // stride + 1)
        doc_of_chunk = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
        starts0 = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        chunk_idx = np.arange(int(n_chunks.sum()), dtype=np.int64) \
            - starts0[doc_of_chunk]
        word_start = chunk_idx * stride
        cnt = np.minimum(word_start + chunk_words, n[doc_of_chunk]) \
            - word_start
        # gather the (overlapping) word indices for every chunk in one shot
        tot = int(cnt.sum())
        first = doc_off[doc_of_chunk] + word_start
        starts_rep = np.repeat(first, cnt)
        within = np.arange(tot, dtype=np.int64) \
            - np.repeat(np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        gathered = pc.take(flat, pa.array(starts_rep + within))
        lst = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(cnt)]), type=pa.int64()),
            gathered)
        return pa.table({
            id_col: pc.take(ids, pa.array(doc_of_chunk)),
            "chunk_idx": pa.array(chunk_idx),
            "word_start": pa.array(word_start),
            "n_words": pa.array(cnt),
            "chunk_text": pc.binary_join(
                lst, pa.scalar(" ", type=pa.large_string())),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


def length_bucket_batches(ds, batch_rows: int, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Padding-efficient training batch assignment: order documents by
    token count (ties by id) and cut the order into fixed ``batch_rows``
    batches, so each batch pads to its own near-uniform max length instead
    of the corpus max — the standard length-bucketing step before batched
    tokenization/inference.

    No global sort: the global ordinal comes from
    :func:`~clp_core_ray.pipelines.aggregate.global_window`'s value-range
    bucket machinery (per-batch partial counts -> driver cumsum of #buckets
    rows -> one in-bucket lexsort) — its ROW_NUMBER already breaks value
    ties by ascending row id, which is SQL's ``ORDER BY n_tokens, id``
    exactly. Returns ``(id, batch_id)``.
    """
    from clp_core_ray.functions.text import token_counts
    from clp_core_ray.pipelines.aggregate import global_window

    def keyed(batch: pa.Table) -> pa.Table:
        n = token_counts(batch.column(text_col).combine_chunks())
        return pa.table({
            id_col: batch.column(id_col).combine_chunks().cast(pa.int64()),
            "n_tokens": n})

    ranked = global_window(
        ds.map_batches(keyed, batch_format="pyarrow"),
        val_col="n_tokens", row_id_col=id_col, funcs=("row_number",))

    def to_batches(batch: pa.Table) -> pa.Table:
        rn = np.asarray(batch.column("rn"), dtype=np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "batch_id": pa.array((rn - 1) // batch_rows),
        })

    return ranked.map_batches(to_batches, batch_format="pyarrow")


def cap_per_group(ds, *, key_col: str, n: int, order_col: str,
                  tiebreak_col: str | None = None,
                  descending: bool = False):
    """Per-group quota cap: keep at most ``n`` rows per key, chosen in
    ``order_col`` order — the web-curation "at most N documents per
    domain/source" rule (domain frequency capping; keeps one hot domain
    from dominating the training mixture the way raw frequency would).

    SQL: ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY order_col
    [, tiebreak]) <= n``. Thin policy wrapper over ``grouped_topk``'s
    bounded two-pass kernel: each batch pre-prunes to ≤ n rows per key
    before the exchange, so the shuffle carries at most n × (keys per
    batch) rows regardless of how skewed the hot domain is."""
    from clp_core_ray.pipelines.temporal import grouped_topk

    return grouped_topk(ds, key_col=key_col, order_col=order_col, k=n,
                        tiebreak_col=tiebreak_col or order_col,
                        descending=descending)


def quantile_gate(ds, *, key_col: str, val_col: str, q: float = 0.5,
                  keep: str = "above"):
    """Keep rows whose value clears their group's q-quantile — the
    "top half by quality score per language" gate curation pipelines run
    after scoring (per-group thresholding adapts the cut to each domain's
    score distribution instead of one global knob).

    The thresholds come from ``grouped_quantile_disc``'s value-histogram
    exchange (#keys × 1 rows), broadcast once via the plasma store; the
    gate itself is a shuffle-free vectorized filter. ``keep``: "above"
    (strictly greater — drops the median itself) or "at_or_above".
    """
    import ray

    from clp_core_ray.pipelines.temporal import grouped_quantile_disc

    thr = _collect_small(grouped_quantile_disc(
        ds, key_col=key_col, val_col=val_col, qs=(q,)))
    thr = pa.table({key_col: thr.column(key_col),
                    "_thr": thr.column(val_col).combine_chunks()
                    .cast(pa.float64())})
    ref = ray.put(thr)

    def gate(b: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        idx = pc.index_in(b.column(key_col).combine_chunks(),
                          lk.column(key_col).combine_chunks())
        t = lk.column("_thr").take(idx)
        v = b.column(val_col).combine_chunks().cast(pa.float64())
        mask = pc.greater(v, t) if keep == "above" \
            else pc.greater_equal(v, t)
        return b.filter(pc.fill_null(mask, False))

    return ds.map_batches(gate, batch_format="pyarrow")


def _collect_small(ds) -> pa.Table:
    """Materialize a small (driver-safe) Dataset to one Arrow table."""
    import ray

    blocks = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(blocks)


def fuzzy_decontaminate(ds, bench_texts, threshold: float = 0.5,
                        k_shingle: int = 3, id_col: str = "doc_id",
                        text_col: str = "text", drop: bool = False):
    """Fuzzy benchmark decontamination: flag (or drop) corpus documents
    whose MinHash-estimated Jaccard against ANY benchmark document reaches
    ``threshold`` — the near-duplicate complement of :func:`decontaminate`'s
    exact n-gram membership test (a paraphrased or lightly-edited benchmark
    leak has no exact 8-gram in common but a high shingle Jaccard).

    The 100-TB shape is a broadcast, not a shuffle: benchmark sets are tiny
    next to the corpus, so the bench signatures + an LSH band-key index are
    built once driver-side and ``ray.put`` ONCE; each corpus batch then
    minhashes itself, probes the band index with two searchsorteds, and
    verifies only the colliding (doc, bench) candidates by signature
    agreement — vectorized, zero per-doc Python, no all-pairs. Recall
    follows the 16x4 LSH curve (≳0.5 Jaccard caught reliably), same as
    :func:`~clp_core_ray.functions.dedup.minhash_lsh_pairs`.
    """
    import ray

    from clp_core_ray.functions.dedup import (band_hashes,
                                              minhash_signatures)

    MIX = np.uint64(0x9E3779B97F4A7C15)

    bench_sig = minhash_signatures(
        pa.array(list(bench_texts), type=pa.large_string()), k_shingle)
    bh = band_hashes(bench_sig).view(np.uint64)          # (n_bench, N_BANDS)
    bands = np.arange(bh.shape[1], dtype=np.uint64)
    with np.errstate(over="ignore"):
        keys = (bh ^ (bands[None, :] * MIX)).reshape(-1)
    bench_row = np.repeat(np.arange(len(bench_sig), dtype=np.int64),
                          bh.shape[1])
    order = np.argsort(keys)
    idx_ref = ray.put((keys[order], bench_row[order], bench_sig))

    def probe(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().cast(pa.int64())
        n = len(batch)
        if n == 0:
            flagged = pa.array([], type=pa.bool_())
            out = batch.append_column("contaminated", flagged)
            return out.filter(pc.invert(flagged)) \
                .drop_columns(["contaminated"]) if drop else out
        skeys, srow, ssig = ray.get(idx_ref)
        sig = minhash_signatures(batch.column(text_col), k_shingle)
        dbh = band_hashes(sig).view(np.uint64)
        with np.errstate(over="ignore"):
            dkeys = (dbh ^ (np.arange(dbh.shape[1], dtype=np.uint64)[None, :]
                            * MIX)).reshape(-1)
        lo = np.searchsorted(skeys, dkeys, side="left")
        hi = np.searchsorted(skeys, dkeys, side="right")
        cnt = hi - lo
        hit = np.flatnonzero(cnt)
        flags = np.zeros(n, dtype=bool)
        if len(hit):
            # candidate (doc, bench) pairs from the collision ranges
            doc_of = np.repeat(hit // dbh.shape[1], cnt[hit])
            within = (np.arange(int(cnt[hit].sum()), dtype=np.int64)
                      - np.repeat(np.concatenate(
                          [[0], np.cumsum(cnt[hit])[:-1]]), cnt[hit]))
            bidx = srow[np.repeat(lo[hit], cnt[hit]) + within]
            est = (sig[doc_of] == ssig[bidx]).mean(axis=1)
            np.maximum.at(flags, doc_of, est >= threshold)
        flagged = pa.array(flags)
        if drop:
            return batch.filter(pc.invert(flagged))
        return batch.append_column("contaminated", flagged)

    return ds.map_batches(probe, batch_format="pyarrow")


def weighted_sample(ds, *, id_col: str, weight_col: str,
                    max_weight: float):
    """Deterministic importance sampling: keep each row with probability
    ``weight / max_weight`` — the quality-weighted downsampling step a
    curation mixture applies after scoring (higher-quality rows survive
    proportionally more often).

    No RNG state: the coin is the row's Knuth multiplicative hash mapped
    to [0, 1), so the decision is stateless per batch, identical under
    re-run / retry / repartition (the hash_split / mixture_sample
    discipline), and SQL-reproducible. Shuffle-free."""
    import numpy as np

    def gate(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col).combine_chunks().cast(pa.int64()),
                         dtype=np.int64)
        h = (ids * np.int64(2654435761)) % np.int64(4294967296)
        w = np.asarray(b.column(weight_col).combine_chunks()
                       .cast(pa.float64()), dtype=np.float64)
        keep = h < np.floor(w / max_weight * 4294967296.0)
        return b.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow")


def span_corrupt(ds, *, id_col: str = "doc_id", text_col: str = "text",
                 span_len: int = 3, gap_len: int = 11,
                 input_col: str = "input", target_col: str = "target"):
    """T5-style span-corruption example generation (Raffel et al. 2020
    semantics, deterministic variant): mask pseudo-random token spans with
    ``<extra_id_k>`` sentinels; the target is the sentinel-delimited
    sequence of masked spans. Denoising pairs are INVERTIBLE — splicing
    target spans back over the sentinels reproduces the original token
    stream (pytest-pinned) — and fully deterministic per doc id, so any
    re-run or retried task emits identical examples (no RNG state).

    Span placement uses a fixed (span_len + gap_len) grid with a per-cell
    splitmix coin keyed on (doc_id, cell): spans never overlap BY
    CONSTRUCTION, which keeps the whole transform vectorized — flatten the
    corpus token stream once (split → list offsets), compute every mask
    bit with array arithmetic, and rebuild both strings with run-offset
    binary_join. ~15% of tokens mask at the defaults.
    """

    stride = span_len + gap_len

    def corrupt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: b.column(id_col),
                             input_col: pa.array([], type=pa.string()),
                             target_col: pa.array([], type=pa.string())})
        ids = np.asarray(b.column(id_col).combine_chunks().cast(pa.int64()),
                         dtype=np.int64)
        toks = pc.split_pattern(
            pc.fill_null(b.column(text_col).combine_chunks(), ""), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        flat = toks.values
        n = len(flat)
        counts = np.diff(offsets)
        parent = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        pos = np.arange(n, dtype=np.int64) - offsets[:-1][parent]
        cell, incell = pos // stride, pos % stride
        # per-(doc, cell) deterministic coin: mask the cell's first span_len
        # tokens when the mixed hash lands in the low 40% of the range
        x = (ids[parent].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ^ (cell.astype(np.uint64) + np.uint64(1))
             * np.uint64(0xBF58476D1CE4E5B9))
        x ^= x >> np.uint64(31)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(29)
        coin = (x % np.uint64(10)) < np.uint64(4)
        masked = coin & (incell < span_len)
        start = masked & (incell == 0)
        # sentinel ordinal k = 0-based rank of the span within its doc
        cs = np.cumsum(start)
        base = np.zeros(len(ids), dtype=np.int64)
        nz = offsets[:-1] > 0
        base[nz] = cs[offsets[:-1][nz] - 1]
        sent = np.where(start, cs - base[parent] - 1, 0).astype(np.int64)
        sent_str = pa.array(
            np.char.add(np.char.add("<extra_id_",
                                    (sent).astype("U4")), ">"))
        # ---- input: sentinel at span starts, masked non-starts dropped
        tok_in = pc.if_else(pa.array(start), sent_str, flat)
        keep_in = ~masked | start
        in_counts = np.add.reduceat(np.r_[keep_in, False].astype(np.int64),
                                    offsets[:-1])
        in_off = pa.array(np.r_[0, np.cumsum(in_counts)].astype(np.int32))
        kept = tok_in.filter(pa.array(keep_in))
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        in_lists = pa.ListArray.from_arrays(in_off, kept)
        inputs = pc.binary_join(in_lists, " ")
        # ---- target: sentinel before each span + the masked tokens
        # expand: span-start tokens emit (sentinel, token); other masked
        # tokens emit (token)
        rep = np.where(masked, np.where(start, 2, 1), 0)
        tgt_parent = np.repeat(parent, rep)
        order = np.repeat(np.arange(n, dtype=np.int64), rep)
        first_slot = np.r_[0, np.cumsum(rep)][:-1]
        is_sent_slot = np.zeros(int(rep.sum()), dtype=bool)
        is_sent_slot[first_slot[start & masked]] = True
        tgt_tok = pc.if_else(pa.array(is_sent_slot),
                             pc.take(sent_str, pa.array(order)),
                             pc.take(flat, pa.array(order)))
        tgt_counts = np.bincount(tgt_parent, minlength=len(ids)) \
            if len(tgt_parent) else np.zeros(len(ids), dtype=np.int64)
        tgt_off = pa.array(np.r_[0, np.cumsum(tgt_counts)].astype(np.int32))
        if isinstance(tgt_tok, pa.ChunkedArray):
            tgt_tok = tgt_tok.combine_chunks()
        tgt_lists = pa.ListArray.from_arrays(tgt_off, tgt_tok)
        targets = pc.binary_join(tgt_lists, " ")
        return pa.table({id_col: b.column(id_col),
                         input_col: inputs, target_col: targets})

    return ds.map_batches(corrupt, batch_format="pyarrow")
