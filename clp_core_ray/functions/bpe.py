"""Distributed byte-level BPE: tokenizer training + corpus encoding.

The real tokenizer-training step a 100 TB pretraining pipeline runs (the
frequency vocab in :func:`clp_core_ray.functions.text.build_vocab` is the
rank table; THIS learns merges). Semantics are the published family:
Sennrich et al. 2016 merges over a word-frequency table, with the
byte-level base alphabet of Radford et al. 2019 (GPT-2) so every string —
any Unicode, any whitespace run — encodes and round-trips losslessly.

Scale shape:
  1. ``train_bpe``: the corpus contributes ONLY a (pretoken, count) table —
     the same bounded three-stage exchange as ``build_vocab`` (per-batch
     partials, term-hash-bucket sums, one driver collect). The collected
     word table is vocabulary-sized (Heaps' law: millions of rows at
     100 TB), never the token stream.
  2. The merge loop runs on the driver over that table, but VECTORIZED:
     symbols live in one flat int32 buffer; each round counts adjacent
     pairs with one np.unique + weighted bincount and rewrites the buffer
     with a run-parity mask (exact leftmost-first non-overlapping merge,
     including the aaa/(a,a) case). O(n_merges × vocab_bytes), independent
     of corpus size.
  3. ``bpe_encode``: the model rides a plasma ref inside stateless task
     instances (the Decontaminator idiom — fuses with the upstream read);
     each batch pretokenizes vectorized, encodes each DISTINCT pretoken
     once through a process-global cache, and scatters ids back with one
     take.

The pretokenizer is defined on UTF-8 BYTES (single pass, fully
vectorized): runs of letters (ASCII letters + all non-ASCII bytes), digit
runs, and other-punctuation runs, each absorbing at most one preceding
space; in a k>1 space run the first k-1 spaces form their own token and
the last merges forward (GPT-2's convention). Pretokens concatenate back
to the exact original bytes — the losslessness the round-trip test pins.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clp_core_ray.vec.tokenizer import _fnv1a64_tokens, _string_buffers

# byte classes for the pretokenizer
_CLS_OTHER, _CLS_SPACE, _CLS_DIGIT, _CLS_LETTER = 0, 1, 2, 3

_BYTE_CLASS = np.zeros(256, dtype=np.int8)
_BYTE_CLASS[0x20] = _CLS_SPACE
_BYTE_CLASS[0x30:0x3A] = _CLS_DIGIT
_BYTE_CLASS[0x41:0x5B] = _CLS_LETTER
_BYTE_CLASS[0x61:0x7B] = _CLS_LETTER
_BYTE_CLASS[0x80:] = _CLS_LETTER  # UTF-8 continuation/lead bytes ride with letters


def pretokenize_buffers(offsets: np.ndarray, data: np.ndarray):
    """(doc offsets, byte buffer) → (token byte-offsets, token→doc index).

    Token start rules (vectorized over the whole batch buffer):
      * every doc start is a token start;
      * a class change starts a token, EXCEPT space→non-space (the single
        space merges forward into the next token);
      * inside a multi-space run, the LAST space starts a token when a
        non-space follows in the same doc (so " a" keeps its prefix space
        while "   a" yields "  " + " a").
    Concatenating the tokens of a doc reproduces its bytes exactly.
    """
    n = len(data)
    ndocs = len(offsets) - 1
    if n == 0:
        return np.zeros(1, dtype=np.int64), np.zeros(0, dtype=np.int64)
    cls = _BYTE_CLASS[data]
    start = np.zeros(n, dtype=bool)
    start[0] = True
    prev, cur = cls[:-1], cls[1:]
    change = prev != cur
    space_merge = (prev == _CLS_SPACE) & (cur != _CLS_SPACE)
    start[1:] |= change & ~space_merge
    # last space of a multi-space run followed (same doc) by non-space
    if n >= 3:
        tail = np.zeros(n, dtype=bool)
        tail[1:-1] = ((cls[1:-1] == _CLS_SPACE) & (cls[:-2] == _CLS_SPACE)
                      & (cls[2:] != _CLS_SPACE))
        start |= tail
    doc_starts = offsets[:-1][np.diff(offsets) > 0]
    # the "tail" rule must not fire when the following byte opens a new doc
    # (the space run simply ends with its doc; a start at the last space
    # would split a doc-final run): positions whose NEXT byte is a doc
    # start keep only the plain class-change rules.
    if len(doc_starts):
        before_doc = doc_starts[doc_starts > 0] - 1
        plain = np.zeros(len(before_doc), dtype=bool)
        pb = before_doc[before_doc > 0]
        if len(pb):
            pv, cu = cls[pb - 1], cls[pb]
            plain[before_doc > 0] = (pv != cu) & ~(
                (pv == _CLS_SPACE) & (cu != _CLS_SPACE))
        plain[before_doc == 0] = True
        start[before_doc] = plain
    # doc boundaries always start a token (LAST: a doc start may itself be
    # another doc's before_doc when a 1-byte doc sits between them)
    start[doc_starts] = True
    tok_off = np.append(np.flatnonzero(start), n).astype(np.int64)
    tok_doc = np.searchsorted(offsets, tok_off[:-1], side="right") - 1
    return tok_off, tok_doc


def _tokens_as_binary(tok_off: np.ndarray, data: np.ndarray) -> pa.Array:
    """Token slices → large_binary array (buffers shared, no per-token copy)."""
    return pa.Array.from_buffers(
        pa.large_binary(), len(tok_off) - 1,
        [None, pa.py_buffer(tok_off), pa.py_buffer(data)])


def _binary_buffers(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets, data) from a binary/large_binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    lo, hi = offsets[0], offsets[-1]
    return offsets - lo, data[lo:hi]


@dataclass
class BpeModel:
    """Learned merges. id space: 0..255 = raw bytes, 256+i = merges[i]."""

    merges: np.ndarray  # (M, 2) int32 pairs of symbol ids, rank order
    fingerprint: str = ""
    _ranks: dict = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        if not self.fingerprint:
            self.fingerprint = "%016x" % int(
                _fnv1a64_tokens(
                    np.ascontiguousarray(
                        self.merges, dtype=np.int32).view(np.uint8).ravel(),
                    np.array([0], dtype=np.int64),
                    np.array([self.merges.size * 4], dtype=np.int64))[0])

    @property
    def ranks(self) -> dict:
        if self._ranks is None:
            self._ranks = {(int(a), int(b)): i
                           for i, (a, b) in enumerate(self.merges)}
        return self._ranks

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def id_bytes(self) -> list[bytes]:
        """id → byte expansion (for decode)."""
        out = [bytes([i]) for i in range(256)]
        for a, b in self.merges:
            out.append(out[int(a)] + out[int(b)])
        return out

    def __getstate__(self):
        return {"merges": self.merges, "fingerprint": self.fingerprint}

    def __setstate__(self, st):
        self.merges = st["merges"]
        self.fingerprint = st["fingerprint"]
        self._ranks = None


def learn_merges(words, counts, n_merges: int,
                 min_pair_count: int = 2) -> np.ndarray:
    """The BPE merge loop over a (word, count) table — vectorized.

    ``words``: list[bytes] | large_binary Array; ``counts``: int array.
    Returns the (M, 2) int32 merge table (rank order). Deterministic
    tiebreak: highest weighted pair count, then smallest (left, right).
    """
    if isinstance(words, (pa.Array, pa.ChunkedArray)):
        w_off, w_data = _binary_buffers(words)
        sym = w_data.astype(np.int32)
        word_of = np.repeat(np.arange(len(w_off) - 1, dtype=np.int64),
                            np.diff(w_off))
    else:
        blobs = list(words)
        sym = np.frombuffer(b"".join(blobs), dtype=np.uint8).astype(np.int32)
        lens = np.array([len(b) for b in blobs], dtype=np.int64)
        word_of = np.repeat(np.arange(len(blobs), dtype=np.int64), lens)
    cnts = np.asarray(counts, dtype=np.int64)
    merges = np.zeros((0, 2), dtype=np.int32)
    out = []
    for mi in range(n_merges):
        if len(sym) < 2:
            break
        valid = word_of[:-1] == word_of[1:]
        if not valid.any():
            break
        keys = (sym[:-1].astype(np.int64) << 32) | sym[1:].astype(np.int64)
        vk = keys[valid]
        wts = cnts[word_of[:-1][valid]]
        uniq, inv = np.unique(vk, return_inverse=True)
        tot = np.bincount(inv, weights=wts.astype(np.float64)).astype(np.int64)
        best_i = int(np.lexsort((uniq, -tot))[0])
        if tot[best_i] < min_pair_count:
            break
        best = int(uniq[best_i])
        a, b = best >> 32, best & 0xFFFFFFFF
        out.append((a, b))
        new_id = 256 + mi
        # positions of the pair (leftmost-first, non-overlapping):
        # consecutive positions only match when a == b; within each run of
        # consecutive matches keep even parity from the run's first element
        p = np.flatnonzero((keys == best) & valid)
        if len(p) > 1:
            is_new_run = np.ones(len(p), dtype=np.int64)
            is_new_run[1:] = (np.diff(p) != 1).astype(np.int64)
            run_id = np.cumsum(is_new_run) - 1
            run_first = p[is_new_run.astype(bool)]
            p = p[((p - run_first[run_id]) % 2) == 0]
        sym[p] = new_id
        drop = np.zeros(len(sym), dtype=bool)
        drop[p + 1] = True
        sym = sym[~drop]
        word_of = word_of[~drop]
    merges = np.array(out, dtype=np.int32).reshape(-1, 2)
    return merges


def _encode_word(wb: bytes, ranks: dict, merges: np.ndarray) -> np.ndarray:
    """Apply merges in rank order (GPT-2 bpe()); leftmost-first in ties."""
    syms = list(wb)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = int(merges[best][0]), int(merges[best][1])
        new = 256 + best
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(new)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return np.array(syms, dtype=np.int32)


# process-global per-model pretoken→ids cache (stateless tasks reuse it
# within a worker process; bounded by distinct pretokens seen)
_ENCODE_CACHE: dict[str, dict[bytes, np.ndarray]] = {}


def encode_texts(texts, model: BpeModel):
    """Batch encode: token_ids list<int32> + n_tokens per text."""
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(texts, type=pa.large_string())
    offsets, data = _string_buffers(
        arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
    nrows = len(offsets) - 1
    tok_off, tok_doc = pretokenize_buffers(offsets, data)
    ntok = len(tok_doc)
    cache = _ENCODE_CACHE.setdefault(model.fingerprint, {})
    ranks, merges = model.ranks, model.merges
    if ntok == 0:
        ids = pa.ListArray.from_arrays(
            pa.array(np.zeros(nrows + 1, np.int32)),
            pa.array([], type=pa.int32()))
        return ids, pa.array(np.zeros(nrows, np.int64))
    toks = _tokens_as_binary(tok_off, data)
    uniq = pc.unique(toks)
    u_off, u_data = _binary_buffers(uniq)
    u_ids: list[np.ndarray] = []
    for i in range(len(u_off) - 1):
        wb = u_data[u_off[i]:u_off[i + 1]].tobytes()
        got = cache.get(wb)
        if got is None:
            got = cache[wb] = _encode_word(wb, ranks, merges)
        u_ids.append(got)
    u_len = np.array([len(x) for x in u_ids], dtype=np.int64)
    u_flat = (np.concatenate(u_ids) if u_ids
              else np.zeros(0, dtype=np.int32))
    u_start = np.zeros(len(u_ids) + 1, dtype=np.int64)
    np.cumsum(u_len, out=u_start[1:])
    # map every pretoken to its unique index
    tok_u = pc.index_in(toks, value_set=uniq).to_numpy(zero_copy_only=False)
    # per-doc token-id counts and flat assembly (pretokens are already in
    # doc order, so one concatenate in token order is the doc layout)
    per_tok_len = u_len[tok_u]
    doc_len = np.bincount(tok_doc, weights=per_tok_len,
                          minlength=nrows).astype(np.int64)
    total = int(per_tok_len.sum())
    flat = np.empty(total, dtype=np.int32)
    dst = np.zeros(len(tok_u) + 1, dtype=np.int64)
    np.cumsum(per_tok_len, out=dst[1:])
    # gather: for each pretoken, copy its unique's id slice
    src_start = u_start[tok_u]
    # vectorized ragged gather: flat[dst[i]:dst[i+1]] = u_flat[src ...]
    idx = np.arange(total, dtype=np.int64)
    tok_of_out = np.searchsorted(dst[1:], idx, side="right")
    flat[:] = u_flat[src_start[tok_of_out] + (idx - dst[tok_of_out])]
    doc_off = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(doc_len, out=doc_off[1:])
    ids = pa.LargeListArray.from_arrays(
        pa.array(doc_off), pa.array(flat, type=pa.int32()))
    return ids, pa.array(doc_len)


def decode_ids(id_lists, model: BpeModel) -> pa.Array:
    """token_ids list<int32> → original strings (lossless)."""
    vocab = model.id_bytes()
    vb = pa.array(vocab, type=pa.large_binary())
    v_off, v_data = _binary_buffers(vb)
    arr = id_lists.combine_chunks() if isinstance(id_lists, pa.ChunkedArray) \
        else id_lists
    n = len(arr)
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    list_len = pc.list_value_length(arr).to_numpy(
        zero_copy_only=False).astype(np.int64)
    doc_of_piece = np.repeat(np.arange(n, dtype=np.int64), list_len)
    piece_len = (v_off[flat + 1] - v_off[flat])
    total = int(piece_len.sum())
    out = np.empty(total, dtype=np.uint8)
    dst = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(piece_len, out=dst[1:])
    idx = np.arange(total, dtype=np.int64)
    piece = np.searchsorted(dst[1:], idx, side="right")
    out[:] = v_data[v_off[flat[piece]] + (idx - dst[piece])]
    doc_bytes = np.bincount(doc_of_piece, weights=piece_len,
                            minlength=n).astype(np.int64)
    doc_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(doc_bytes, out=doc_off[1:])
    return pa.Array.from_buffers(
        pa.large_string(), n, [None, pa.py_buffer(doc_off), pa.py_buffer(out)])


def _route_binary(t: pa.Table, col: str, n_buckets: int) -> pa.Table:
    offsets, data = _binary_buffers(t.column(col))
    h = _fnv1a64_tokens(data, offsets[:-1], np.diff(offsets))
    return t.append_column(
        "_bucket", pa.array((h & np.uint64(n_buckets - 1)).astype(np.int32)))


def word_count_table(ds, *, text_col: str = "text", min_count: int = 1,
                     num_buckets: int | None = None) -> pa.Table:
    """Distributed (pretoken, count) table — build_vocab's bounded shape
    with the BPE pretokenizer: per-batch partials (one row per distinct
    pretoken per batch), term-hash-bucket sums, one vocab-sized collect."""
    from clp_core_ray.pipelines.windows import scaled_buckets

    nb = num_buckets or scaled_buckets()

    def explode(batch: pa.Table) -> pa.Table:
        offsets, data = _string_buffers(
            batch.column(text_col).combine_chunks())
        tok_off, _ = pretokenize_buffers(offsets, data)
        toks = _tokens_as_binary(tok_off, data)
        g = pa.table({"term": toks}).group_by(["term"]).aggregate(
            [("term", "count")])
        part = pa.table({"term": g.column("term"),
                         "cnt": g.column("term_count").cast(pa.int64())})
        return _route_binary(part, "term", nb)

    def per_bucket(g: pa.Table) -> pa.Table:
        s = g.drop_columns(["_bucket"]).group_by(["term"]).aggregate(
            [("cnt", "sum")])
        out = pa.table({"term": s.column("term"),
                        "cnt": s.column("cnt_sum")})
        if min_count > 1:
            out = out.filter(
                pc.greater_equal(out.column("cnt"), pa.scalar(min_count)))
        return out

    parts = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("_bucket").map_groups(per_bucket,
                                            batch_format="pyarrow"))
    import ray

    tables = [t for t in ray.get(parts.to_arrow_refs())
              if t is not None and t.num_rows]
    if not tables:
        return pa.table({"term": pa.array([], type=pa.large_binary()),
                         "cnt": pa.array([], type=pa.int64())})
    return pa.concat_tables(tables, promote_options="default")


def train_bpe(ds, *, n_merges: int, text_col: str = "text",
              min_count: int = 1, min_pair_count: int = 2,
              num_buckets: int | None = None) -> BpeModel:
    """Distributed BPE training: word-count exchange (corpus-parallel,
    bounded) + vectorized driver merge loop (vocab-bounded)."""
    wc = word_count_table(ds, text_col=text_col, min_count=min_count,
                          num_buckets=num_buckets)
    # deterministic driver-side order (the merge loop's pair counting is
    # order-invariant, but fixing it makes debugging reproducible)
    idx = pc.sort_indices(wc, sort_keys=[("term", "ascending")])
    wc = wc.take(idx)
    merges = learn_merges(wc.column("term"),
                          wc.column("cnt").to_numpy(),
                          n_merges, min_pair_count=min_pair_count)
    return BpeModel(merges=merges)


class BpeEncoder:
    """Stateless-task encode stage: the model rides a plasma ref in the
    pickled instance (resolved lazily once per task, cached per process)."""

    def __init__(self, model_ref, text_col: str = "text",
                 keep_ids: bool = True):
        self.model_ref = model_ref
        self.model = model_ref if isinstance(model_ref, BpeModel) else None
        self.text_col = text_col
        self.keep_ids = keep_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.model is None:
            import ray

            self.model = ray.get(self.model_ref)
        ids, n_tok = encode_texts(
            batch.column(self.text_col).combine_chunks(), self.model)
        out = batch.append_column("n_tokens", n_tok)
        if self.keep_ids:
            out = out.append_column("token_ids", ids)
        return out


def bpe_encode(ds, model: BpeModel, *, text_col: str = "text",
               keep_ids: bool = True):
    """Dataset → Dataset with ``token_ids`` (list<int32>) and ``n_tokens``.
    Broadcasts the model once (``ray.put``); never re-ships per batch."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(BpeEncoder(ref, text_col, keep_ids),
                          batch_format="pyarrow")
