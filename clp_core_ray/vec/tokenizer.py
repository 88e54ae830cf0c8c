"""Vectorized CLP encoder: whole Arrow string batches → encoded columns.

Operates directly on the Arrow string column's (offsets, data) buffers with
numpy — no per-row Python. This is the hot kernel of the engine; the scalar
functions in :mod:`clp_core_ray.encoding` are the conformance oracle
(tested byte-equivalent in tests/test_vec.py).

Semantics per reference (/root/reference/): tokenizer
components/core/src/clp/ir/parsing.cpp:20-94; int/float canonical forms
components/core/src/clp/EncodedVariableInterpreter.cpp:31-204; logtype
escaping components/core/src/clp/ir/parsing.inc:12-33.

Multi-byte UTF-8 continuation bytes (>= 0x80) are delimiters, exactly as in
the reference where ``is_delim(signed char)`` sees them as negative.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clp_core_ray import encoding as E

# ---- byte-class lookup tables ------------------------------------------------
_DELIM = np.ones(256, dtype=bool)
for _c in b"+-.\\_":
    _DELIM[_c] = False
_DELIM[ord("0") : ord("9") + 1] = False
_DELIM[ord("A") : ord("Z") + 1] = False
_DELIM[ord("a") : ord("z") + 1] = False

_DIGIT = np.zeros(256, dtype=bool)
_DIGIT[ord("0") : ord("9") + 1] = True
_ALPHA = np.zeros(256, dtype=bool)
_ALPHA[ord("A") : ord("Z") + 1] = True
_ALPHA[ord("a") : ord("z") + 1] = True
_HEX = np.zeros(256, dtype=bool)
_HEX[ord("0") : ord("9") + 1] = True
_HEX[ord("a") : ord("f") + 1] = True
_HEX[ord("A") : ord("F") + 1] = True
_SPECIAL = np.zeros(256, dtype=bool)  # bytes needing escape inside constants
for _c in (0x11, 0x12, 0x13, 0x5C):
    _SPECIAL[_c] = True

_POW10 = (10 ** np.arange(20, dtype=np.uint64)).astype(np.uint64)
_UINT64_INT64_MAX = np.uint64(2**63 - 1)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _cumsum0(a: np.ndarray, dtype=None) -> np.ndarray:
    """Exclusive-prefix-sum with a leading 0.

    Bool inputs are viewed as int8 (cumsum over bool hits a ~100x slower numpy
    path) and accumulated in int32 by default — batch buffers are < 2 GiB, and
    halving the memory traffic of these whole-buffer scans is a measurable win.
    """
    if a.dtype == np.bool_:
        a = a.view(np.int8)
        if dtype is None:
            dtype = np.int32
    if dtype is None:
        dtype = np.int64 if a.dtype == np.int64 else np.int32
    out = np.empty(len(a) + 1, dtype=dtype)
    out[0] = 0
    np.cumsum(a, dtype=dtype, out=out[1:])
    return out


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets, data) from a string/large_string array (rebased)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        arr = arr.cast(pa.large_string())
        off_dtype = np.int64
    if arr.null_count:
        arr = arr.fill_null("")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64, copy=False)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lo, hi = offsets[0], offsets[-1]
    return offsets - lo, data[lo:hi]


def _fnv1a64_tokens(data: np.ndarray, b: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """FNV-1a 64 of each token (variable length), vectorized across tokens."""
    n = len(b)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    maxlen = int(lengths.max(initial=0))
    with np.errstate(over="ignore"):
        for p in range(maxlen):
            active = lengths > p
            idx = b[active] + p
            ha = h[active]
            ha ^= data[idx].astype(np.uint64)
            ha *= _FNV_PRIME
            h[active] = ha
    return h


def encode_batch(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Encode a batch of messages.

    Returns Arrow arrays:
      logtype      large_string  placeholder-encoded template
      encoded_vars list<int64>   int value | packed float | dict-var hash id
      var_types    list<int8>    0=int 1=float 2=dict
      dict_vars    list<string>  dict-var strings, placeholder order
      n_vars       int32
    """
    offsets, data = _string_buffers(
        texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts)
    )
    nrows = len(offsets) - 1
    nbytes = len(data)
    if nbytes == 0:
        empty_i64 = pa.ListArray.from_arrays(
            pa.array(np.zeros(nrows + 1, np.int32)), pa.array([], type=pa.int64())
        )
        empty_i8 = pa.ListArray.from_arrays(
            pa.array(np.zeros(nrows + 1, np.int32)), pa.array([], type=pa.int8())
        )
        empty_str = pa.ListArray.from_arrays(
            pa.array(np.zeros(nrows + 1, np.int32)), pa.array([], type=pa.string())
        )
        return {
            "logtype": pa.array([""] * nrows, type=pa.large_string()),
            "encoded_vars": empty_i64,
            "var_types": empty_i8,
            "dict_vars": empty_str,
            "n_vars": pa.array(np.zeros(nrows, np.int32)),
        }

    # ---- token boundaries (string-boundary aware) ----------------------------
    nd = ~_DELIM[data]
    prev_nd = np.empty(nbytes, dtype=bool)
    prev_nd[0] = False
    prev_nd[1:] = nd[:-1]
    row_starts = offsets[:-1]
    prev_nd[row_starts[row_starts < nbytes]] = False
    next_nd = np.empty(nbytes, dtype=bool)
    next_nd[-1] = False
    next_nd[:-1] = nd[1:]
    row_last = offsets[1:] - 1
    next_nd[row_last[row_last >= 0]] = False

    tok_b = np.flatnonzero(nd & ~prev_nd)
    tok_e = np.flatnonzero(nd & ~next_nd) + 1

    cs_dig = _cumsum0(_DIGIT[data])
    cs_alpha = _cumsum0(_ALPHA[data])
    cs_hex = _cumsum0(_HEX[data])

    tok_len = tok_e - tok_b
    dig_cnt = cs_dig[tok_e] - cs_dig[tok_b]
    alpha_cnt = cs_alpha[tok_e] - cs_alpha[tok_b]
    hex_cnt = cs_hex[tok_e] - cs_hex[tok_b]

    tok_row = np.searchsorted(offsets, tok_b, side="right") - 1
    at_row_start = tok_b == offsets[tok_row]
    prev_byte = data[np.maximum(tok_b - 1, 0)]
    preceded_eq = (~at_row_start) & (prev_byte == ord("="))

    is_var_tok = (
        (dig_cnt > 0)
        | (preceded_eq & (alpha_cnt > 0))
        | ((hex_cnt == tok_len) & (tok_len >= 2))
    )

    vb = tok_b[is_var_tok]
    ve = tok_e[is_var_tok]
    vrow = tok_row[is_var_tok]
    return assemble_encoded(data, offsets, vb, ve, vrow, vdig=dig_cnt[is_var_tok])


def assemble_encoded(
    data: np.ndarray,
    offsets: np.ndarray,
    vb: np.ndarray,
    ve: np.ndarray,
    vrow: np.ndarray,
    vdig: np.ndarray | None = None,
    allow_int: np.ndarray | None = None,
    allow_float: np.ndarray | None = None,
) -> dict[str, pa.Array]:
    """Classify variable spans and build the encoded-schema arrays.

    The shared back half of the encoder: callers supply the variable spans
    ``[vb, ve)`` (ascending, non-overlapping, never crossing a row boundary
    of ``offsets``) over the row-concatenated byte buffer ``data``, plus the
    row index per span. :func:`encode_batch` feeds it the byte-class token
    scan; the schema-rule lexer (functions/rules.py) feeds it regex-lexed
    spans. ``allow_int`` / ``allow_float`` masks (per span) restrict which
    spans may take the specially-encoded forms — a span failing its canonical
    check (or not allowed) becomes a dictionary variable, exactly the
    reference's demotion rule (EncodedVariableInterpreter.cpp:31-204).
    """
    nbytes = len(data)
    nrows = len(offsets) - 1
    vlen = ve - vb
    if vdig is None:
        cs_dig = _cumsum0(_DIGIT[data])
        vdig = cs_dig[ve] - cs_dig[vb]
    nvars_total = len(vb)

    # ---- classification -------------------------------------------------------
    dot_mask_all = data == ord(".")
    cs_dot = _cumsum0(dot_mask_all)
    vdot = cs_dot[ve] - cs_dot[vb]
    first = data[vb] if nvars_total else np.empty(0, np.uint8)
    minus = first == ord("-")
    ndig = vlen - minus.astype(np.int64)
    second = data[np.minimum(vb + 1, nbytes - 1)] if nvars_total else first

    int_form = (vdig == ndig) & (ndig >= 1)
    int_form &= np.where(
        minus,
        (vlen >= 2) & (second >= ord("1")) & (second <= ord("9")),
        (vlen == 1) | (first != ord("0")),
    )
    # 19 digits may overflow int64; 20+ digits always do (checked after parse)
    int_form &= ndig <= 19

    last_byte = data[np.maximum(ve - 1, 0)] if nvars_total else first
    float_form = (
        ~int_form
        & (vdot == 1)
        & (vdig >= 1)
        & (vdig <= 16)
        & (vdig + vdot + minus.astype(np.int64) == vlen)
        & (last_byte != ord("."))
    )
    if allow_int is not None:
        int_form &= allow_int
    if allow_float is not None:
        float_form &= allow_float

    # ---- numeric value parse via (n, maxlen) byte matrix ----------------------
    encoded = np.zeros(nvars_total, dtype=np.int64)
    numeric = int_form | float_form
    if numeric.any():
        nb = vb[numeric]
        nl = vlen[numeric]
        nminus = minus[numeric]
        maxlen = int(nl.max())
        col = np.arange(maxlen, dtype=np.int64)
        idx = np.minimum(nb[:, None] + col[None, :], nbytes - 1)
        valid = col[None, :] < nl[:, None]
        m = data[idx]
        digm = _DIGIT[m] & valid
        digvals = np.where(digm, m - ord("0"), 0).astype(np.uint64)
        # exponent = number of digit chars strictly to the right
        digits_right = np.flip(np.cumsum(np.flip(digm, axis=1).view(np.int8), axis=1), axis=1)
        expo = np.where(digm, digits_right - 1, 0)
        with np.errstate(over="ignore"):
            value = (digvals * _POW10[expo]).sum(axis=1, dtype=np.uint64)

        is_int_n = int_form[numeric]
        fits = np.where(
            nminus, value <= _UINT64_INT64_MAX + np.uint64(1), value <= _UINT64_INT64_MAX
        )
        int_ok = is_int_n & fits
        with np.errstate(over="ignore"):
            signed = np.where(nminus, (~value) + np.uint64(1), value).view(np.int64)
        # scatter int values
        num_idx = np.flatnonzero(numeric)
        encoded[num_idx[int_ok]] = signed[int_ok]
        # demote overflowing "ints" to dict vars
        int_overflow_global = num_idx[is_int_n & ~fits]
        int_form[int_overflow_global] = False

        is_float_n = float_form[numeric]
        if is_float_n.any():
            dotm = (m == ord(".")) & valid
            dotpos_left = np.argmax(dotm, axis=1)
            dec_from_right = nl - 1 - dotpos_left
            fdig = vdig[numeric]
            enc = (
                (nminus.astype(np.uint64) << np.uint64(63))
                | (value << np.uint64(8))
                | ((fdig.astype(np.uint64) - np.uint64(1)) << np.uint64(4))
                | (dec_from_right.astype(np.uint64) - np.uint64(1))
            )
            encoded[num_idx[is_float_n]] = enc[is_float_n].view(np.int64)

    dict_form = ~int_form & ~float_form
    if dict_form.any():
        db = vb[dict_form]
        dl = vlen[dict_form]
        encoded[dict_form] = _fnv1a64_tokens(data, db, dl).view(np.int64)

    var_types = np.full(nvars_total, E.VT_DICT, dtype=np.int8)
    var_types[int_form] = E.VT_INT
    var_types[float_form] = E.VT_FLOAT

    # ---- logtype construction -------------------------------------------------
    # vb values are unique and ve values are unique, but a ve may coincide with
    # the next row's vb (token ends at a row boundary, next row starts with a
    # token) — so assign starts, then subtract ends in place (no np.add.at).
    invar_delta = np.zeros(nbytes + 1, dtype=np.int8)
    invar_delta[vb] = 1
    invar_delta[ve] -= 1
    invar = np.cumsum(invar_delta[:-1], dtype=np.int32) > 0

    special = _SPECIAL[data]
    contrib = np.where(invar, np.int32(0), np.where(special, np.int32(2), np.int32(1)))
    contrib[vb] = 1
    # escaping can double output bytes (contrib=2 per special char), so the
    # offset accumulator must not overflow int32 for batches near 1 GiB of
    # escape-dense text — use int64 whenever 2*nbytes could exceed int32
    cs_contrib = _cumsum0(
        contrib, dtype=np.int64 if nbytes * 2 >= 2**31 - 16 else np.int32
    )
    out_pos = cs_contrib[:-1]
    out = np.empty(cs_contrib[-1], dtype=np.uint8)

    keep_normal = ~invar & ~special
    out[out_pos[keep_normal]] = data[keep_normal]
    keep_special = ~invar & special
    if keep_special.any():
        sp = out_pos[keep_special]
        out[sp] = 0x5C
        out[sp + 1] = data[keep_special]
    ph = np.empty(nvars_total, dtype=np.uint8)
    ph[int_form] = 0x11
    ph[float_form] = 0x13
    ph[dict_form] = 0x12
    out[out_pos[vb]] = ph

    logtype_offsets = cs_contrib[offsets]
    logtype_arr = pa.Array.from_buffers(
        pa.large_string(),
        nrows,
        [None, pa.py_buffer(logtype_offsets.astype(np.int64).tobytes()), pa.py_buffer(out.tobytes())],
    )

    # ---- per-row list assembly ------------------------------------------------
    var_counts = np.bincount(vrow, minlength=nrows)
    var_off = _cumsum0(var_counts, dtype=np.int32)
    encoded_vars = pa.ListArray.from_arrays(pa.array(var_off), pa.array(encoded, type=pa.int64()))
    var_types_arr = pa.ListArray.from_arrays(
        pa.array(var_off), pa.array(var_types, type=pa.int8())
    )

    drow = vrow[dict_form]
    db = vb[dict_form]
    dl = vlen[dict_form]
    total_dict_bytes = int(dl.sum())
    tok_off = _cumsum0(dl)
    if total_dict_bytes:
        src = np.repeat(db, dl) + (np.arange(total_dict_bytes) - np.repeat(tok_off[:-1], dl))
        dict_buf = data[src]
    else:
        dict_buf = np.empty(0, np.uint8)
    dict_values = pa.Array.from_buffers(
        pa.string(),
        len(db),
        [None, pa.py_buffer(tok_off.astype(np.int32).tobytes()), pa.py_buffer(dict_buf.tobytes())],
    )
    dict_counts = np.bincount(drow, minlength=nrows)
    dict_vars = pa.ListArray.from_arrays(
        pa.array(_cumsum0(dict_counts, dtype=np.int32)), dict_values
    )

    return {
        "logtype": logtype_arr,
        "encoded_vars": encoded_vars,
        "var_types": var_types_arr,
        "dict_vars": dict_vars,
        "n_vars": pa.array(var_counts.astype(np.int32)),
    }
