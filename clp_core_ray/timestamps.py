"""CLP timestamp patterns: vectorized sniff/parse/strip and re-insertion.

Pattern table ported from the reference's observed-pattern list
(TimestampPattern.cpp:120-200): strftime-like formats with a ``%3``
millisecond extension, each annotated with the number of space-separated
tokens preceding the timestamp. Parsing tries patterns in order, first match
wins (search_known_ts_patterns, TimestampPattern.cpp:202-219); the matched
text is *cut out* of the message and its begin position recorded, and
decompression re-renders the timestamp from epoch + pattern id and re-inserts
it (TimestampPattern.cpp:751-804, reader/Archive.cpp:164-196).

Everything here is batch-vectorized: regex extraction via
pc.extract_regex, epoch math in numpy datetime64, formatting via
per-component string arrays joined element-wise.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MONTHS_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
               "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
MONTHS_FULL = ["January", "February", "March", "April", "May", "June", "July",
               "August", "September", "October", "November", "December"]
DAYS_ABBR = ["Thu", "Fri", "Sat", "Sun", "Mon", "Tue", "Wed"]  # 1970-01-01 = Thu


@dataclass(frozen=True)
class TsPattern:
    num_spaces: int
    fmt: str


# TimestampPattern::init's pattern table in reference order
# (TimestampPattern.cpp:120-192) — all absolute patterns including the
# yearless syslog/logcat forms (year defaults to 1970 on parse, exactly the
# reference's int year = 1970 at TimestampPattern.cpp:263), PLUS the
# relative-timestamp "%#3" (TimestampPattern.cpp:192): a leading run of
# digits with no leading zero, stored as milliseconds directly — date
# fields default to the epoch, so ts_ms == the literal value
# (TimestampPattern.cpp:652-707 parse, :152-175 render str(ts) unpadded).
# Last in the table, as in the reference, so absolute forms win first.
PATTERNS: list[TsPattern] = [
    TsPattern(0, "%Y-%m-%dT%H:%M:%S.%3"),
    TsPattern(0, "%Y-%m-%dT%H:%M:%S,%3"),
    TsPattern(0, "%Y-%m-%d %H:%M:%S.%3"),
    TsPattern(0, "%Y-%m-%d %H:%M:%S,%3"),
    TsPattern(0, "%Y/%m/%dT%H:%M:%S.%3"),
    TsPattern(0, "%Y/%m/%dT%H:%M:%S,%3"),
    TsPattern(0, "%Y/%m/%d %H:%M:%S.%3"),
    TsPattern(0, "%Y/%m/%d %H:%M:%S,%3"),
    TsPattern(0, "[%Y-%m-%d %H:%M:%S,%3]"),
    TsPattern(2, "%Y-%m-%d %H:%M:%S,%3"),
    TsPattern(0, "<<<%Y-%m-%d %H:%M:%S:%3"),
    TsPattern(0, "%d %b %Y %H:%M:%S,%3"),
    TsPattern(0, "%Y-%m-%dT%H:%M:%S"),
    TsPattern(0, "%Y-%m-%d %H:%M:%S"),
    TsPattern(0, "%Y/%m/%dT%H:%M:%S"),
    TsPattern(0, "%Y/%m/%d %H:%M:%S"),
    TsPattern(0, "[%Y-%m-%dT%H:%M:%S"),
    TsPattern(0, "[%Y%m%d-%H:%M:%S]"),
    TsPattern(1, "%Y-%m-%d  %H:%M:%S"),
    TsPattern(0, "%y/%m/%d %H:%M:%S"),
    TsPattern(0, "%y%m%d %k:%M:%S"),
    TsPattern(0, "%b %d, %Y %l:%M:%S %p"),
    TsPattern(0, "%B %d, %Y %H:%M"),
    TsPattern(1, "[%d/%b/%Y:%H:%M:%S"),
    TsPattern(3, "[%d/%b/%Y:%H:%M:%S"),
    TsPattern(3, "[%d/%m/%Y:%H:%M:%S"),
    TsPattern(6, "%Y-%m-%d %H:%M:%S"),
    TsPattern(1, "%Y-%m-%d %H:%M:%S"),
    TsPattern(4, "%a %b %e %H:%M:%S %Y"),
    TsPattern(0, "%a %b %e %H:%M:%S %Y"),
    TsPattern(0, "%b %d %H:%M:%S"),
    TsPattern(0, "%m-%d %H:%M:%S.%3"),
    TsPattern(0, "%#3"),
]

_FIELD_RX = {
    "Y": r"(\d{4})",
    "y": r"(\d{2})",
    "m": r"(\d{2})",
    "d": r"(\d{2})",
    "e": r"([ \d]?\d)",
    "H": r"(\d{2})",
    "k": r"([ \d]?\d)",
    "l": r"(\d{1,2})",
    "M": r"(\d{2})",
    "S": r"(\d{2})",
    "3": r"(\d{3})",
    "b": "(" + "|".join(MONTHS_ABBR) + ")",
    "B": "(" + "|".join(MONTHS_FULL) + ")",
    "a": "(" + "|".join(sorted(set(DAYS_ABBR))) + ")",
    "p": r"(AM|PM)",
}


def _compile(p: TsPattern):
    """Pattern → (anchored regex with named groups, ordered field list)."""
    import re as _re

    fields: list[str] = []
    rx: list[str] = []
    i = 0
    fmt = p.fmt
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            f = fmt[i + 1]
            if f == "#" and i + 2 < len(fmt) and fmt[i + 2] == "3":
                # relative ms: digit run, leading zero rejected
                # (TimestampPattern.cpp:654-657); rides the normal 'ms'
                # component so epoch-default date math yields ts_ms=value
                name = f"f{len(fields)}_ms"
                rx.append(f"(?P<{name}>[1-9]\\d*)")
                fields.append("3")
                i += 3
                continue
            if f in _FIELD_RX:
                name = f"f{len(fields)}_{f if f != '3' else 'ms'}"
                body = _FIELD_RX[f]
                rx.append(f"(?P<{name}>{body[1:-1]})")
                fields.append(f)
                i += 2
                continue
            raise ValueError(f"unsupported field %{f}")
        rx.append(_re.escape(c))
        i += 1
    prefix = r"(?P<pre>(?:[^ \n]+ ){%d})" % p.num_spaces if p.num_spaces else "(?P<pre>)"
    return "^" + prefix + "(?P<ts>" + "".join(rx) + ")", fields


_COMPILED = [_compile(p) for p in PATTERNS]


def _month_num(arr: pa.Array, names: list[str]) -> np.ndarray:
    idx = pc.index_in(arr, pa.array(names))
    return np.asarray(pc.fill_null(idx, 0), dtype=np.int64) + 1


def parse_and_strip(lines: pa.Array | pa.ChunkedArray):
    """Sniff/parse/cut timestamps from a batch of lines.

    Returns dict of arrays aligned with input:
      ts_ms:      int64 (epoch millis; null → no timestamp found)
      pattern_id: int32 (-1 when none)
      ts_begin:   int32 (cut position in the original line)
      content:    large_string (line with the timestamp text removed)
    """
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lines = lines.cast(pa.large_string())
    n = len(lines)
    ts_ms = np.zeros(n, dtype=np.int64)
    found = np.zeros(n, dtype=bool)
    pattern_id = np.full(n, -1, dtype=np.int32)
    ts_begin = np.zeros(n, dtype=np.int32)
    ts_len = np.zeros(n, dtype=np.int32)

    for pid, (rx, fields) in enumerate(_COMPILED):
        if found.all():
            break
        ext = pc.extract_regex(lines, rx)
        ok = np.asarray(pc.is_valid(ext)) & ~found
        if not ok.any():
            continue
        st = ext.combine_chunks() if isinstance(ext, pa.ChunkedArray) else ext
        pre = pc.fill_null(pc.struct_field(st, "pre"), "")
        tstr = pc.fill_null(pc.struct_field(st, "ts"), "")
        comp: dict[str, np.ndarray] = {}
        for fi, f in enumerate(fields):
            name = f"f{fi}_{f if f != '3' else 'ms'}"
            col = pc.fill_null(pc.struct_field(st, name), "0")
            if f == "b":
                comp["m"] = _month_num(col, MONTHS_ABBR)
            elif f == "B":
                comp["m"] = _month_num(col, MONTHS_FULL)
            elif f == "a":
                pass  # weekday carries no epoch information
            elif f == "p":
                comp["p"] = np.asarray(pc.equal(col, "PM"), dtype=np.int64)
            else:
                stripped = pc.utf8_ltrim_whitespace(col)
                vals = np.asarray(
                    pc.cast(pc.if_else(pc.equal(stripped, ""), "0", stripped), pa.int64())
                )
                key = {"Y": "Y", "y": "y", "m": "m", "d": "d", "e": "d", "H": "H",
                       "k": "H", "l": "l", "M": "M", "S": "S", "3": "ms"}[f]
                comp[key] = vals
        Y = comp.get("Y")
        if Y is None and "y" in comp:
            Y = comp["y"] + 2000
        if Y is None:
            Y = np.full(n, 1970, dtype=np.int64)
        M = comp.get("m", np.ones(n, dtype=np.int64))
        D = comp.get("d", np.ones(n, dtype=np.int64))
        H = comp.get("H")
        if H is None and "l" in comp:
            H = comp["l"] % 12 + comp.get("p", np.zeros(n, dtype=np.int64)) * 12
        if H is None:
            H = np.zeros(n, dtype=np.int64)
        Mi = comp.get("M", np.zeros(n, dtype=np.int64))
        S = comp.get("S", np.zeros(n, dtype=np.int64))
        ms = comp.get("ms", np.zeros(n, dtype=np.int64))

        Mc = M.clip(1, 12)
        days = (
            (Y - 1970).astype("M8[Y]").astype("M8[M]")
            + (Mc - 1).astype("m8[M]")
        ).astype("M8[D]") + (D.clip(1, 31) - 1).astype("m8[D]")
        epoch = days.astype("M8[ms]").astype(np.int64) + (
            (H * 3600 + Mi * 60 + S) * 1000 + ms
        )

        ts_ms[ok] = epoch[ok]
        pattern_id[ok] = pid
        pre_len = np.asarray(pc.utf8_length(pre), dtype=np.int32)
        tlen = np.asarray(pc.utf8_length(tstr), dtype=np.int32)
        ts_begin[ok] = pre_len[ok]
        ts_len[ok] = tlen[ok]
        found |= ok

    # cut the matched region out of each line (ragged copy on raw buffers —
    # arrow slice kernels take scalar bounds only)
    from clp_core_ray.vec.tokenizer import _cumsum0, _string_buffers

    offsets, data = _string_buffers(lines)
    line_len = np.diff(offsets)
    cut_len = ts_len.astype(np.int64)
    out_len = line_len - cut_len
    out_off = _cumsum0(out_len, dtype=np.int64)
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    # ragged copy: [0, ts_begin) then [ts_begin+ts_len, line_len)
    src_starts = np.concatenate([offsets[:-1], offsets[:-1] + ts_begin + ts_len])
    dst_starts = np.concatenate([out_off[:-1], out_off[:-1] + ts_begin])
    seg_lens = np.concatenate([ts_begin.astype(np.int64), line_len - ts_begin - cut_len])
    total = int(seg_lens.sum())
    if total:
        pos = np.arange(total) - np.repeat(_cumsum0(seg_lens)[:-1], seg_lens)
        out[np.repeat(dst_starts, seg_lens) + pos] = data[
            np.repeat(src_starts, seg_lens) + pos
        ]
    content = pa.Array.from_buffers(
        pa.large_string(), n,
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out.tobytes())],
    )
    return {
        "ts_ms": pa.array(ts_ms, type=pa.int64(), mask=~found),
        "pattern_id": pa.array(pattern_id, type=pa.int32()),
        "ts_begin": pa.array(ts_begin, type=pa.int32()),
        "content": content,
    }


def format_batch(ts_ms: np.ndarray, pattern_id: np.ndarray) -> pa.Array:
    """Render epoch millis back to text per pattern (inverse of parse)."""
    n = len(ts_ms)
    out = np.full(n, "", dtype=object)
    ts64 = np.asarray(ts_ms, dtype="M8[ms]")
    days = ts64.astype("M8[D]")
    Y = ts64.astype("M8[Y]").astype(np.int64) + 1970
    M = ts64.astype("M8[M]").astype(np.int64) % 12 + 1
    D = (days - ts64.astype("M8[M]").astype("M8[D]")).astype(np.int64) + 1
    rem = (ts64.astype(np.int64) - days.astype("M8[ms]").astype(np.int64))
    H = rem // 3_600_000
    Mi = rem % 3_600_000 // 60_000
    S = rem % 60_000 // 1000
    ms = rem % 1000
    wd = (days.astype(np.int64) + 4) % 7  # 1970-01-01 was Thursday (=4 w/ Sun=0)
    WDAYS = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]

    for pid in np.unique(pattern_id):
        if pid < 0:
            continue
        sel = pattern_id == pid
        fmt = PATTERNS[pid].fmt
        pieces = []
        i = 0
        while i < len(fmt):
            if fmt[i] == "%" and i + 1 < len(fmt):
                f = fmt[i + 1]
                if f == "#":
                    # relative ts: str(total ms), no padding
                    # (TimestampPattern.cpp:154-156)
                    unit = fmt[i + 2] if i + 2 < len(fmt) else "3"
                    scale = {"3": 1, "6": 1000, "9": 1_000_000}[unit]
                    tot = np.asarray(ts_ms, dtype=np.int64)[sel] * scale
                    pieces.append(np.char.mod("%d", tot))
                    i += 3
                    continue
                if f == "Y":
                    pieces.append(np.char.mod("%04d", Y[sel]))
                elif f == "y":
                    pieces.append(np.char.mod("%02d", Y[sel] % 100))
                elif f == "m":
                    pieces.append(np.char.mod("%02d", M[sel]))
                elif f == "d":
                    pieces.append(np.char.mod("%02d", D[sel]))
                elif f == "e":
                    pieces.append(np.char.mod("%2d", D[sel]))
                elif f == "H":
                    pieces.append(np.char.mod("%02d", H[sel]))
                elif f == "k":
                    pieces.append(np.char.mod("%2d", H[sel]))
                elif f == "l":
                    h12 = H[sel] % 12
                    h12[h12 == 0] = 12
                    pieces.append(np.char.mod("%d", h12))
                elif f == "p":
                    pieces.append(np.where(H[sel] >= 12, "PM", "AM"))
                elif f == "M":
                    pieces.append(np.char.mod("%02d", Mi[sel]))
                elif f == "S":
                    pieces.append(np.char.mod("%02d", S[sel]))
                elif f == "3":
                    pieces.append(np.char.mod("%03d", ms[sel]))
                elif f == "b":
                    pieces.append(np.array(MONTHS_ABBR, dtype=object)[M[sel] - 1])
                elif f == "B":
                    pieces.append(np.array(MONTHS_FULL, dtype=object)[M[sel] - 1])
                elif f == "a":
                    pieces.append(np.array(WDAYS, dtype=object)[wd[sel]])
                else:
                    raise ValueError(f"unsupported field %{f}")
                i += 2
                continue
            pieces.append(np.full(int(sel.sum()), fmt[i], dtype=object))
            i += 1
        acc = pieces[0].astype(object)
        for p in pieces[1:]:
            acc = np.char.add(acc.astype(str), np.asarray(p).astype(str)).astype(object)
        out[sel] = acc
    return pa.array(out.tolist(), type=pa.large_string())


def insert_timestamps(contents: pa.Array, ts_text: pa.Array,
                      ts_begin: np.ndarray) -> pa.Array:
    """Re-insert rendered timestamps at their recorded positions."""
    from clp_core_ray.vec.tokenizer import _cumsum0, _string_buffers

    c_off, c_data = _string_buffers(contents)
    t_off, t_data = _string_buffers(ts_text)
    n = len(c_off) - 1
    c_len = np.diff(c_off)
    t_len = np.diff(t_off)
    begin = np.asarray(ts_begin, dtype=np.int64)
    out_len = c_len + t_len
    out_off = _cumsum0(out_len, dtype=np.int64)
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    # three ragged segments: content[:begin], ts, content[begin:]
    src_starts = np.concatenate([c_off[:-1], t_off[:-1], c_off[:-1] + begin])
    dst_starts = np.concatenate(
        [out_off[:-1], out_off[:-1] + begin, out_off[:-1] + begin + t_len]
    )
    seg_lens = np.concatenate([begin, t_len, c_len - begin])
    srcs = np.concatenate([
        np.zeros(n, dtype=np.int8), np.ones(n, dtype=np.int8), np.zeros(n, dtype=np.int8)
    ])
    total = int(seg_lens.sum())
    if total:
        pos = np.arange(total) - np.repeat(_cumsum0(seg_lens)[:-1], seg_lens)
        src_abs = np.repeat(src_starts, seg_lens) + pos
        dst_abs = np.repeat(dst_starts, seg_lens) + pos
        from_t = np.repeat(srcs, seg_lens) == 1
        out[dst_abs[~from_t]] = c_data[src_abs[~from_t]]
        out[dst_abs[from_t]] = t_data[src_abs[from_t]]
    return pa.Array.from_buffers(
        pa.large_string(), n,
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out.tobytes())],
    )
