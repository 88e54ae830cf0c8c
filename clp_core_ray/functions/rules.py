"""User-extensible schema-rule parser (M7 / §2.10: log-surgeon's role).

CLP's schema file (components/core/config/schemas.txt, consumed at
clp/FileCompressor.cpp:196-228) declares delimiters plus ordered, named regex
rules; `timestamp` rules mark event boundaries, `int`/`float` rules get the
specially-encoded forms, every other named rule becomes a dictionary
variable. This module re-expresses that as a RuleSet compiled ONCE (per
actor) into a single prioritized alternation, scanned per batch with C-speed
regex over the batch's concatenated byte buffer — one Python-level loop over
*matches*, none over rows.

Delimiter semantics (log-surgeon: variables are delimiter-bounded tokens)
are honored by anchoring every rule between delimiters/line edges and by
rewriting unescaped ``.`` atoms to ``[^delims]`` — so the reference's
``hasNumber:.*\\d.*`` matches one token, not the rest of the line.
``timestamp:`` rules strip a leading timestamp into a ``ts_text`` column
before variable scanning (the reference stores timestamps out-of-band).

Output is the standard encoded schema (logtype + encoded_vars + var_types +
dict_vars), so the stock decoder round-trips rule-encoded messages untouched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from clp_core_ray import encoding as E

DEFAULT_RULES: list[tuple[str, str]] = [
    # mirrors config/schemas.txt (timestamp rules live in timestamps.py).
    # log-surgeon's DFA uses maximal munch; python-re alternation is
    # first-match, so the longer-matching float rule is listed before int.
    ("float", r"\-?[0-9]+\.[0-9]+"),
    ("int", r"\-?[0-9]+"),
    ("hex", r"[a-fA-F]+"),
    ("hasNumber", r"[^ \t\r\n]*\d[^ \t\r\n]*"),
    ("equals", r"[^ \t\r\n]*=[^ \t\r\n]*[a-zA-Z0-9][^ \t\r\n]*"),
]


def _token_bound(rx: str, delim_class: str) -> str:
    """Rewrite unescaped ``.`` (outside char classes) to ``[^delims]`` so a
    schema rule cannot swallow delimiters — log-surgeon lexes tokens between
    delimiters before rules apply, so ``.`` there never crosses one."""
    out = []
    i, in_class = 0, False
    while i < len(rx):
        ch = rx[i]
        if ch == "\\" and i + 1 < len(rx):
            out.append(rx[i : i + 2])
            i += 2
            continue
        if ch == "[":
            in_class = True
        elif ch == "]":
            in_class = False
        if ch == "." and not in_class:
            out.append(f"[^{delim_class}]")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


@dataclass
class RuleSet:
    """Ordered named rules; earlier rules win on overlap (log-surgeon
    priority). ``int``/``float`` rules produce specially-encoded variables
    when the token is canonical; everything else is a dictionary variable.

    ``delimiters`` is the raw char-class body from the schema file's
    ``delimiters:`` line (None = rules self-bound, legacy behavior);
    ``timestamp_rules`` are the ``timestamp:`` regexes, applied at line
    start only."""

    rules: list[tuple[str, str]] = field(default_factory=lambda: list(DEFAULT_RULES))
    delimiters: str | None = None
    timestamp_rules: list[str] = field(default_factory=list)

    def _delim_class(self) -> str | None:
        if self.delimiters is None:
            return None
        d = self.delimiters
        if "\\n" not in d and "\n" not in d:
            d += r"\n"  # row sentinel must always bound tokens
        return d

    def compile(self) -> re.Pattern:
        d = self._delim_class()
        alts = []
        for i, (name, rx) in enumerate(self.rules):
            if d is not None:
                rx = _token_bound(rx, d)
            alts.append(f"(?P<r{i}>{rx})")
        body = "|".join(alts)
        if d is None:
            return re.compile(body)
        # delimiter-bounded: each match must start after a delimiter (or line
        # start) and end before one (or line end)
        return re.compile(
            rf"(?:^|(?<=[{d}]))(?:{body})(?=[{d}]|$)", re.MULTILINE
        )

    def compile_each(self) -> list[re.Pattern]:
        """One pattern per rule (same delimiter bounding as :meth:`compile`)
        — the maximal-munch scanner probes each rule at a candidate start."""
        d = self._delim_class()
        out = []
        for name, rx in self.rules:
            if d is not None:
                rx = _token_bound(rx, d)
                out.append(re.compile(
                    rf"(?:^|(?<=[{d}]))(?:{rx})(?=[{d}]|$)", re.MULTILINE
                ))
            else:
                out.append(re.compile(rx))
        return out

    def compile_timestamps(self) -> re.Pattern | None:
        if not self.timestamp_rules:
            return None
        body = "|".join(f"(?:{rx})" for rx in self.timestamp_rules)
        return re.compile(rf"^(?:{body})", re.MULTILINE)

    @classmethod
    def from_schema_text(cls, text: str) -> "RuleSet":
        """Parse the CLP schema-file format: `name:regex` lines, // comments,
        plus ``delimiters:`` (char set, kept verbatim as a regex-class body)
        and ``timestamp:`` (line-start regexes) declarations."""
        rules: list[tuple[str, str]] = []
        delimiters: str | None = None
        ts_rules: list[str] = []
        for line in text.splitlines():
            stripped = line.strip()
            if not stripped or stripped.startswith("//"):
                continue
            if ":" not in stripped:
                continue
            name, rx = stripped.split(":", 1)
            name = name.strip()
            if name == "delimiters":
                # keep everything after the colon: a leading space means
                # space IS a delimiter (it is, in the reference file)
                delimiters = line.split(":", 1)[1].rstrip("\r\n")
                continue
            if name == "timestamp":
                ts_rules.append(rx.strip())
                continue
            rules.append((name, rx.strip()))
        return cls(rules, delimiters=delimiters, timestamp_rules=ts_rules)


class RuleEncodeStage:
    """Schema-rule encoder: same output contract as EncodeStage.

    Rules are compiled once per actor (stateful-stage setup); per batch the
    row texts are joined with '\\n' sentinels and lexed with log-surgeon's
    maximal-munch semantics: the combined alternation finds each leftmost
    candidate start, then every rule is probed at that position and the
    LONGEST match wins, ties broken by rule order (log-surgeon's DFA picks
    longest-match-then-priority; Python-re alternation alone is
    first-alternative and can pick a shorter higher-priority match).
    Match→row mapping is one vectorized searchsorted. When the ruleset
    declares timestamp rules, a leading timestamp is stripped per row into
    ``ts_text`` before variable scanning (FileCompressor.cpp:196-228 event
    boundaries).
    """

    def __init__(self, ruleset: RuleSet | None = None, text_col: str = "text",
                 keep_text: bool = False):
        self.ruleset = ruleset or RuleSet()
        self.pattern = self.ruleset.compile()
        self.rule_patterns = self.ruleset.compile_each()
        self.ts_pattern = self.ruleset.compile_timestamps()
        self.rule_names = [n for n, _ in self.ruleset.rules]
        self.text_col = text_col
        self.keep_text = keep_text

    def _scan(self, joined: str) -> list[tuple[int, int, int]]:
        """Maximal-munch lexing → [(start, end, rule_idx)].

        The combined pattern's search supplies the leftmost candidate start
        (and a baseline match); each OTHER rule is probed at that start and
        the longest match wins, earliest rule on ties. One Python iteration
        per token, #rules regex probes per token — never per character."""
        out: list[tuple[int, int, int]] = []
        pos = 0
        search = self.pattern.search
        probes = self.rule_patterns
        while True:
            m = search(joined, pos)
            if m is None:
                return out
            start = m.start()
            best_idx = int(m.lastgroup[1:])
            best_end = m.end()
            for idx, rx in enumerate(probes):
                mm = rx.match(joined, start)
                if mm is None:
                    continue
                e = mm.end()
                if e > best_end or (e == best_end and idx < best_idx):
                    best_end, best_idx = e, idx
            if best_end <= start:  # zero-length safeguard
                pos = start + 1
                continue
            out.append((start, best_end, best_idx))
            pos = best_end

    @staticmethod
    def _join(texts: list[str]):
        joined = "\n".join(texts)
        row_starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum([len(t) + 1 for t in texts], out=row_starts[1:])
        return joined, row_starts

    def _strip_timestamps(self, texts: list[str]):
        """Return (stripped_texts, ts_strs): leading timestamp per row."""
        joined, row_starts = self._join(texts)
        ts_strs = [""] * len(texts)
        spans = [(m.start(), m.end()) for m in self.ts_pattern.finditer(joined)]
        if spans:
            starts = np.fromiter((s for s, _ in spans), dtype=np.int64)
            rows = np.searchsorted(row_starts, starts, side="right") - 1
            for (s, e), row in zip(spans, rows):
                if s == row_starts[row]:  # anchored at the row's first char
                    ts_strs[row] = texts[row][: e - s]
        out = [t[len(ts) :] for t, ts in zip(texts, ts_strs)]
        return out, ts_strs

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = col.fill_null("").to_pylist()
        ts_strs = None
        if self.ts_pattern is not None:
            texts, ts_strs = self._strip_timestamps(texts)
        joined, row_starts = self._join(texts)

        logtypes: list[list[str]] = [[] for _ in texts]
        evs: list[list[int]] = [[] for _ in texts]
        vts: list[list[int]] = [[] for _ in texts]
        dvs: list[list[str]] = [[] for _ in texts]
        last_end = [0] * len(texts)  # per row, relative

        # pass 1: maximal-munch lex, then map match→row in one searchsorted
        matches = self._scan(joined)
        if matches:
            mstarts = np.fromiter((s for s, _, _ in matches), dtype=np.int64)
            rows = np.searchsorted(row_starts, mstarts, side="right") - 1
        else:
            rows = ()

        # pass 2: assemble per-row logtype/vars (inherently per-match: each
        # token appends to its row's buffers in order)
        for (mstart, mend, rule_idx), row in zip(matches, rows):
            row = int(row)
            rel_b = mstart - row_starts[row]
            rel_e = mend - row_starts[row]
            if rel_e > len(texts[row]):  # spans the sentinel; cannot happen
                continue
            tok = joined[mstart:mend]
            rule = self.rule_names[rule_idx]
            out_lt = logtypes[row]
            E._append_escaped(texts[row][last_end[row]:rel_b], out_lt)
            if rule == "int" and (iv := E.encode_int(tok)) is not None:
                out_lt.append(E.PLACEHOLDER_INT)
                evs[row].append(iv)
                vts[row].append(E.VT_INT)
            elif rule == "float" and (fv := E.encode_float(tok)) is not None:
                out_lt.append(E.PLACEHOLDER_FLOAT)
                evs[row].append(fv)
                vts[row].append(E.VT_FLOAT)
            else:
                out_lt.append(E.PLACEHOLDER_DICT)
                evs[row].append(E.fnv1a64(tok.encode()))
                vts[row].append(E.VT_DICT)
                dvs[row].append(tok)
            last_end[row] = rel_e

        for row, t in enumerate(texts):
            E._append_escaped(t[last_end[row]:], logtypes[row])

        from clp_core_ray.stages.encode import logtype_ids

        lt_arr = pa.array(["".join(l) for l in logtypes], type=pa.large_string())
        cols = dict(zip(batch.column_names, batch.columns))
        if not self.keep_text:
            cols.pop(self.text_col, None)
        cols["logtype"] = lt_arr
        cols["logtype_id"] = logtype_ids(lt_arr)
        cols["encoded_vars"] = pa.array(evs, type=pa.list_(pa.int64()))
        cols["var_types"] = pa.array(vts, type=pa.list_(pa.int8()))
        cols["dict_vars"] = pa.array(dvs, type=pa.list_(pa.string()))
        cols["n_vars"] = pa.array([len(v) for v in evs], type=pa.int32())
        if ts_strs is not None:
            cols["ts_text"] = pa.array(ts_strs, type=pa.string())
        return pa.table(cols)
