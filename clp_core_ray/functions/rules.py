"""User-extensible schema-rule parser (M7 / §2.10: log-surgeon's role).

CLP's schema file (components/core/config/schemas.txt, consumed at
clp/FileCompressor.cpp:196-228) declares delimiters plus ordered, named regex
rules; `timestamp` rules mark event boundaries, `int`/`float` rules get the
specially-encoded forms, every other named rule becomes a dictionary
variable. This module re-expresses that as a RuleSet compiled ONCE (per
actor) into a single prioritized alternation, scanned per batch with C-speed
regex over the batch's concatenated byte buffer — one Python-level loop over
*matches*, none over rows.

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


@dataclass
class RuleSet:
    """Ordered named rules; earlier rules win on overlap (log-surgeon
    priority). ``int``/``float`` rules produce specially-encoded variables
    when the token is canonical; everything else is a dictionary variable."""

    rules: list[tuple[str, str]] = field(default_factory=lambda: list(DEFAULT_RULES))

    def compile(self) -> re.Pattern:
        alts = []
        for i, (name, rx) in enumerate(self.rules):
            alts.append(f"(?P<r{i}>{rx})")
        return re.compile("|".join(alts))

    @classmethod
    def from_schema_text(cls, text: str) -> "RuleSet":
        """Parse the CLP schema-file format: `name:regex` lines, // comments.
        ``delimiters:`` and ``timestamp:`` lines are accepted and ignored
        (timestamps are handled by the timestamp engine)."""
        rules = []
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            if ":" not in line:
                continue
            name, rx = line.split(":", 1)
            name = name.strip()
            if name in ("delimiters", "timestamp"):
                continue
            rules.append((name, rx.strip()))
        return cls(rules)


class RuleEncodeStage:
    """Schema-rule encoder: same output contract as EncodeStage.

    Rules are compiled once per actor (stateful-stage setup); per batch the
    row texts are joined with '\\n' sentinels and scanned with one finditer
    pass. Longest-leftmost within the alternation follows Python-re
    first-alternative priority, matching log-surgeon's rule order semantics.
    """

    def __init__(self, ruleset: RuleSet | None = None, text_col: str = "text",
                 keep_text: bool = False):
        self.ruleset = ruleset or RuleSet()
        self.pattern = self.ruleset.compile()
        self.rule_names = [n for n, _ in self.ruleset.rules]
        self.text_col = text_col
        self.keep_text = keep_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = col.fill_null("").to_pylist()
        joined = "\n".join(texts)
        row_starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum([len(t) + 1 for t in texts], out=row_starts[1:])

        logtypes: list[list[str]] = [[] for _ in texts]
        evs: list[list[int]] = [[] for _ in texts]
        vts: list[list[int]] = [[] for _ in texts]
        dvs: list[list[str]] = [[] for _ in texts]
        last_end = [0] * len(texts)  # per row, relative

        for m in self.pattern.finditer(joined):
            row = int(np.searchsorted(row_starts, m.start(), side="right")) - 1
            rel_b = m.start() - row_starts[row]
            rel_e = m.end() - row_starts[row]
            if rel_e > len(texts[row]):  # spans the sentinel; cannot happen
                continue
            tok = m.group(0)
            rule = self.rule_names[int(m.lastgroup[1:])]
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
        return pa.table(cols)
