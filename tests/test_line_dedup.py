"""keep_first_by_content + line_dedup vs brute-force references."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clp_core_ray.functions.dedup import keep_first_by_content, line_dedup


def _collect(ds):
    tabs = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tabs) if tabs else None


def test_keep_first_exact(ray_session):
    import ray.data as rd

    rows = [
        ("c1", 0, "alpha"), ("c1", 1, "beta"), ("c1", 2, "alpha"),
        ("c2", 0, "beta"), ("c2", 1, "gamma"), ("c0", 5, "alpha"),
        ("c3", 0, "delta"), ("c3", 1, "delta"),
    ]
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "text": pa.array([r[2] for r in rows]),
    })
    out = _collect(keep_first_by_content(
        rd.from_arrow(tbl).repartition(3),
        order_cols=("conv_id", "turn_idx")))
    got = sorted(zip(out.column("conv_id").to_pylist(),
                     out.column("turn_idx").to_pylist()))
    # first site per content, lexicographic (conv_id, turn_idx)
    assert got == [("c0", 5), ("c1", 1), ("c2", 1), ("c3", 0)]


def test_keep_first_normalized(ray_session):
    import ray.data as rd

    texts = ["ERROR code 17", "error code 99", "WARN disk 3", "warn DISK 4"]
    tbl = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts),
    })

    def norm(col):
        return pc.replace_substring_regex(pc.utf8_lower(col), "[0-9]+", "#")

    out = _collect(keep_first_by_content(
        rd.from_arrow(tbl).repartition(2),
        order_cols=("doc_id",), normalize=norm))
    ids = sorted(out.column("doc_id").to_pylist())
    assert ids == [0, 2]
    # originals ride through untouched, no _norm column
    assert set(out.column_names) == {"doc_id", "text"}
    assert "ERROR code 17" in out.column("text").to_pylist()


def _ref_line_dedup(docs, min_len=1, sep="\n"):
    seen = {}
    for did in sorted(docs):
        for i, ln in enumerate(docs[did].split(sep)):
            if len(ln) >= min_len and ln not in seen:
                seen[ln] = (did, i)
    out = {}
    for did, text in docs.items():
        kept = [ln for i, ln in enumerate(text.split(sep))
                if len(ln) < min_len or seen.get(ln) == (did, i)]
        out[did] = sep.join(kept)
    return out


def test_line_dedup_matches_reference(ray_session):
    import ray.data as rd

    docs = {
        0: "shared header line\nunique to zero\n\nfooter line",
        1: "shared header line\nunique to one\n\nfooter line",
        2: "unique to two\nshared header line",
        3: "shared header line",          # loses its only line
        4: "",                             # stays empty
        5: "a\nb\na",                      # intra-doc dup
    }
    tbl = pa.table({
        "doc_id": pa.array(sorted(docs), type=pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)]),
    })
    out = _collect(line_dedup(rd.from_arrow(tbl).repartition(3)))
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("text").to_pylist()))
    assert got == _ref_line_dedup(docs)
    # explicit spot checks: keep-first, exempt blanks survive everywhere
    assert got[0] == "shared header line\nunique to zero\n\nfooter line"
    assert got[1] == "unique to one\n"
    assert got[3] == ""
    assert got[5] == "a\nb"


def test_line_dedup_min_len_exemption(ray_session):
    import ray.data as rd

    docs = {0: "xx\nlong enough line", 1: "xx\nlong enough line"}
    tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array([docs[0], docs[1]])})
    out = _collect(line_dedup(rd.from_arrow(tbl), min_len=5))
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("text").to_pylist()))
    assert got == _ref_line_dedup(docs, min_len=5)
    assert got[1] == "xx"  # short line exempt, long line deduped


def test_edit_distance_pairs_exact(ray_session):
    """Length-band blocking must lose no qualifying pair; DP verify must
    equal brute-force Levenshtein — random strings, many bands."""
    import itertools

    import numpy as np
    import ray.data as rd

    from clp_core_ray.functions.dedup import edit_distance_pairs

    rng = np.random.default_rng(5)
    pool = ["".join(rng.choice(list("abcd"), size=rng.integers(1, 12)))
            for _ in range(120)]
    ds = rd.from_arrow(pa.table({"t": pa.array(pool * 2)})).repartition(5)
    out = edit_distance_pairs(ds, text_col="t", max_dist=2).to_pandas()
    got = {(r.name_a, r.name_b): r.dist for r in out.itertuples()}

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[:], i
            for j, cb in enumerate(b, 1):
                d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
        return d[len(b)]

    want = {}
    for a, b in itertools.combinations(sorted(set(pool)), 2):
        dd = lev(a, b)
        if dd <= 2:
            want[(a, b)] = dd
    assert got == want
