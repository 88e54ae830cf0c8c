"""Skew handling: hot-key detection, salted aggregation, regex→wildcard."""

import pytest


def test_regex_to_wildcard():
    from clp_core_ray.pipelines.search import regex_to_wildcard

    assert regex_to_wildcard("^ERROR .* timeout$") == "ERROR * timeout"
    assert regex_to_wildcard("a.c") == "*a?c*"
    assert regex_to_wildcard("^x\\.y$") == "x.y"
    assert regex_to_wildcard("^a.+b$") == "a?*b"
    for bad in ("[abc]", "a|b", "(xy)", "a{2}", "a\\d"):
        with pytest.raises(ValueError):
            regex_to_wildcard(bad)


def test_regex_search_equivalence(ray_session, tmp_path):
    """Search by regex = translate to wildcard, then the normal search path."""
    from clp_core_ray.pipelines.compress import compress
    from clp_core_ray.pipelines.search import regex_to_wildcard, search_archive

    out = str(tmp_path / "arch")
    compress(0.0005, out)
    wq = regex_to_wildcard("^ERROR .* timeout")
    hits = search_archive(out, wq).to_pandas()
    assert len(hits) > 0
    assert hits["text"].str.match("ERROR .* timeout").all()


def test_hot_key_detection_and_salted_count(ray_session):
    from clp_core_ray.pipelines.aggregate import count_by, count_by_salted, detect_hot_keys
    from clp_core_ray.sources.transcripts import read_transcripts

    ds = read_transcripts(0.001)
    hot = detect_hot_keys(ds, "conv_id", sample_frac=0.3, hot_share=0.02)
    assert len(hot) >= 1  # the generator plants ~5%-of-turns conversations

    plain = count_by(read_transcripts(0.001), "conv_id").to_pandas()
    salted = count_by_salted(read_transcripts(0.001), "conv_id").to_pandas()
    p = plain.sort_values("conv_id").reset_index(drop=True)
    s = salted.sort_values("conv_id").reset_index(drop=True)
    assert (p["conv_id"] == s["conv_id"]).all()
    assert (p["cnt"].astype(int) == s["cnt"].astype(int)).all()
    # the hot conversations really are hot
    top = p.sort_values("cnt", ascending=False).iloc[0]
    assert top["cnt"] > p["cnt"].median() * 10


def test_archive_tags(ray_session, tmp_path, capsys):
    """Tag-filtered archive selection (the package metadata-DB tag column):
    compress two archives with different tags; searches with --tag read only
    the matching archive."""
    import json as _json

    from clp_core_ray.cli import main as cli_main
    from clp_core_ray.pipelines.compress import compress
    from clp_core_ray.pipelines.search import search_archives, select_archives
    from clp_core_ray.sources.transcripts import read_transcripts

    base = tmp_path / "tagged"
    compress(0.0005, str(base / "a1"), tags=["prod", "eu"])
    compress(0.0005, str(base / "a2"), tags=["staging"])

    assert len(select_archives(str(base))) == 2
    assert select_archives(str(base), tags=["prod"]) == [str(base / "a1")]
    assert select_archives(str(base), tags=["staging", "eu"]) and \
        len(select_archives(str(base), tags=["staging", "eu"])) == 2
    assert select_archives(str(base), tags=["nope"]) == []

    n_one = search_archives(str(base), "ERROR*timeout",
                            tags=["staging"]).count()
    n_all = search_archives(str(base), "ERROR*timeout").count()
    assert n_all == 2 * n_one > 0

    # CLI: --tag on search prunes; single-archive target honors it too
    rc = cli_main(["search", "--archive", str(base), "--query",
                   "ERROR*timeout*", "--tag", "prod", "--count"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["count"] == n_one
    rc = cli_main(["search", "--archive", str(base / "a1"), "--query",
                   "ERROR*timeout*", "--tag", "staging", "--count"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["count"] == 0  # a1 is not tagged staging


def test_zorder_layout_prunes_both_dims(ray_session, tmp_path):
    """Z-order layout: a (user ∧ time) box query touches a small file
    fraction; both single-dimension queries ALSO prune (the property a
    one-column sort cannot give); results equal the brute-force filter."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.layout import read_pruned, write_zordered

    rng = np.random.default_rng(61)
    n = 120_000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 4096, n)),
        "ts": pa.array(rng.integers(0, 1 << 40, n),
                       type=pa.timestamp("us")),
        "v": pa.array(rng.normal(0, 1, n)),
    })
    out = str(tmp_path / "z")
    write_zordered(rd.from_arrow(t).repartition(8), out,
                   col_a="user_id", col_b="ts",
                   target_rows_per_file=2000)
    ub = (1000, 1127)                      # 1/32 of user space
    tb = (100 << 30, 132 << 30)            # ~1/32 of time space

    def brute(ub_=None, tb_=None):
        u = np.asarray(t.column("user_id"))
        s = np.asarray(t.column("ts")).view("int64")
        m = np.ones(n, dtype=bool)
        if ub_:
            m &= (u >= ub_[0]) & (u <= ub_[1])
        if tb_:
            m &= (s >= tb_[0]) & (s <= tb_[1])
        return int(m.sum())

    ds, nf, total = read_pruned(out, a_between=ub, b_between=tb)
    got = sum(len(b["v"]) for b in ds.iter_batches(batch_format="pyarrow"))
    assert got == brute(ub, tb)
    assert nf / total < 0.30, (nf, total)  # box query: strong pruning
    for kw, want in ((dict(a_between=ub), brute(ub_=ub)),
                     (dict(b_between=tb), brute(tb_=tb))):
        ds1, nf1, _ = read_pruned(out, **kw)
        got1 = sum(len(b["v"])
                   for b in ds1.iter_batches(batch_format="pyarrow"))
        assert got1 == want
        assert nf1 / total < 0.60, (kw, nf1, total)  # single dim prunes too
