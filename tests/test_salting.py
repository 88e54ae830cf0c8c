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
