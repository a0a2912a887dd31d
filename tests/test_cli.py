"""``python -m wikitfidf_spark`` — the dothething CLI shape
(cmd/dothething/dothething.go:13-50): flags drive S2/S3/S4 + the
artifact chain end-to-end."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest

from wikitfidf_spark.__main__ import main


@pytest.fixture(scope="module")
def revisions_parquet(spark, tmp_path_factory):
    """One row per REVISION: 3 pages x several revisions, one page
    outside the special list, one revision outside the date range."""
    rows = [
        # page 1: 3 revs in range (rev limit 2 keeps ts 2020-03/2020-02)
        (1, "en", "2020-01-10", "oldest_token shared_token"),
        (1, "en", "2020-02-10", "middle_token shared_token"),
        (1, "en", "2020-03-10", "newest_token shared_token"),
        # page 2: 1 in range, 1 before the window
        (2, "en", "2019-06-01", "prehistoric_token"),
        (2, "en", "2020-02-20", "modern_token shared_token"),
        # page 3: NOT in the special list
        (3, "en", "2020-02-25", "excluded_token"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ts string, text string")
    p = str(tmp_path_factory.mktemp("cli_src") / "revisions.parquet")
    df.write.parquet(p)
    return p


def test_cli_revisions_pipeline(spark, revisions_parquet, tmp_path):
    out = str(tmp_path / "cli_out")
    rc = main([
        "--lang", "en", "-d", out, "--input", revisions_parquet,
        "--revisions", "-s", "2020-01-01", "-e", "2021-01-01",
        "--special-list", "1-2", "--rev", "2",
        "--top-pages", "50", "--top-words", "100", "--top-topic", "100",
        "--no-profile",
    ])
    assert rc == 0
    from wikitfidf_spark.exporter import Exporter

    exp = Exporter.from_dir(spark, out)
    gw = {r["term"]: r["cf"] for r in exp.global_words().collect()}
    # S2: page 3 filtered out entirely
    assert "excluded_token" not in gw
    # S3: the 2019 revision never entered
    assert "prehistoric_token" not in gw
    # S4 (--rev 2): page 1 keeps only its 2 newest revisions
    assert "oldest_token" not in gw
    assert gw["newest_token"] == 1 and gw["middle_token"] == 1
    # ordered concat: both kept revisions fold into ONE page text
    assert gw["shared_token"] == 3  # 2 from page 1 + 1 from page 2
    pages = {r["doc_id"] for r in exp.pages().collect()}
    assert pages == {1, 2}


def test_cli_compat_mode(spark, revisions_parquet, tmp_path):
    out = str(tmp_path / "cli_compat")
    rc = main([
        "--lang", "en", "-d", out, "--input", revisions_parquet,
        "--revisions", "--special-list", "1-2", "--no-profile", "--compat",
    ])
    assert rc == 0
    f = glob.glob(os.path.join(out, "GlobalWords_topN.json.gz"))
    assert f
    gw = json.load(gzip.open(f[0]))
    assert "excluded_token" not in gw and "shared_token" in gw


def test_cli_profile_normalization(spark, tmp_path):
    """Without --no-profile the language's stopwords drop (the
    reference always normalizes per language)."""
    rows = [(1, "en", "2020-01-01", "the keyword_alpha and keyword_beta")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ts string, text string")
    src = str(tmp_path / "src.parquet")
    df.write.parquet(src)
    out = str(tmp_path / "out_profile")
    rc = main(["--lang", "en", "-d", out, "--input", src])
    assert rc == 0
    from wikitfidf_spark.exporter import Exporter

    gw = {r["term"]: r["cf"] for r in Exporter.from_dir(spark, out).global_words().collect()}
    assert "the" not in gw and "and" not in gw
    assert gw["keyword_alpha"] == 1


def test_cli_partial_limits_rejected():
    """newBuilder parity (wikitfidf.go:66-69): a partially-set Limits
    struct is invalid — all four flags or none."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="invalid limits"):
        main([
            "--lang", "en", "-d", "/tmp/never", "--input", "/tmp/never",
            "--rev", "2",
        ])


def test_cli_date_range_without_revisions(spark, tmp_path):
    """-s/-e must filter even on a pre-reduced documents table — the
    reference always applies the date range (review finding)."""
    rows = [
        (1, "en", "2019-01-01", "ancient_doc_token"),
        (2, "en", "2020-06-01", "current_doc_token"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ts string, text string")
    src = str(tmp_path / "docs.parquet")
    df.write.parquet(src)
    out = str(tmp_path / "out_range")
    rc = main(["--lang", "en", "-d", out, "--input", src,
               "-s", "2020-01-01", "--no-profile"])
    assert rc == 0
    from wikitfidf_spark.exporter import Exporter

    gw = {r["term"] for r in Exporter.from_dir(spark, out).global_words().collect()}
    assert "ancient_doc_token" not in gw and "current_doc_token" in gw


def test_cli_revision_selection_deterministic_on_ts_ties(spark, tmp_path):
    """Tied timestamps keep a deterministic revision (text tiebreak) and
    the page topic comes from the newest kept revision, not first()."""
    rows = [
        (1, "old_topic", "2020-01-01", "alpha_text_token"),
        (1, "old_topic", "2020-01-01", "beta_text_token"),
        (1, "new_topic", "2020-06-01", "newest_text_token"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ts string, text string")
    src = str(tmp_path / "ties.parquet")
    df.write.parquet(src)
    from wikitfidf_spark.exporter import Exporter

    seen = set()
    for i in range(2):
        out = str(tmp_path / f"out_tie_{i}")
        rc = main(["--lang", "en", "-d", out, "--input", src, "--revisions",
                   "--rev", "2", "--top-pages", "50", "--top-words", "100",
                   "--top-topic", "100", "--no-profile"])
        assert rc == 0
        exp = Exporter.from_dir(spark, out)
        gw = frozenset(r["term"] for r in exp.global_words().collect())
        topics = {r["lang"] for r in exp.topics().collect()}
        assert topics == {"new_topic"}  # topic of the NEWEST revision
        seen.add(gw)
    assert len(seen) == 1  # identical artifacts across runs
    # rev=2 keeps the newest + the ts-tie winner (asc text: alpha)
    assert "newest_text_token" in next(iter(seen))
    assert "alpha_text_token" in next(iter(seen))
    assert "beta_text_token" not in next(iter(seen))
