from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikitfidf_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="wikitfidf_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    """Small deterministic code_files fixture (FIXTURES.md F1)."""
    from wikitfidf_spark.corpus import make_code_files

    return make_code_files(spark, n_docs=300, seed=42).cache()


@pytest.fixture(scope="session")
def corpus_pdf():
    from wikitfidf_spark.corpus import make_code_files_pdf

    return make_code_files_pdf(n_docs=300, seed=42)
