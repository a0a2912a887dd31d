"""Master-URL resolution (session.py) — pure logic, no JVM needed.

Regression tests for the empty-env fallback: ``VAR= python job.py``
(unset shell interpolation) exports an EMPTY string, which
``os.environ.get(var, default)`` does NOT replace — both knobs must
treat empty like unset or the builder gets an unparseable master URL
("" or "local[]").
"""

import pytest

from wikitfidf_spark.session import _resolve_master


def test_explicit_arg_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MASTER", "local[2]")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")
    assert _resolve_master("local[7]") == "local[7]"


def test_env_master(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MASTER", "local[2]")
    assert _resolve_master() == "local[2]"


@pytest.mark.parametrize("master_env", [None, ""])
@pytest.mark.parametrize("cpus_env", [None, ""])
def test_empty_env_falls_back_like_unset(monkeypatch, master_env, cpus_env):
    for var, val in (("SPARK_GRAFT_MASTER", master_env), ("SPARK_GRAFT_CPUS", cpus_env)):
        if val is None:
            monkeypatch.delenv(var, raising=False)
        else:
            monkeypatch.setenv(var, val)
    assert _resolve_master() == "local[*]"


def test_cpus_env_shapes_default(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_MASTER", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    assert _resolve_master() == "local[8]"
