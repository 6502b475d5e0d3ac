"""The shipped examples run end-to-end (SURVEY.md §2.8: demos double as
smoke tests in the reference; same here, in-process so jit caches are
shared with the rest of the suite)."""

import importlib
import sys
import os

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")


def _run(module_name):
    sys.path.insert(0, EXAMPLES)
    try:
        mod = importlib.import_module(module_name)
        mod.main()
    finally:
        sys.path.remove(EXAMPLES)


def test_basic_usage_runs(capsys):
    _run("basic_usage")
    assert "tf(" in capsys.readouterr().out


def test_comprehensive_demo_runs(capsys):
    _run("comprehensive_demo")
    out = capsys.readouterr().out
    assert "All API families exercised." in out
    assert "reloaded index answers identically: True" in out


def test_device_and_sharded_queries_runs(capsys):
    _run("device_and_sharded_queries")
    out = capsys.readouterr().out
    assert "codes-in tf: device array" in out
    assert "coverage profile:" in out
    assert "sharded over 8 devices" in out  # conftest pins the 8-dev mesh
