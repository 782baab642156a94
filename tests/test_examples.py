"""Every examples/ script must RUN end to end on the smoke fixture —
they are the repo's demonstration surface, chained from registered
keys, and a key rename or schema change that breaks one should fail
CI, not a reader. Each main() prints a report and returns None; the
scripts share the session fixture's JVM via get_spark()'s
getOrCreate, so the sweep costs seconds per script, not a JVM each."""

import importlib
import os
import sys

import pytest

EXAMPLES = [
    "quickstart",
    "llm_pipeline",
    "retrieval_pipeline",
    "streaming_pipeline",
    "corpus_health",
    "eval_report",
    "metrics_health",
    "experiment_design",
    "market_indicators",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, name, capsys, monkeypatch):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "examples"))
    try:
        mod = importlib.import_module(name)
        monkeypatch.setattr(sys, "argv", [f"{name}.py"])
        mod.main()
    finally:
        sys.path.pop(0)
    out = capsys.readouterr().out
    assert "== done" in out or out.strip(), name
