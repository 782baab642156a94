"""Gate-fidelity tests for tools/check.py and tools/plan_lint.py.

Round-5 postmortem (VERDICT r5): five oracles with uncast integer
SUM shipped green locally because check.py's canonicalizer rendered
DuckDB's HUGEINT-as-float64 ``7.0`` and Spark's bigint ``7`` as the
same string "7", while the external driver distinguishes them. These
tests pin the hardened gate so the class cannot ship green again.
No SparkSession needed — pure canonicalizer/lint logic.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check import _cell, canon  # noqa: E402
from plan_lint import _first_arg, _window_specs  # noqa: E402


def test_cell_distinguishes_int_from_integral_float():
    # The exact round-5 failure: DuckDB SUM(int)→HUGEINT→float64 7.0
    # vs Spark bigint 7 must NOT canonicalize to the same string.
    assert _cell(7) == "7"
    assert _cell(7.0) == "7.0"
    assert _cell(np.int64(7)) == "7"
    assert _cell(np.float64(7)) == "7.0"
    assert _cell(7.0) != _cell(7)


def test_cell_nonintegral_floats_unchanged():
    assert _cell(0.1) == f"{0.1:.17g}"
    assert _cell(float("nan")) == "NaN"
    assert _cell(None) == "∅"


def test_uncast_integer_sum_oracle_fails_canon():
    # Spark returns bigint; an uncast DuckDB SUM(int) oracle comes
    # back float64. The canonical row sets must differ so check.py
    # reports a VALUES mismatch instead of passing.
    spark_side = pd.DataFrame({"k": ["a", "b"], "total": np.array([7, 9], dtype="int64")})
    oracle_side = pd.DataFrame({"k": ["a", "b"], "total": np.array([7.0, 9.0])})
    _, srows = canon(spark_side)
    _, orows = canon(oracle_side)
    assert srows != orows


def test_dtype_kind_drift_detection_shape():
    # The dtype pre-check in check.py flags {int64, float64} pairs even
    # when a column is all-NULL (values alone can't reveal the drift).
    sdf = pd.DataFrame({"total": pd.array([None], dtype="float64")})
    odf = pd.DataFrame({"total": pd.array([0], dtype="int64")})
    assert {sdf["total"].dtype.kind, odf["total"].dtype.kind} == {"i", "f"}


def test_window_specs_paren_aware():
    # An unpartitioned window ordered by a FUNCTION expression: the
    # old [^)]* regex truncated at md5()'s ')' and missed the ASC.
    text = (
        "Window [row_number() windowspecdefinition(md5(x#5) ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS rn#7]"
    )
    specs = _window_specs(text)
    assert len(specs) == 1
    head = _first_arg(specs[0])
    assert " ASC" in head  # → GLOBW fires


def test_window_specs_partitioned_function_not_flagged():
    # Partition BY a function expression is fine — first top-level arg
    # has no ordering direction and is not a frame.
    text = (
        "windowspecdefinition(md5(x#5), y#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RangeFrame, unboundedpreceding$(), currentrow$()))"
    )
    head = _first_arg(_window_specs(text)[0])
    assert " ASC" not in head and " DESC" not in head
    assert not head.startswith("specifiedwindowframe")


def test_window_specs_finds_multiple():
    text = (
        "windowspecdefinition(a#1, b#2 ASC, frame()) ... "
        "windowspecdefinition(c#3 DESC NULLS LAST, frame())"
    )
    specs = _window_specs(text)
    assert len(specs) == 2
    assert " DESC" in _first_arg(specs[1])
