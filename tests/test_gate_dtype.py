"""The local oracle gate must have the SAME dtype sensitivity as the
driver's hash compare.  CORRECTNESS_r04 failed two queries whose VALUES
were identical on both sides (engine nullable Int64 / int64 vs oracle
float64 via the DuckDB→pandas path) while scripts/check_oracle.py passed
them with ``check_dtype=False`` — the gate had a blind spot exactly
where the driver's hash did not (VERDICT r4 items 1-3).  These tests pin
the tightened compare: a deliberately-injected Int64-vs-float64 mismatch
must red-flag, and equal-kind frames must still pass.
"""

import importlib.util
import os

import pandas as pd
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "check_oracle.py"),
)
check_oracle = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_oracle)
compare_frames = check_oracle.compare_frames


def test_int64_vs_float64_mismatch_is_flagged():
    # the exact lag_lead_events class: engine nullable Int64, oracle
    # float64 (DuckDB BIGINT-with-NULL through pandas), equal values
    got = pd.DataFrame({"k": [1, 2, 3],
                        "v": pd.array([10, None, 30], dtype="Int64")})
    want = pd.DataFrame({"k": [1, 2, 3],
                         "v": [10.0, float("nan"), 30.0]})
    status = compare_frames(got, want)
    assert status and "dtype kind mismatch" in status[0]


def test_plain_int64_vs_float64_sum_is_flagged():
    # the closeness_parts class: engine int64 sum, oracle HUGEINT→float64
    got = pd.DataFrame({"seed": [0, 1], "total_dist": [5, 7]})
    want = pd.DataFrame({"seed": [0, 1], "total_dist": [5.0, 7.0]})
    status = compare_frames(got, want)
    assert status and "dtype kind mismatch" in status[0]
    assert "'total_dist'" in status[0]


def test_nullable_int64_vs_int64_passes():
    # same kind (i), same nulls — the driver hashes these identically
    got = pd.DataFrame({"v": pd.array([1, 2, 3], dtype="Int64")})
    want = pd.DataFrame({"v": pd.Series([3, 1, 2], dtype="int64")})
    assert compare_frames(got, want) == []


def test_string_dtype_vs_object_passes():
    got = pd.DataFrame({"s": pd.array(["a", "b"], dtype="string")})
    want = pd.DataFrame({"s": ["b", "a"]})
    assert compare_frames(got, want) == []


def test_null_count_mismatch_is_flagged():
    got = pd.DataFrame({"v": pd.array([1, None, 3], dtype="Int64")})
    want = pd.DataFrame({"v": pd.array([1, 2, 3], dtype="Int64")})
    status = compare_frames(got, want)
    assert status and "null count mismatch" in status[0]


def test_value_mismatch_still_flagged():
    got = pd.DataFrame({"v": [1, 2, 3]})
    want = pd.DataFrame({"v": [1, 2, 4]})
    status = compare_frames(got, want)
    assert status and "values differ" in status[0]


def test_equal_frames_order_insensitive():
    got = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    want = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    assert compare_frames(got, want) == []
