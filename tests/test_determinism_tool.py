"""Planted-fixture tests for tools/determinism_check.py's frame hashing —
the hash must be invariant to row order and column order (scheduling may
permute both) and sensitive to any rendered-value change (that's the split
the gate exists to catch)."""

import importlib.util
import os

import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "determinism_check",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "determinism_check.py"))
det = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(det)


def test_hash_invariant_to_row_and_column_order():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = pd.DataFrame({"y": ["c", "a", "b"], "x": [3, 1, 2]})
    assert det.frame_hash(a) == det.frame_hash(b)


def test_hash_sensitive_to_value_and_render_changes():
    a = pd.DataFrame({"x": [1, 2], "y": [0.5, -0.0]})
    changed = pd.DataFrame({"x": [1, 2], "y": [0.5, 1.0]})
    assert det.frame_hash(a) != det.frame_hash(changed)
    # signed zero renders differently -> different hash (the r5 driver class)
    signed = pd.DataFrame({"x": [1, 2], "y": [0.5, 0.0]})
    assert det.frame_hash(a) != det.frame_hash(signed)
    # int vs float dtype renders differently -> different hash (the r4 class)
    as_int = pd.DataFrame({"x": [1, 2], "y": [1, 2]})
    as_flt = pd.DataFrame({"x": [1, 2], "y": [1.0, 2.0]})
    assert det.frame_hash(as_int) != det.frame_hash(as_flt)


def test_hash_distinguishes_column_names():
    a = pd.DataFrame({"x": [1]})
    b = pd.DataFrame({"z": [1]})
    assert det.frame_hash(a) != det.frame_hash(b)
