"""Repo hygiene lints.

Born from the r9 `_y4m` incident: a test addendum added a module-level
helper whose name shadowed an earlier helper with a DIFFERENT signature,
silently breaking that helper's pre-existing call sites (pytest red at
HEAD, caught only by the judge). Python allows re-definition without a
whisper, so the suite now refuses duplicate module-level def/class names
in any test module.
"""

from __future__ import annotations

import ast
import pathlib

TESTS_DIR = pathlib.Path(__file__).parent


def test_no_duplicate_module_level_names_in_tests():
    offenders = []
    for path in sorted(TESTS_DIR.glob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if node.name in seen:
                    offenders.append(
                        f"{path.name}:{node.lineno} `{node.name}` shadows "
                        f"the definition at line {seen[node.name]}")
                seen[node.name] = node.lineno
    assert not offenders, (
        "duplicate module-level helper names (later def silently shadows "
        "the earlier one — the r9 _y4m bug class):\n" + "\n".join(offenders))
