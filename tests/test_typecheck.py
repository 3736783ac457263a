"""Static checks: a mypy gate (reference CI parity) that activates
when the tool is installed, plus an always-on stdlib fallback that
compiles every module and asserts annotation coverage — the strongest
static guarantee available without third-party tools in this
container."""

from __future__ import annotations

import ast
import compileall
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parents[1] / "local_lakehouse_spark"


def test_mypy_clean_if_available():
    mypy_api = pytest.importorskip(
        "mypy.api", reason="mypy not installed in this container"
    )
    stdout, stderr, status = mypy_api.run(
        ["--config-file", str(PKG.parent / "mypy.ini")]
    )
    assert status == 0, f"mypy failures:\n{stdout}\n{stderr}"


def test_package_compiles():
    assert compileall.compile_dir(str(PKG), quiet=2, force=True)


def test_public_functions_annotated():
    """Every public module-level function in the package declares
    parameter annotations (the repo's type-hint discipline; keeps the
    future mypy run meaningful)."""
    missing = []
    for path in PKG.rglob("*.py"):
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            if node.name.startswith("_"):
                continue
            args = node.args.args + node.args.kwonlyargs
            un = [a.arg for a in args if a.annotation is None and a.arg != "self"]
            if un:
                missing.append(f"{path.name}:{node.name}({', '.join(un)})")
    # queries.py/queries_ext.py query functions deliberately use the
    # terse (spark, sf) signature — the registry types them.
    missing = [
        m for m in missing
        if not m.startswith(("queries.py", "queries_ext.py"))
    ]
    assert not missing, f"unannotated public functions: {missing}"
