"""Doc-rot guard for the tutorials.

The tutorial workloads are sized for real hardware (50k-site meshes,
multi-tau solves), so running them verbatim in CI is not practical.
Instead, every fenced ``python`` block in ``docs/tutorials/*.md`` is:

1. compiled (syntax must be valid Python),
2. its import statements executed (every module/name must resolve),
3. AST-checked for API drift: attributes used on the ``tdgl`` alias must
   exist on :mod:`tdgl_tpu`, and keyword arguments of ``SolverOptions(...)``
   and ``tdgl.solve(...)`` calls must be real parameters.
"""

import ast
import dataclasses
import inspect
import re
from pathlib import Path

import pytest

import tdgl_tpu

TUTORIALS = sorted(
    (Path(__file__).resolve().parent.parent / "docs" / "tutorials").glob(
        "*.md"
    )
)
assert TUTORIALS, "tutorial files missing"

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path):
    return _BLOCK_RE.findall(path.read_text())


@pytest.mark.parametrize("path", TUTORIALS, ids=lambda p: p.stem)
def test_tutorial_blocks_compile_and_imports_resolve(path):
    blocks = _blocks(path)
    assert blocks, f"{path.name} has no python blocks"
    for i, src in enumerate(blocks):
        code = compile(src, f"{path.name}[block {i}]", "exec")
        assert code is not None
        # Execute only the import statements: every module and name the
        # tutorial tells users to import must exist.
        tree = ast.parse(src)
        imports = [
            node
            for node in ast.walk(tree)
            if isinstance(node, (ast.Import, ast.ImportFrom))
        ]
        ns = {}
        for node in imports:
            exec(  # noqa: S102 - our own docs
                compile(ast.Module(body=[node], type_ignores=[]),
                        f"{path.name}[block {i}]", "exec"),
                ns,
            )


def _alias_names(tree):
    """Names bound to tdgl_tpu by ``import tdgl_tpu as X`` in this block."""
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name == "tdgl_tpu":
                    names.add(alias.asname or "tdgl_tpu")
    return names


@pytest.mark.parametrize("path", TUTORIALS, ids=lambda p: p.stem)
def test_tutorial_api_references_exist(path):
    option_fields = {f.name for f in dataclasses.fields(tdgl_tpu.SolverOptions)}
    solve_params = set(inspect.signature(tdgl_tpu.solve).parameters)
    aliases = set()
    for i, src in enumerate(_blocks(path)):
        tree = ast.parse(src)
        aliases |= _alias_names(tree)
        # Tutorials build on earlier blocks; keep aliases across blocks.
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Attribute)
                and isinstance(node.value, ast.Name)
                and node.value.id in aliases
            ):
                assert hasattr(tdgl_tpu, node.attr) or hasattr(
                    tdgl_tpu.sources, node.attr
                ), (
                    f"{path.name}[block {i}] uses tdgl.{node.attr}, which"
                    " does not exist in tdgl_tpu"
                )
            if isinstance(node, ast.Call):
                fn = node.func
                # SolverOptions(...) keyword args must be real fields.
                if (
                    isinstance(fn, ast.Attribute)
                    and fn.attr == "SolverOptions"
                ) or (isinstance(fn, ast.Name) and fn.id == "SolverOptions"):
                    for kw in node.keywords:
                        assert kw.arg is None or kw.arg in option_fields, (
                            f"{path.name}[block {i}]:"
                            f" SolverOptions(...{kw.arg}=) is not a real"
                            " option"
                        )
                # tdgl.solve(...) keyword args must be real parameters.
                if (
                    isinstance(fn, ast.Attribute)
                    and fn.attr == "solve"
                    and isinstance(fn.value, ast.Name)
                    and fn.value.id in aliases
                ):
                    for kw in node.keywords:
                        assert kw.arg is None or kw.arg in solve_params, (
                            f"{path.name}[block {i}]: solve(...{kw.arg}=)"
                            " is not a real parameter"
                        )
