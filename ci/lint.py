#!/usr/bin/env python
"""Dependency-free lint gate (the reference ships flake8/mypy/bandit configs —
/root/reference/ci/build_and_test.sh; this environment has no lint packages
installed, so the gate is a stdlib AST linter wired next to pytest via
tests/test_lint.py).

Checks (a pyflakes-subset chosen for signal, not style):
  F401  unused import            (skipped in __init__.py re-export surfaces)
  F403  wildcard import
  E722  bare except
  B006  mutable default argument
  F632  `is` comparison with a literal
  E711  `== None` / `!= None` comparison
  F541  f-string without placeholders
  F631  assert on a non-empty tuple (always true)
  F811  duplicate top-level def/class name

Suppress a line with a trailing ``# noqa`` comment.
Run: ``python ci/lint.py`` (exit 1 on findings).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TARGETS = [
    "transformers4rec_tpu",
    "tests",
    "examples",
    "benchmarks",
    "serving" if (REPO / "serving").is_dir() else None,
    "bench.py",
    "__graft_entry__.py",
    "ci",
]


def _py_files():
    for t in TARGETS:
        if t is None:
            continue
        p = REPO / t
        if p.is_file():
            yield p
        elif p.is_dir():
            yield from sorted(p.rglob("*.py"))


class Visitor(ast.NodeVisitor):
    def __init__(self, path: Path, src_lines):
        self.path = path
        self.lines = src_lines
        self.problems = []
        self.imports = {}  # name -> (lineno, stated)
        self.used = set()
        self.is_init = path.name == "__init__.py"
        self.top_defs = {}

    def _noqa(self, lineno: int) -> bool:
        try:
            return "noqa" in self.lines[lineno - 1]
        except IndexError:
            return False

    def add(self, code: str, lineno: int, msg: str):
        if not self._noqa(lineno):
            self.problems.append((self.path, lineno, code, msg))

    # ---------------------------------------------------------- imports
    def visit_Import(self, node):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports.setdefault(name, (node.lineno, a.name))
        self.generic_visit(node)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                self.add("F403", node.lineno,
                         f"wildcard import from {node.module}")
                continue
            name = a.asname or a.name
            self.imports.setdefault(name, (node.lineno, a.name))
        self.generic_visit(node)

    def visit_Name(self, node):
        self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    # ------------------------------------------------------------ checks
    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.add("E722", node.lineno, "bare except")
        self.generic_visit(node)

    def _check_defaults(self, node):
        for d in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.add("B006", d.lineno, "mutable default argument")

    def visit_FunctionDef(self, node):
        self._check_defaults(node)
        self._register_top(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node):
        self._check_defaults(node)
        self._register_top(node)
        self.generic_visit(node)

    def visit_ClassDef(self, node):
        self._register_top(node)
        self.generic_visit(node)

    def _register_top(self, node):
        if node.col_offset == 0:
            prev = self.top_defs.get(node.name)
            if prev is not None and not self._noqa(node.lineno):
                # decorator stacking (@overload/@property.setter) is not
                # top-level duplication we care about; crude guard: ignore
                # names whose first def had any decorator
                if not getattr(prev, "decorator_list", None) and not getattr(
                    node, "decorator_list", None
                ):
                    self.add("F811", node.lineno,
                             f"redefinition of {node.name!r} "
                             f"(first at line {prev.lineno})")
            self.top_defs.setdefault(node.name, node)

    def visit_Compare(self, node):
        for op, right in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Is, ast.IsNot)) and isinstance(
                right, ast.Constant
            ) and right.value is not None and not isinstance(
                right.value, bool
            ):
                self.add("F632", node.lineno, "`is` comparison with a literal")
            if isinstance(op, (ast.Eq, ast.NotEq)) and (
                isinstance(right, ast.Constant) and right.value is None
            ):
                self.add("E711", node.lineno, "use `is None` / `is not None`")
        self.generic_visit(node)

    def visit_FormattedValue(self, node):
        # don't recurse into format_spec: `{x:.4f}` parses as a nested
        # placeholder-free JoinedStr in 3.12+ (would false-positive F541)
        self.visit(node.value)

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.add("F541", node.lineno, "f-string without placeholders")
        self.generic_visit(node)

    def visit_Assert(self, node):
        if isinstance(node.test, ast.Tuple) and node.test.elts:
            self.add("F631", node.lineno,
                     "assert on a non-empty tuple is always true")
        self.generic_visit(node)

    # ----------------------------------------------------------- finalize
    def finalize(self, tree):
        if self.is_init:
            return  # __init__.py imports are the public re-export surface
        # names referenced in __all__ count as used
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Assign)
                and any(
                    isinstance(t, ast.Name) and t.id == "__all__"
                    for t in node.targets
                )
                and isinstance(node.value, (ast.List, ast.Tuple))
            ):
                for elt in node.value.elts:
                    if isinstance(elt, ast.Constant) and isinstance(
                        elt.value, str
                    ):
                        self.used.add(elt.value)
        for name, (lineno, stated) in self.imports.items():
            if name not in self.used and not self._noqa(lineno):
                self.problems.append(
                    (self.path, lineno, "F401",
                     f"{stated!r} imported but unused")
                )


def lint_file(path: Path):
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(path, e.lineno or 0, "E999", f"syntax error: {e.msg}")]
    v = Visitor(path, src.splitlines())
    v.visit(tree)
    v.finalize(tree)
    return v.problems


def main() -> int:
    problems = []
    n = 0
    for f in _py_files():
        n += 1
        problems.extend(lint_file(f))
    for path, lineno, code, msg in sorted(problems):
        rel = path.relative_to(REPO)
        print(f"{rel}:{lineno}: {code} {msg}")
    print(f"lint: {n} files, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
