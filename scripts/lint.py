#!/usr/bin/env python
"""Self-contained lint (no third-party linters exist in this image).

Mirrors the checks the reference enforces through pre-commit
(/root/reference/.pre-commit-config.yaml: flake8, pep8-naming, numpy
docstrings) with a stdlib AST implementation:

  E501  line longer than 79 characters
  W291  trailing whitespace
  W191  tab indentation
  F401  imported name never used (skipped in __init__.py re-export files)
  N801  class name not CapWords
  N802  function name not snake_case (ast.NodeVisitor visit_* exempt)
  D100  missing module docstring
  D101  missing public class docstring (library package only)
  D102  missing public function/method docstring (library package only;
        nested closures exempt)

Run: python scripts/lint.py   (exit 1 on any finding)
"""

import ast
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = [
    'occuspytial_tpu', 'tests', 'benchmarks', 'scripts',
    'bench.py', '__graft_entry__.py', 'setup.py',
]
MAX_LEN = 79
SNAKE = re.compile(r'^_{0,2}[a-z][a-z0-9_]*_{0,2}$')
CAPWORDS = re.compile(r'^_?[A-Z][A-Za-z0-9]*$')


def iter_files():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        elif p.is_dir():
            yield from sorted(p.rglob('*.py'))


class Checker(ast.NodeVisitor):
    """Collect naming, docstring and unused-import findings."""

    def __init__(self, path, tree):
        self.path = path
        self.findings = []
        self.is_test = path.name.startswith('test_')
        self.is_init = path.name == '__init__.py'
        self.is_library = 'occuspytial_tpu' in path.parts
        self.imported = {}   # name -> lineno
        self.used = set()
        self._depth = 0
        self._in_class = 0
        self._func_depth = 0
        if not ast.get_docstring(tree):
            self.findings.append((1, 'D100 missing module docstring'))
        self.generic_visit(tree)

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split('.')[0]
            self.imported[name] = node.lineno

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == '*':
                continue
            self.imported[a.asname or a.name] = node.lineno

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    def visit_ClassDef(self, node):
        if not CAPWORDS.match(node.name):
            self.findings.append(
                (node.lineno, f'N801 class name {node.name!r} not CapWords')
            )
        if (self.is_library and not node.name.startswith('_')
                and not ast.get_docstring(node)):
            self.findings.append(
                (node.lineno, f'D101 missing docstring: class {node.name}')
            )
        self._in_class += 1
        self.generic_visit(node)
        self._in_class -= 1

    def _visit_func(self, node):
        if not SNAKE.match(node.name) and not node.name.startswith('visit_'):
            self.findings.append(
                (node.lineno,
                 f'N802 function name {node.name!r} not snake_case')
            )
        # docstrings: only the library's public surface — top-level
        # functions and direct class methods; closures are exempt
        toplevel = self._func_depth == 0
        public = not node.name.startswith('_')
        if (self.is_library and public and toplevel
                and not ast.get_docstring(node)):
            self.findings.append(
                (node.lineno, f'D102 missing docstring: def {node.name}')
            )
        self._depth += 1
        self._func_depth += 1
        self.generic_visit(node)
        self._func_depth -= 1
        self._depth -= 1

    visit_FunctionDef = _visit_func
    visit_AsyncFunctionDef = _visit_func

    def unused_imports(self):
        if self.is_init:  # re-export modules
            return []
        return [
            (ln, f'F401 {name!r} imported but unused')
            for name, ln in sorted(self.imported.items(), key=lambda x: x[1])
            if name not in self.used and name != '__future__'
        ]


def check_file(path):
    src = path.read_text()
    findings = []
    for i, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LEN:
            findings.append((i, f'E501 line too long ({len(line)})'))
        if line != line.rstrip():
            findings.append((i, 'W291 trailing whitespace'))
        if line.startswith('\t'):
            findings.append((i, 'W191 tab indentation'))
    try:
        tree = ast.parse(src)
    except SyntaxError as exc:
        return [(exc.lineno or 0, f'E999 {exc.msg}')]
    checker = Checker(path, tree)
    findings += checker.findings + checker.unused_imports()
    return sorted(findings)


def main():
    total = 0
    for path in iter_files():
        for lineno, msg in check_file(path):
            rel = path.relative_to(ROOT)
            print(f'{rel}:{lineno}: {msg}')
            total += 1
    if total:
        print(f'\n{total} finding(s)')
        return 1
    print('lint: clean')
    return 0


if __name__ == '__main__':
    sys.exit(main())
