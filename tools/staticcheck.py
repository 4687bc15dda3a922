"""Dependency-free static checker (the mypy/flake8 role, VERDICT r1 #10).

mypy/pyright/flake8 are not installable in this image (no network, no
pip), so this implements the highest-value static checks directly over
the AST — the error classes that an import-smoke `compileall` cannot
catch:

1. **undefined names**: any Name load that is bound nowhere in the
   module (any scope), not a builtin, and not imported.  Conservative
   (whole-file binding set) so it has ~zero false positives while
   catching genuine typos.
2. **call arity**: calls to functions *defined in the same module* with
   too many positional args or unknown keyword args.
3. **duplicate definitions**: a def/class name bound twice at the same
   scope depth in the same body (usually a copy-paste error).
4. **unused imports** (``--strict``): imported names never referenced.

Usage: python tools/staticcheck.py [--strict] PATH...
Exit code 1 on any finding (the Makefile ``typecheck`` gate).
"""
from __future__ import annotations

import argparse
import ast
import builtins
import sys
from pathlib import Path
from typing import Dict, List, Set

BUILTINS = set(dir(builtins)) | {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__path__", "__class__",
    "__module__", "__qualname__", "__dict__", "__annotations__",
    "WindowsError",
}


class Binder(ast.NodeVisitor):
    """Collect every name bound anywhere in the module."""

    def __init__(self):
        self.bound: Set[str] = set()
        self.imports: Dict[str, int] = {}  # name -> lineno
        self.star_import = False

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.bound.add(name)
            self.imports.setdefault(name, node.lineno)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                self.star_import = True
                continue
            name = a.asname or a.name
            self.bound.add(name)
            self.imports.setdefault(name, node.lineno)

    def visit_FunctionDef(self, node):
        self.bound.add(node.name)
        for arg_list in (
            node.args.args, node.args.posonlyargs, node.args.kwonlyargs
        ):
            for a in arg_list:
                self.bound.add(a.arg)
        if node.args.vararg:
            self.bound.add(node.args.vararg.arg)
        if node.args.kwarg:
            self.bound.add(node.args.kwarg.arg)
        self.generic_visit(node)

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_ClassDef(self, node):
        self.bound.add(node.name)
        self.generic_visit(node)

    def visit_Name(self, node):
        if isinstance(node.ctx, (ast.Store, ast.Del)):
            self.bound.add(node.id)

    def visit_ExceptHandler(self, node):
        if node.name:
            self.bound.add(node.name)
        self.generic_visit(node)

    def visit_Lambda(self, node):
        for arg_list in (
            node.args.args, node.args.posonlyargs, node.args.kwonlyargs
        ):
            for a in arg_list:
                self.bound.add(a.arg)
        if node.args.vararg:
            self.bound.add(node.args.vararg.arg)
        if node.args.kwarg:
            self.bound.add(node.args.kwarg.arg)
        self.generic_visit(node)

    def visit_comprehension(self, node):
        self.generic_visit(node)

    def visit_MatchAs(self, node):  # pattern bindings
        if node.name:
            self.bound.add(node.name)
        self.generic_visit(node)

    def visit_MatchStar(self, node):
        if node.name:
            self.bound.add(node.name)
        self.generic_visit(node)


def _function_signatures(tree) -> Dict[str, ast.arguments]:
    """Module-level function signatures (methods excluded — their calls
    go through attributes)."""
    sigs = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if not any(
                isinstance(d, ast.Name) and d.id
                in ("singledispatch", "overload")
                for d in node.decorator_list
            ):
                sigs[node.name] = (node.args, bool(node.decorator_list))
    return sigs


def check_file(path: Path, strict: bool) -> List[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    binder = Binder()
    binder.visit(tree)
    problems: List[str] = []

    used: Set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            if isinstance(node.ctx, ast.Load):
                used.add(node.id)
                if (
                    node.id not in binder.bound
                    and node.id not in BUILTINS
                    and not binder.star_import
                ):
                    problems.append(
                        f"{path}:{node.lineno}: undefined name "
                        f"'{node.id}'"
                    )
        elif isinstance(node, ast.Attribute):
            pass

    # call arity for same-module top-level functions
    sigs = _function_signatures(tree)
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        if not isinstance(node.func, ast.Name):
            continue
        entry = sigs.get(node.func.id)
        if entry is None:
            continue
        args, decorated = entry
        if decorated:  # decorators may change the signature
            continue
        if any(isinstance(a, ast.Starred) for a in node.args) or any(
            k.arg is None for k in node.keywords
        ):
            continue
        pos_params = [a.arg for a in args.posonlyargs + args.args]
        kw_params = set(pos_params) | {a.arg for a in args.kwonlyargs}
        if len(node.args) > len(pos_params) and args.vararg is None:
            problems.append(
                f"{path}:{node.lineno}: too many positional args to "
                f"{node.func.id}() ({len(node.args)} > {len(pos_params)})"
            )
        if args.kwarg is None:
            for k in node.keywords:
                if k.arg not in kw_params:
                    problems.append(
                        f"{path}:{node.lineno}: unknown keyword "
                        f"'{k.arg}' for {node.func.id}()"
                    )

    # duplicate same-body definitions
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if not isinstance(body, list):
            continue
        seen: Dict[str, int] = {}
        for stmt in body:
            if isinstance(
                stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                if stmt.name in seen and not stmt.decorator_list:
                    problems.append(
                        f"{path}:{stmt.lineno}: duplicate definition of "
                        f"'{stmt.name}' (first at line {seen[stmt.name]})"
                    )
                seen[stmt.name] = stmt.lineno

    if strict and path.name != "__init__.py":
        # __init__.py imports are the package's public re-export surface
        exported = set()
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        if isinstance(node.value, (ast.List, ast.Tuple)):
                            exported |= {
                                e.value
                                for e in node.value.elts
                                if isinstance(e, ast.Constant)
                            }
        for name, lineno in sorted(binder.imports.items()):
            if (
                name not in used
                and name not in exported
                and name != "annotations"
                and not name.startswith("_")
            ):
                problems.append(
                    f"{path}:{lineno}: unused import '{name}'"
                )
    return problems


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs="+")
    p.add_argument("--strict", action="store_true",
                   help="also flag unused imports")
    args = p.parse_args(argv)

    files: List[Path] = []
    for path in args.paths:
        pp = Path(path)
        if pp.is_dir():
            files.extend(sorted(pp.rglob("*.py")))
        else:
            files.append(pp)

    problems: List[str] = []
    for f in files:
        problems.extend(check_file(f, args.strict))
    for msg in problems:
        print(msg)
    print(
        f"staticcheck: {len(files)} files, {len(problems)} problems",
        file=sys.stderr,
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
