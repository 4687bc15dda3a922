"""The dependency-free static checker (make typecheck gate)."""
import subprocess
import sys


def _run(code: str, tmp_path, strict=False):
    f = tmp_path / "mod.py"
    f.write_text(code)
    cmd = [sys.executable, "tools/staticcheck.py", str(f)]
    if strict:
        cmd.insert(2, "--strict")
    r = subprocess.run(cmd, capture_output=True, text=True)
    return r.returncode, r.stdout


def test_catches_undefined_name(tmp_path):
    rc, out = _run("def f():\n    return not_defined\n", tmp_path)
    assert rc == 1 and "undefined name 'not_defined'" in out


def test_catches_bad_arity_and_keyword(tmp_path):
    code = "def f(a, b=1):\n    return a\nf(1, 2, 3)\nf(1, nope=2)\n"
    rc, out = _run(code, tmp_path)
    assert rc == 1
    assert "too many positional" in out and "unknown keyword" in out


def test_catches_duplicate_def(tmp_path):
    rc, out = _run("def g():\n    pass\ndef g():\n    pass\n", tmp_path)
    assert rc == 1 and "duplicate definition" in out


def test_clean_module_passes(tmp_path):
    code = (
        "import os\n\n"
        "def f(a, *rest, **kw):\n"
        "    return os.path.join(a, *rest)\n\n"
        "x = [i for i in range(3)]\n"
        "f('a', 'b', c=1)\n"
    )
    rc, out = _run(code, tmp_path)
    assert rc == 0, out


def test_strict_flags_unused_import(tmp_path):
    rc, out = _run("import json\nx = 1\n", tmp_path, strict=True)
    assert rc == 1 and "unused import 'json'" in out


def test_repo_tree_is_clean():
    r = subprocess.run(
        [sys.executable, "tools/staticcheck.py", "fv3net_tpu",
         "__graft_entry__.py", "bench.py"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout
