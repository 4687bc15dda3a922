"""Run the test suite in per-batch pytest processes.

A single whole-suite pytest process segfaults in XLA CPU
backend_compile after a few hundred compiles on this host (observed
twice at tests/test_remap_banded.py in otherwise-green runs; the same
file passes in isolation) — sharding into short-lived processes avoids
the long-lived-process compiler state entirely and gives resumability.

    python scripts/run_suite.py [batch_size] [-k start_file]

Prints a per-batch summary line and exits nonzero if any batch fails.
"""
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    start = None
    if "-k" in sys.argv:
        start = sys.argv[sys.argv.index("-k") + 1]
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if start:
        files = [f for f in files if os.path.basename(f) >= start]
    batches = [files[i : i + batch_size] for i in range(0, len(files), batch_size)]
    failed = []
    t00 = time.time()
    for i, batch in enumerate(batches):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "--no-header", *batch],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        tail = [
            ln
            for ln in r.stdout.strip().splitlines()
            if " passed" in ln or " failed" in ln or " error" in ln
        ]
        summary = tail[-1] if tail else f"rc={r.returncode} (no summary)"
        names = ",".join(os.path.basename(f)[5:-3] for f in batch)
        print(
            f"[{i + 1}/{len(batches)}] {time.time() - t0:6.1f}s "
            f"rc={r.returncode} {summary}  ({names})",
            flush=True,
        )
        if r.returncode != 0:
            failed.append((batch, r.stdout[-4000:], r.stderr[-2000:]))
    print(f"total {time.time() - t00:.0f}s, {len(failed)} failed batches")
    for batch, out, err in failed:
        print("=" * 70)
        print("FAILED:", [os.path.basename(f) for f in batch])
        print(out)
        print(err)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
