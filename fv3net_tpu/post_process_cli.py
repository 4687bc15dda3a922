"""post-process-run CLI (reference: workflows/post_process_run/setup.py:22
console script -> fv3post.post_process)."""
from __future__ import annotations

import argparse
import json
import sys

from fv3net_tpu.post_process import post_process


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="post-process-run")
    p.add_argument("rundir")
    p.add_argument("destination")
    p.add_argument("--names", nargs="*", default=None)
    args = p.parse_args(argv)
    written = post_process(args.rundir, args.destination, names=args.names)
    print(json.dumps({"written": written}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
