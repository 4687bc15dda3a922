"""``runfv3`` CLI (reference: runtime/segmented_run/cli.py:31-103 —
subcommands create / append / run-native)."""
from __future__ import annotations

import argparse
import sys

import yaml


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("runfv3")
    sub = parser.add_subparsers(dest="command", required=True)

    p_create = sub.add_parser("create", help="initialize a run directory")
    p_create.add_argument("url")
    p_create.add_argument("config", help="path to config yaml")

    p_append = sub.add_parser("append", help="run the next segment")
    p_append.add_argument("url")
    p_append.add_argument(
        "--segments", type=int, default=1, help="number of segments to run"
    )
    p_append.add_argument(
        "--profile",
        action="store_true",
        help="capture a jax.profiler device trace to <segment>/profile",
    )

    p_native = sub.add_parser(
        "run-native", help="create + run one segment in place"
    )
    p_native.add_argument("config")
    p_native.add_argument("url")

    args = parser.parse_args(argv)
    from fv3net_tpu.runtime.segmented_run import api

    if args.command == "create":
        with open(args.config) as f:
            config = yaml.safe_load(f)
        api.create(args.url, config)
    elif args.command == "append":
        for _ in range(args.segments):
            out = api.append_segment(args.url, profile=args.profile)
            print(out)
    elif args.command == "run-native":
        with open(args.config) as f:
            config = yaml.safe_load(f)
        api.create(args.url, config)
        out = api.append_segment(args.url)
        print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
