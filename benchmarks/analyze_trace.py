"""Offline analysis of a perfetto trace captured by profile_chunk.py.

Computes EXCLUSIVE (self) device time per op by subtracting nested
child spans on the same thread, then aggregates by op-kind prefix so
the ~43k-kernel long tail is attributed to op families rather than
individual HLO instruction names.  Usage:

    python benchmarks/analyze_trace.py [trace_dir] [top_n]
"""
import collections
import glob
import gzip
import json
import re
import sys


def load(trace_dir):
    paths = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def kind(name):
    """Op-family key: strip trailing .N id and digits."""
    base = re.sub(r"\.\d+$", "", name)
    return base


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fv3net_profile"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events = load(trace_dir)
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid for pid, name in proc_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    # group complete (ph=X) events per thread, compute self time by
    # interval nesting: sort by (start, -dur); a stack gives parents.
    by_tid = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            by_tid[(e["pid"], e.get("tid"))].append(e)
    self_ms = collections.Counter()
    counts = collections.Counter()
    total_self = 0.0
    for tid, evs in by_tid.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, name, child_dur_accum)
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            # stack entries: [start, end, name, child_sum]
            while stack and stack[-1][1] <= ts:
                fin = stack.pop()
                sm = (fin[1] - fin[0]) / 1e3 - fin[3]
                self_ms[kind(fin[2])] += sm
                counts[kind(fin[2])] += 1
                total_self += sm
                if stack:
                    stack[-1][3] += (fin[1] - fin[0]) / 1e3
            stack.append([ts, ts + dur, e["name"], 0.0])
        while stack:
            fin = stack.pop()
            sm = (fin[1] - fin[0]) / 1e3 - fin[3]
            self_ms[kind(fin[2])] += sm
            counts[kind(fin[2])] += 1
            total_self += sm
            if stack:
                stack[-1][3] += (fin[1] - fin[0]) / 1e3
    print(f"total self {total_self:.1f} ms ({total_self / 3:.1f} ms/chunk "
          f"if 3 chunks); {sum(counts.values())} events")
    print(f"{'self ms':>9} {'%':>5} {'n':>7}  op family")
    for name, dur in self_ms.most_common(top_n):
        print(f"{dur:9.2f} {100 * dur / total_self:5.1f} "
              f"{counts[name]:7d}  {name[:100]}")

    # -- region attribution: leaf self-time bucketed by the innermost
    # enclosing while/conditional span on the same thread ---------------
    def is_region(name):
        return name.startswith(("while.", "conditional.", "jit_"))

    region_ms = collections.Counter()
    for tid, evs in by_tid.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # [start, end, name, child_sum]
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][1] <= ts:
                fin = stack.pop()
                sm = (fin[1] - fin[0]) / 1e3 - fin[3]
                if stack:
                    stack[-1][3] += (fin[1] - fin[0]) / 1e3
                if not is_region(fin[2]):
                    region = next(
                        (s[2] for s in reversed(stack) if is_region(s[2])),
                        "(top-level)",
                    )
                    region_ms[(region, kind(fin[2]))] += sm
            stack.append([ts, ts + dur, e["name"], 0.0])
        while stack:
            fin = stack.pop()
            sm = (fin[1] - fin[0]) / 1e3 - fin[3]
            if stack:
                stack[-1][3] += (fin[1] - fin[0]) / 1e3
            if not is_region(fin[2]):
                region = next(
                    (s[2] for s in reversed(stack) if is_region(s[2])),
                    "(top-level)",
                )
                region_ms[(region, kind(fin[2]))] += sm
    by_region = collections.Counter()
    for (region, _k), ms in region_ms.items():
        by_region[region] += ms
    print("\nleaf self-time by enclosing region:")
    for region, ms in by_region.most_common(12):
        print(f"  {ms:9.2f} ms  {region}")
        tops = collections.Counter(
            {k: v for (r, k), v in region_ms.items() if r == region}
        )
        for k, v in tops.most_common(6):
            print(f"      {v:9.2f}  {k[:90]}")


if __name__ == "__main__":
    main()
