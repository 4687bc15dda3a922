"""Trace the fused flagship chunk on the TPU and print top device ops.

Produces a perfetto trace of a few already-compiled chunk dispatches
(jax.profiler works through the tunnel, CLAUDE.md round-2 notes), then
aggregates device-track durations by op name so the HBM-bound long
tail (~9k kernels) is quantified at head.  Usage:

    python benchmarks/profile_chunk.py [top_n]

Integrated-graph only: the standalone-component harness compiles
pathological code and is not trusted (docs/performance.md).
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/fv3net_profile"


def main():
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    npx = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from __graft_entry__ import _flagship

    multi_step, args = _flagship(npx=npx, npz=32, chunk=8, radiation_interval=4)
    state, ml_params, sst, cosz = args

    def sync(st):
        return float(np.asarray(st.pt[0, 0, 0, 0]))

    t0 = time.perf_counter()
    out = multi_step(state, ml_params, sst, cosz)
    sync(out)
    print(f"first call (compile) {time.perf_counter() - t0:.1f} s", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        s = state
        for _ in range(3):
            s = multi_step(s, ml_params, sst, cosz)
        sync(s)

    paths = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace written", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid whose process_name mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid
        for pid, name in proc_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    total = 0.0
    by_name = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur = e.get("dur", 0) / 1e3  # us -> ms
            by_name[e["name"]] += dur
            counts[e["name"]] += 1
            total += dur
    print(f"device total {total:.1f} ms over 3 chunks "
          f"({total / 3:.1f} ms/chunk), {sum(counts.values())} events")
    print(f"{'ms':>9} {'%':>5} {'n':>6}  op")
    for name, dur in by_name.most_common(top_n):
        print(f"{dur:9.2f} {100 * dur / total:5.1f} {counts[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
