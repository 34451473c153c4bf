"""Summarize a jax.profiler trace: top device ops by total time.

Usage:
    python tools/parse_trace.py /tmp/jax_trace [--top 25] [--iters 3]

Reads the newest ``*.trace.json.gz`` under the given trace directory and
prints per-iteration device-op timings (divide by --iters when the traced
region ran several iterations). This is how the deformable-encoder XLA
relayout overhead was found (PERF.md round 3) without TensorBoard.
"""

import argparse
import collections
import glob
import gzip
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    files = sorted(
        glob.glob(
            os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
            recursive=True,
        ),
        key=os.path.getmtime,
    )
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {args.trace_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)

    ev = data.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    meta = {}
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            durs[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            a = e.get("args", {})
            if e["name"] not in meta and (
                "long_name" in a or "source" in a
            ):
                meta[e["name"]] = a

    print(f"trace: {files[-1]}")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]:
        print(
            f"{d / args.iters:10.0f} us/iter x{cnt[name] // args.iters:4d}"
            f"  {name[:90]}"
        )
        a = meta.get(name, {})
        if "source" in a:
            print(f"{'':16s}{a['source'][:100]}")
        if "long_name" in a:
            print(f"{'':16s}{a['long_name'][:120]}")


if __name__ == "__main__":
    main()
