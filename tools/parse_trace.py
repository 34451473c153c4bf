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


def _op_class(name: str) -> str:
    """Collapse an HLO op name to its class: 'fusion.123' -> 'fusion',
    'loop_multiply_fusion.5' -> 'loop_multiply_fusion', strip trailing
    .N / digit suffixes."""
    base = name.split(".")[0]
    return base.rstrip("0123456789_") or base


def _source_key(args_dict: dict) -> str:
    src = args_dict.get("source", "")
    # keep the last path component + line: '/a/b/foo.py:123;...' etc
    if not src:
        return "?"
    first = src.split(";")[0]
    parts = first.rsplit("/", 1)
    return parts[-1][:60]


def bucket_report(durs, cnt, meta, iters, top, small_us=1000.0):
    """VERDICT r3 item 2: the 'tail of <1 ms fusions' must be named.
    Bucket every op by (op-class, source file:line); report the top
    buckets overall and the top buckets restricted to ops whose
    individual mean duration is below ``small_us``."""
    import collections as C

    def agg(filter_small):
        b = C.defaultdict(float)
        n = C.Counter()
        for name, d in durs.items():
            mean_us = d / max(1, cnt[name])
            if filter_small and mean_us >= small_us:
                continue
            key = (
                _op_class(name),
                _source_key(meta.get(name, {})),
            )
            b[key] += d
            n[key] += cnt[name]
        return b, n

    for title, filter_small in (
        ("ALL ops by (class, source)", False),
        (f"sub-{small_us / 1000:.0f}ms ops only (the 'tail')", True),
    ):
        b, n = agg(filter_small)
        total = sum(b.values()) / iters
        print(f"\n== {title}: {total / 1000:.1f} ms/iter ==")
        for key, d in sorted(b.items(), key=lambda kv: -kv[1])[:top]:
            print(
                f"{d / iters:10.0f} us/iter x{n[key] // iters:5d}"
                f"  {key[0][:40]:40s} {key[1]}"
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--buckets",
        action="store_true",
        help="bucket ops by (op-class, source line); also reports the "
        "sub-ms tail separately",
    )
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
    if args.buckets:
        bucket_report(durs, cnt, meta, args.iters, args.top)
        return
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
