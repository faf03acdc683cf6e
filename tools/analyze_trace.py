#!/usr/bin/env python
"""Aggregate a jax.profiler chrome trace by HLO op: device time + HBM bytes.

The tensorboard profile converter is broken in this image, so this parses the
``*.trace.json.gz`` chrome trace directly. Device-side events carry
``bytes_accessed`` (and per-operand breakdowns) in their ``args``; grouping
them by op category shows where the HBM-bandwidth-bound step (see
docs/BENCHMARKS.md) spends its bytes.

Usage:
  python tools/analyze_trace.py --dir /tmp/d2r_trace [--top 40] [--sample]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(trace_dir: str):
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    hits = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    return sorted(hits)


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt", encoding="utf-8", errors="replace") as f:
        data = json.load(f)
    return data.get("traceEvents", []), data


_ID_SUFFIX = re.compile(r"\.\d+$")


def base_name(name: str) -> str:
    """fusion.1234 -> fusion (merges instances of the same op kind)."""
    return _ID_SUFFIX.sub("", name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/d2r_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--sample", action="store_true",
                    help="print a few raw device events and exit")
    ap.add_argument("--steps", type=int, default=1,
                    help="trace covers N steps; per-step numbers divide by N")
    args = ap.parse_args()

    traces = find_trace(args.dir)
    if not traces:
        raise SystemExit(f"no trace.json(.gz) under {args.dir}")
    events, _ = load_events(traces[-1])
    print(f"# {traces[-1]}: {len(events)} events")

    dev_events = [e for e in events
                  if e.get("ph") == "X" and isinstance(e.get("args"), dict)
                  and any("bytes_accessed" in k for k in e["args"])]
    if args.sample:
        for e in dev_events[:5]:
            print(json.dumps(e, indent=1)[:2000])
        # also show the distinct arg keys seen
        keys = collections.Counter()
        for e in dev_events[:2000]:
            keys.update(e["args"].keys())
        print("arg keys:", keys.most_common(20))
        return

    # us, bytes, n, example long_name of the single heaviest instance
    per_name = collections.defaultdict(lambda: [0.0, 0.0, 0, 0.0, ""])
    per_cat = collections.defaultdict(lambda: [0.0, 0.0, 0])
    for e in dev_events:
        a = e["args"]
        raw = a.get("bytes_accessed", a.get("bytes accessed", 0))
        try:
            b = float(raw)
        except (TypeError, ValueError):
            b = 0.0
        dur = float(e.get("dur", 0.0))
        nm = base_name(e.get("name", "?"))
        rec = per_name[nm]
        rec[0] += dur
        rec[1] += b
        rec[2] += 1
        if b > rec[3]:
            rec[3] = b
            rec[4] = a.get("long_name", "")[:160]
        cat = a.get("hlo_category", "?")
        crec = per_cat[cat]
        crec[0] += dur
        crec[1] += b
        crec[2] += 1

    n = max(args.steps, 1)
    tot_us = sum(v[0] for v in per_name.values())
    tot_b = sum(v[1] for v in per_name.values())
    print(f"# device total: {tot_us/1e3/n:.2f} ms/step, "
          f"{tot_b/1e9/n:.2f} GB/step  (over {n} steps)")

    print("\n## by hlo_category")
    print(f"{'category':<28} {'ms/step':>9} {'GB/step':>9} {'count':>7}")
    for cat, (us, b, cnt) in sorted(per_cat.items(), key=lambda kv: -kv[1][1]):
        print(f"{cat:<28} {us/1e3/n:9.2f} {b/1e9/n:9.2f} {cnt//n:7d}")

    print(f"\n## top {args.top} op kinds by bytes (instance ids merged)")
    print(f"{'ms/step':>8} {'GB/step':>8} {'n':>5}  name | heaviest instance")
    for nm, (us, b, cnt, _, ln) in sorted(per_name.items(),
                                          key=lambda kv: -kv[1][1])[:args.top]:
        print(f"{us/1e3/n:8.2f} {b/1e9/n:8.3f} {cnt//n:5d}  {nm[:40]} | {ln}")

    print(f"\n## top {args.top} op kinds by time")
    for nm, (us, b, cnt, _, ln) in sorted(per_name.items(),
                                          key=lambda kv: -kv[1][0])[:args.top]:
        print(f"{us/1e3/n:8.2f} {b/1e9/n:8.3f} {cnt//n:5d}  {nm[:40]} | {ln[:100]}")


if __name__ == "__main__":
    main()
