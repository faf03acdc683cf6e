#!/usr/bin/env python
"""Aggregate --metrics_jsonl files from a sweep into one ranked report.

The reference's experiment driver is a nested shell grid (ref: run.sh:1-30)
whose results live in scrollback; with --metrics_jsonl each run leaves a
structured record instead. This tool collects any number of those files and
prints one table ranked by best dev weighted-F1 (the reference's
model-selection metric, ref: modules/train.py:188,210-216) with the test
metrics and throughput beside it.

Usage:
  python tools/sweep_report.py runs/*.jsonl
  python tools/sweep_report.py --glob 'sweeps/**/metrics.jsonl' --json out.json
"""

from __future__ import annotations

import argparse
import glob as globlib
import json
import os
import sys
from typing import Dict, List, Optional


def summarize_run(path: str) -> Optional[Dict]:
    """One metrics.jsonl -> {name, best_dev_f1, best_epoch, test_*, ...}.

    Tolerates partial files (killed runs): a run with no dev record yet is
    reported with what it has.
    """
    records = []
    try:
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    records.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn final line from a killed run
    except OSError as e:
        print(f"skipping {path}: {e}", file=sys.stderr)
        return None
    if not records:
        return None

    devs = [r for r in records if r.get("kind") == "dev"]
    tests = [r for r in records if r.get("kind") == "test"]
    summaries = [r for r in records if r.get("kind") == "summary"]
    windows = [r for r in records if r.get("kind") == "train_window"]

    out: Dict = {"run": path, "epochs_evaluated": len(devs)}
    if devs:
        best = max(devs, key=lambda r: r.get("f_score", float("-inf")))
        out["best_dev_f1"] = best.get("f_score")
        out["best_dev_epoch"] = best.get("epoch")
        out["best_dev_acc"] = best.get("eval_accuracy")
    if tests:
        t = tests[-1]
        out["test_f1"] = t.get("f_score")
        out["test_acc"] = t.get("eval_accuracy")
        out["test_loss"] = t.get("loss")
    if summaries:
        s = summaries[-1]
        out["samples_per_sec"] = s.get("samples_per_sec")
        out["steps"] = s.get("steps")
    if windows:
        out["final_train_loss"] = windows[-1].get("loss")
    out["early_stopped"] = any(r.get("kind") == "early_stop" for r in records)
    return out


def _fmt(v, nd=4) -> str:
    if v is None:
        return "-"
    if isinstance(v, float):
        return f"{v:.{nd}f}"
    return str(v)


def render_table(rows: List[Dict]) -> str:
    cols = [("run", 0), ("best_dev_f1", 4), ("best_dev_epoch", 0),
            ("test_f1", 4), ("test_acc", 4), ("final_train_loss", 4),
            ("samples_per_sec", 1), ("early_stopped", 0)]
    header = [c for c, _ in cols]
    body = [[_fmt(r.get(c), nd) for c, nd in cols] for r in rows]
    widths = [max(len(h), *(len(b[i]) for b in body)) if body else len(h)
              for i, h in enumerate(header)]
    lines = [" | ".join(h.ljust(w) for h, w in zip(header, widths)),
             "-+-".join("-" * w for w in widths)]
    lines += [" | ".join(c.ljust(w) for c, w in zip(row, widths))
              for row in body]
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("paths", nargs="*", help="metrics.jsonl files")
    ap.add_argument("--glob", default=None,
                    help="additionally expand this glob (recursive ** ok)")
    ap.add_argument("--json", default=None,
                    help="also write the aggregated rows as JSON here")
    args = ap.parse_args(argv)

    paths = list(args.paths)
    if args.glob:
        paths += sorted(globlib.glob(args.glob, recursive=True))
    if not paths:
        ap.error("no input files (pass paths or --glob)")

    rows = [s for s in (summarize_run(p) for p in dict.fromkeys(paths))
            if s is not None]
    rows.sort(key=lambda r: (r.get("best_dev_f1") is None,
                             -(r.get("best_dev_f1") or 0.0)))
    print(render_table(rows))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=1)
        print(f"\nwrote {len(rows)} rows to {args.json}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    main()
