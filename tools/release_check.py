"""One-command release gate: reproduce every driver artifact + the suite.

Runs, in order, with everything sequential (this host has ONE core —
concurrent jobs starve each other and corrupt host-timed TPU measurements):

  1. TPU probe + bench.py            -> the BENCH_r{N}.json payload
  2. default multichip dryrun (8 virtual CPU devices)
                                     -> the MULTICHIP_r{N}.json payload
  3. pytest tests/ --ignore=tests/parity   (half 1)
  4. pytest tests/parity                   (half 2)

and emits ONE summary JSON (stdout + --out file). Exit code 0 iff every
stage passed (a SKIPPED bench — tunnel down — is reported but does not
fail the gate; use --require_tpu to make it fatal).

Usage:
  python tools/release_check.py                  # full gate (~3 h CPU)
  python tools/release_check.py --quick          # -m 'not slow' halves
  python tools/release_check.py --skip_tests     # artifacts only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# keep the axon plugin importable in subprocesses (CLAUDE.md: PYTHONPATH
# CLOBBERS the plugin path unless both entries are present)
ENV = dict(os.environ, PYTHONPATH=f"{REPO}:/root/.axon_site")


def _run(cmd, timeout, env=None, tag=""):
    """stdout and stderr tails kept SEPARATE: success markers are parsed
    from stdout, and this stack routinely emits >2k of stderr noise
    (absl/JAX warnings) that would otherwise evict them from a combined
    tail. ``stdout_full`` carries the UNtruncated stdout for marker/JSON
    parsing (round-4 advice: parsing from the 2000-char tail silently flips
    a passing stage to failed once trailing output grows); stages must pop
    it before storing the result so the summary JSON stays small."""
    t0 = time.monotonic()
    def _s(x):
        return x if isinstance(x, str) else ""
    try:
        p = subprocess.run(cmd, cwd=REPO, env=env or ENV, text=True,
                           capture_output=True, timeout=timeout)
        rc, out, err = p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired as e:
        rc, out = 124, _s(e.stdout)
        err = _s(e.stderr) + \
            f"\n<release_check: {tag} timed out after {timeout}s>"
    return {"rc": rc, "wall_s": round(time.monotonic() - t0, 1),
            "tail": out[-2000:], "stderr_tail": err[-1000:],
            "stdout_full": out}


def probe_tpu(timeout=60) -> bool:
    """Is the tunnelled TPU reachable? (backend init can otherwise block
    ~35 min before raising UNAVAILABLE — CLAUDE.md)."""
    r = _run([sys.executable, "-c",
              "import jax; print('DEVICES:', jax.devices())"],
             timeout, tag="tpu probe")
    # match the actual device list, not stderr noise (a failed-plugin
    # warning also contains 'axon'/'tpu' but jax falls back to CpuDevice)
    for line in r.pop("stdout_full", r["tail"]).splitlines():
        if line.startswith("DEVICES:"):
            low = line.lower()
            return r["rc"] == 0 and ("tpu" in low or "axon" in low)
    return False


def stage_bench(require_tpu: bool):
    if not probe_tpu():
        return {"status": "fatal" if require_tpu else "skipped",
                "reason": "TPU probe failed (tunnel down?)"}
    r = _run([sys.executable, "bench.py"], timeout=3600, tag="bench")
    parsed = None
    for line in reversed(r.pop("stdout_full", r["tail"]).splitlines()):
        if line.startswith("{") and '"metric"' in line:
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                pass
            break
    status = "ok" if (r["rc"] == 0 and parsed) else "failed"
    return {"status": status, **r, "parsed": parsed}


def stage_dryrun():
    # the retry-once for the known XLA:CPU collective hard-wedge (rc=-6)
    # lives INSIDE dryrun_multichip now (subprocess + retry-on-signal,
    # __graft_entry__.py) so the driver's direct call path is protected
    # too — no outer retry here.
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8)")
    env = dict(ENV)
    env.pop("JAX_PLATFORMS", None)  # dryrun pins cpu via jax.config itself
    r = _run([sys.executable, "-c", code], timeout=3000, env=env,
             tag="dryrun")
    ok = r["rc"] == 0 and "dryrun_multichip OK" in r.pop("stdout_full",
                                                         r["tail"])
    return {"status": "ok" if ok else "failed", **r}


def stage_pytest(args_extra, timeout, tag):
    cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
           *args_extra]
    r = _run(cmd, timeout=timeout, tag=tag)
    r.pop("stdout_full", None)  # pytest's own tail summary is enough
    return {"status": "ok" if r["rc"] == 0 else "failed", **r}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="run the suite with -m 'not slow'")
    ap.add_argument("--skip_tests", action="store_true")
    ap.add_argument("--skip_bench", action="store_true")
    ap.add_argument("--skip_dryrun", action="store_true")
    ap.add_argument("--require_tpu", action="store_true",
                    help="a down tunnel fails the gate instead of skipping")
    ap.add_argument("--out", default="RELEASE_CHECK.json")
    args = ap.parse_args(argv)

    summary = {"started": time.strftime("%Y-%m-%dT%H:%M:%S"),
               "quick": args.quick}
    t0 = time.monotonic()

    if not args.skip_bench:
        print("[release_check] bench (TPU) ...", flush=True)
        summary["bench"] = stage_bench(args.require_tpu)
        print(f"  -> {summary['bench']['status']}", flush=True)
    if not args.skip_dryrun:
        print("[release_check] multichip dryrun (8 virtual CPU) ...",
              flush=True)
        summary["dryrun"] = stage_dryrun()
        print(f"  -> {summary['dryrun']['status']}", flush=True)
    if not args.skip_tests:
        marker = ["-m", "not slow"] if args.quick else []
        print("[release_check] pytest half 1 (tests/ sans parity) ...",
              flush=True)
        summary["tests_main"] = stage_pytest(
            ["tests/", "--ignore=tests/parity", *marker],
            # measured 7389 s in round 4 + headroom for the round-5
            # additions (packaging smoke, MVSA-M e2e, dryrun-retry)
            timeout=10800, tag="tests_main")
        print(f"  -> {summary['tests_main']['status']}", flush=True)
        print("[release_check] pytest half 2 (tests/parity) ...", flush=True)
        summary["tests_parity"] = stage_pytest(
            # round-4 measured 1926 s + the round-5 DR_step=4 and
            # flagship-geometry golden tests (full-size torch oracle)
            ["tests/parity", *marker], timeout=9000, tag="tests_parity")
        print(f"  -> {summary['tests_parity']['status']}", flush=True)

    summary["wall_s"] = round(time.monotonic() - t0, 1)
    statuses = [v.get("status") for v in summary.values()
                if isinstance(v, dict) and "status" in v]
    # a gate where NOTHING ran must not claim a pass (all([]) is True)
    summary["pass"] = bool(statuses) and all(
        s in ("ok", "skipped") for s in statuses)
    if not statuses:
        summary["note"] = "no stages ran (everything skipped) — not a pass"

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: (v.get("status") if isinstance(v, dict) else v)
                      for k, v in summary.items()}))
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
