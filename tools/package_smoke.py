#!/usr/bin/env python
"""Packaging smoke: prove the README install story with an actual wheel.

Round-4 verdict (weak #4): README claims a pip-installable wheel with
console scripts and a bundled SenticNet lexicon (README.md "Install",
pyproject.toml), but nothing ever built the wheel or ran `d2r-train`
outside the checkout. This tool:

  1. builds the wheel (`pip wheel . --no-deps --no-build-isolation` —
     offline-safe: no index access, setuptools already installed),
  2. creates a CLEAN venv (heavyweight deps jax/flax/optax/orbax resolve
     via a .pth bridge to the parent interpreter's site-packages — no
     network; the package under test is still ONLY the wheel, installed
     --no-index --no-deps --force-reinstall),
  3. from a NON-repo cwd with the repo stripped from PYTHONPATH:
     - imports d2r_tpu and asserts it resolves inside the venv,
     - loads the bundled SenticNet lexicon by its package-data default path,
     - runs the `d2r-train` console script with --dry_run on the tiny
       preset (compiles one real train step, prints the cost report).

Emits one JSON line {"pass": true, ...} and exits nonzero on any failure.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _repo_stripped_env() -> dict:
    """os.environ with the repo removed from PYTHONPATH. Callers (the
    release gate, pytest wrappers) export PYTHONPATH=<repo>:... — with the
    repo's d2r_tpu.egg-info visible on sys.path, pip decides the wheel is
    'already installed with the same version' and SKIPS the install, so
    every step here must run without the repo on the path."""
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and os.path.abspath(p) != REPO]
    if parts:
        env["PYTHONPATH"] = os.pathsep.join(parts)
    else:
        env.pop("PYTHONPATH", None)
    return env


def _clean_env(venv_bin: str) -> dict:
    """Env for in-venv runs: repo stripped from PYTHONPATH/cwd so imports
    can only resolve from the installed wheel; CPU forced (the axon plugin
    overrides JAX_PLATFORMS, but d2r-train --device cpu pins it via
    jax.config, and plain python runs get the config flag inline)."""
    env = _repo_stripped_env()
    env["PATH"] = venv_bin + os.pathsep + env.get("PATH", "")
    env.pop("JAX_PLATFORMS", None)
    return env


def run(out_path: str | None, timeout_s: int = 1500) -> dict:
    report = {"pass": False, "stages": {}}
    base_env = _repo_stripped_env()
    with tempfile.TemporaryDirectory(prefix="d2r_pkg_smoke_") as td:
        dist = os.path.join(td, "dist")

        # -- 1. build the wheel --------------------------------------------
        p = subprocess.run(
            [sys.executable, "-m", "pip", "wheel", ".", "--no-deps",
             "--no-build-isolation", "--no-index", "-w", dist],
            cwd=REPO, env=base_env, capture_output=True, text=True,
            timeout=timeout_s)
        report["stages"]["wheel"] = {"rc": p.returncode,
                                     "tail": p.stdout[-500:] + p.stderr[-500:]}
        if p.returncode != 0:
            return report
        wheels = glob.glob(os.path.join(dist, "d2r_tpu-*.whl"))
        if not wheels:
            report["stages"]["wheel"]["tail"] += " | no d2r_tpu-*.whl built"
            return report
        wheel = wheels[0]
        report["wheel"] = os.path.basename(wheel)

        # -- 2. clean venv + install the wheel only ------------------------
        venv = os.path.join(td, "venv")
        p = subprocess.run([sys.executable, "-m", "venv",
                            "--without-pip", venv],
                           env=base_env, capture_output=True, text=True,
                           timeout=300)
        report["stages"]["venv"] = {"rc": p.returncode,
                                    "tail": p.stderr[-500:]}
        if p.returncode != 0:
            return report
        venv_bin = os.path.join(venv, "bin")
        vpy = os.path.join(venv_bin, "python")
        # make the RUNNING interpreter's site-packages visible for the
        # heavyweight deps (jax/flax/numpy — no network here).
        # --system-site-packages can't do it: this host's python is itself
        # a venv, so "system" would mean the bare base interpreter. A .pth
        # file keeps resolution order venv-first, so d2r_tpu can only come
        # from the installed wheel (asserted below).
        import sysconfig
        parent_site = sysconfig.get_paths()["purelib"]
        vsite = glob.glob(os.path.join(venv, "lib", "python*",
                                       "site-packages"))[0]
        with open(os.path.join(vsite, "_parent_deps.pth"), "w") as f:
            f.write(parent_site + "\n")
        # --without-pip + the parent's pip targeting the venv avoids an
        # ensurepip network/bootstrap dependency
        p = subprocess.run(
            [sys.executable, "-m", "pip", "--python", vpy, "install",
             "--no-index", "--no-deps", "--force-reinstall", wheel],
            env=base_env, capture_output=True, text=True, timeout=600)
        report["stages"]["install"] = {"rc": p.returncode,
                                       "tail": p.stdout[-500:] + p.stderr[-500:]}
        if p.returncode != 0:
            return report

        env = _clean_env(venv_bin)
        workdir = os.path.join(td, "elsewhere")  # non-repo cwd
        os.makedirs(workdir, exist_ok=True)

        # -- 3a. import + bundled-lexicon resolution ------------------------
        probe = (
            "import os, d2r_tpu\n"
            f"assert os.path.abspath(d2r_tpu.__file__).startswith("
            f"{venv!r}), d2r_tpu.__file__\n"
            "from d2r_tpu.data.sentic import load_sentic_lexicon\n"
            "lex = load_sentic_lexicon()\n"
            "assert len(lex) > 30000, len(lex)\n"
            "print('IMPORT_OK', len(lex))\n")
        p = subprocess.run([vpy, "-c", probe], cwd=workdir, env=env,
                           capture_output=True, text=True, timeout=300)
        report["stages"]["import_and_lexicon"] = {
            "rc": p.returncode, "tail": p.stdout[-300:] + p.stderr[-500:]}
        if p.returncode != 0 or "IMPORT_OK" not in p.stdout:
            return report
        report["lexicon_entries"] = int(p.stdout.split()[-1])

        # -- 3b. the console script end-to-end (tiny dry run) ---------------
        p = subprocess.run(
            [os.path.join(venv_bin, "d2r-train"), "--dry_run",
             "--device", "cpu", "--bert_name", "tiny-bert",
             "--vit_name", "tiny-vit", "--embed_size", "64",
             "--num_head_IMRC", "4", "--hid_IMRC", "64",
             "--hid_router", "32", "--max_seq", "16", "--batch_size", "2",
             "--no_pallas", "--compute_dtype", "float32"],
            cwd=workdir, env=env, capture_output=True, text=True,
            timeout=timeout_s)
        ok = p.returncode == 0 and "dry_run" in p.stdout
        report["stages"]["d2r_train_dry_run"] = {
            "rc": p.returncode,
            "tail": p.stdout[-600:] + p.stderr[-600:]}
        if not ok:
            return report

    report["pass"] = True
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=1)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="write the report JSON here")
    ap.add_argument("--timeout_s", type=int, default=1500)
    args = ap.parse_args(argv)
    report = run(args.out, args.timeout_s)
    print(json.dumps({"metric": "package_smoke", "pass": report["pass"],
                      **{k: v for k, v in report.items()
                         if k not in ("stages", "pass")}}))
    if not report["pass"]:
        print(json.dumps(report["stages"], indent=1)[-3000:],
              file=sys.stderr)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
