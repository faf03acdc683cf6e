"""Release-gate pure logic: stage parsing and the non-vacuous pass rule.

The gate itself is exercised for real (RELEASE_CHECK.json); these pin the
parsing decisions that review found fragile: stdout/stderr separation,
device-list-only TPU probing, and all([])-style vacuous passes.
"""

import importlib.util
import json
import os
import sys

# load tools/release_check.py WITHOUT mutating sys.path for the whole pytest
# session (round-4 advice: a prepended tools/ dir could shadow real imports
# in later-collected tests)
_spec = importlib.util.spec_from_file_location(
    "release_check", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "release_check.py"))
release_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(release_check)
rc_main = release_check.main


def test_all_skipped_is_not_a_pass(tmp_path):
    out = tmp_path / "rc.json"
    rc = rc_main(["--skip_tests", "--skip_bench", "--skip_dryrun",
                  "--out", str(out)])
    assert rc == 1
    d = json.loads(out.read_text())
    assert d["pass"] is False
    assert "no stages ran" in d["note"]


def test_probe_matches_device_list_not_stderr_noise(monkeypatch):
    rc = release_check

    def fake_run(cmd, timeout, env=None, tag=""):
        # plugin-failure shape: 'axon' appears only in the warning, the
        # actual device list is CPU -> must NOT count as a TPU
        return {"rc": 0,
                "tail": "DEVICES: [CpuDevice(id=0)]\n",
                "stderr_tail": "WARNING: unable to initialize 'axon' "
                               "backend, falling back to cpu",
                "wall_s": 0.1}

    monkeypatch.setattr(rc, "_run", fake_run)
    assert rc.probe_tpu() is False

    def fake_run_tpu(cmd, timeout, env=None, tag=""):
        return {"rc": 0, "tail": "DEVICES: [TPU v5 lite0]\n",
                "stderr_tail": "", "wall_s": 0.1}

    monkeypatch.setattr(rc, "_run", fake_run_tpu)
    assert rc.probe_tpu() is True


def test_run_keeps_stdout_and_stderr_tails_separate():
    rc = release_check

    code = ("import sys\n"
            "print('THE_SUCCESS_MARKER')\n"
            "sys.stderr.write('noise ' * 1000)\n")
    r = rc._run([sys.executable, "-c", code], timeout=60, tag="t")
    assert r["rc"] == 0
    assert "THE_SUCCESS_MARKER" in r["tail"]        # stdout survives...
    assert "noise" not in r["tail"]                 # ...unpolluted
    assert "noise" in r["stderr_tail"]


def test_bench_json_line_parses_from_stdout(monkeypatch):
    rc = release_check

    monkeypatch.setattr(rc, "probe_tpu", lambda timeout=60: True)

    def fake_run(cmd, timeout, env=None, tag=""):
        return {"rc": 0,
                "tail": "window 0: ...\n"
                        '{"metric": "finetune_samples_per_sec_per_chip", '
                        '"value": 820.0, "unit": "samples/sec/chip", '
                        '"vs_baseline": 8.2}\n',
                "stderr_tail": "x" * 900, "wall_s": 1.0}

    monkeypatch.setattr(rc, "_run", fake_run)
    s = rc.stage_bench(require_tpu=False)
    assert s["status"] == "ok"
    assert s["parsed"]["value"] == 820.0


def test_markers_parse_beyond_the_2000_char_tail(monkeypatch):
    """Round-4 advice: success markers were parsed from the 2000-char tail,
    so growth in TRAILING stdout silently flipped a passing stage to failed.
    Markers must now parse from the full stdout, and the full stdout must
    not leak into the stored stage result."""
    rc = release_check

    monkeypatch.setattr(rc, "probe_tpu", lambda timeout=60: True)
    json_line = ('{"metric": "finetune_samples_per_sec_per_chip", '
                 '"value": 820.0, "unit": "samples/sec/chip"}')
    out = json_line + "\n" + ("trailing diagnostics line\n" * 200)
    assert json_line not in out[-2000:]  # the old parse WOULD miss it

    def fake_run(cmd, timeout, env=None, tag=""):
        return {"rc": 0, "tail": out[-2000:], "stderr_tail": "",
                "wall_s": 1.0, "stdout_full": out}

    monkeypatch.setattr(rc, "_run", fake_run)
    s = rc.stage_bench(require_tpu=False)
    assert s["status"] == "ok"
    assert s["parsed"]["value"] == 820.0
    assert "stdout_full" not in s

    dr_out = "dryrun_multichip OK [tiny-64]\n" + ("post-run summary\n" * 300)
    assert "dryrun_multichip OK" not in dr_out[-2000:]

    def fake_run_dr(cmd, timeout, env=None, tag=""):
        return {"rc": 0, "tail": dr_out[-2000:], "stderr_tail": "",
                "wall_s": 1.0, "stdout_full": dr_out}

    monkeypatch.setattr(rc, "_run", fake_run_dr)
    s = rc.stage_dryrun()
    assert s["status"] == "ok"
    assert "stdout_full" not in s
