"""Release-gate pure logic: stage parsing and the non-vacuous pass rule.

The gate itself is exercised for real (RELEASE_CHECK.json); these pin the
parsing decisions that review found fragile: stdout/stderr separation,
device-list-only TPU probing, and all([])-style vacuous passes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from release_check import main as rc_main  # noqa: E402


def test_all_skipped_is_not_a_pass(tmp_path):
    out = tmp_path / "rc.json"
    rc = rc_main(["--skip_tests", "--skip_bench", "--skip_dryrun",
                  "--out", str(out)])
    assert rc == 1
    d = json.loads(out.read_text())
    assert d["pass"] is False
    assert "no stages ran" in d["note"]


def test_probe_matches_device_list_not_stderr_noise(monkeypatch):
    import release_check as rc

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
    import release_check as rc

    code = ("import sys\n"
            "print('THE_SUCCESS_MARKER')\n"
            "sys.stderr.write('noise ' * 1000)\n")
    r = rc._run([sys.executable, "-c", code], timeout=60, tag="t")
    assert r["rc"] == 0
    assert "THE_SUCCESS_MARKER" in r["tail"]        # stdout survives...
    assert "noise" not in r["tail"]                 # ...unpolluted
    assert "noise" in r["stderr_tail"]


def test_bench_json_line_parses_from_stdout(monkeypatch):
    import release_check as rc

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
