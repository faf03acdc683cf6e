"""tools/sweep_report.py: metrics.jsonl aggregation + ranking (pure host
code, no jax). The input format is what Trainer._emit_metrics writes."""

import json
import os
import sys


sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from sweep_report import render_table, summarize_run  # noqa: E402


def _write_run(path, dev_f1s, test_f1=0.7, torn_tail=False,
               early_stop=False):
    lines = []
    for e, f in enumerate(dev_f1s, start=1):
        lines.append({"kind": "train_window", "epoch": e, "step": 2 * e,
                      "loss": 1.0 / e})
        lines.append({"kind": "dev", "epoch": e, "f_score": f,
                      "eval_accuracy": f, "loss": 2.0})
    if early_stop:
        lines.append({"kind": "early_stop", "epoch": len(dev_f1s)})
    lines.append({"kind": "test", "epoch": len(dev_f1s), "f_score": test_f1,
                  "eval_accuracy": test_f1, "loss": 1.5})
    lines.append({"kind": "summary", "samples_per_sec": 100.0,
                  "steps": 2 * len(dev_f1s)})
    with open(path, "w") as fh:
        for rec in lines:
            fh.write(json.dumps(rec) + "\n")
        if torn_tail:
            fh.write('{"kind": "dev", "epo')  # killed mid-write
    return str(path)


def test_summarize_picks_best_dev_epoch(tmp_path):
    p = _write_run(tmp_path / "a.jsonl", [0.4, 0.8, 0.6])
    s = summarize_run(p)
    assert s["best_dev_f1"] == 0.8 and s["best_dev_epoch"] == 2
    assert s["test_f1"] == 0.7 and s["epochs_evaluated"] == 3
    assert s["final_train_loss"] == 1.0 / 3
    assert s["samples_per_sec"] == 100.0
    assert s["early_stopped"] is False


def test_torn_tail_and_early_stop_tolerated(tmp_path):
    p = _write_run(tmp_path / "b.jsonl", [0.5], torn_tail=True,
                   early_stop=True)
    s = summarize_run(p)
    assert s["best_dev_f1"] == 0.5 and s["early_stopped"] is True


def test_main_ranks_by_best_dev_f1(tmp_path, capsys):
    from sweep_report import main

    lo = _write_run(tmp_path / "lo.jsonl", [0.3])
    hi = _write_run(tmp_path / "hi.jsonl", [0.9])
    out_json = str(tmp_path / "agg.json")
    rows = main([lo, hi, "--json", out_json])
    assert [r["run"] for r in rows] == [hi, lo]
    table = capsys.readouterr().out
    assert table.index("hi.jsonl") < table.index("lo.jsonl")
    assert len(json.load(open(out_json))) == 2


def test_render_table_handles_missing_fields():
    txt = render_table([{"run": "x.jsonl", "epochs_evaluated": 0,
                         "early_stopped": False}])
    assert "x.jsonl" in txt and "-" in txt
