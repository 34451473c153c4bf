"""Unit tests for the analysis/reporting halves of the perf tools.

The training halves run the real train loop (covered by
tests/test_e2e_learning.py and the TPU runbook); the analysis halves are
pure log processing and are validated here on synthetic logs.
"""

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "tools")
)


def _write_logs(out, losses, times, hbm=None):
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "metrics.jsonl"), "w") as f:
        for i, (l, t) in enumerate(zip(losses, times)):
            f.write(json.dumps({"step": i + 1, "loss": l, "time": t}) + "\n")
    if hbm is not None:
        with open(os.path.join(out, "hbm.jsonl"), "w") as f:
            for e, b in enumerate(hbm):
                f.write(
                    json.dumps({"epoch": e + 1, "bytes_in_use": b}) + "\n"
                )


class TestAnalyzeSoak:
    def test_healthy_run_passes(self, tmp_path):
        from soak_train import analyze_soak

        n = 50
        losses = [100.0 / (1 + 0.2 * i) for i in range(n)]
        times = [8.0, 2.1, 1.9] + [1.0 + 0.01 * (i % 5) for i in range(n - 3)]
        hbm = [10_000_000_000 + (50_000_000 if e < 2 else 0) for e in range(n)]
        _write_logs(str(tmp_path), losses, times, hbm)
        report, ok = analyze_soak(str(tmp_path), batch=8)
        assert ok, report
        assert report["steps"] == n
        # warmup steps excluded from the percentiles
        assert report["step_p50_s"] < 1.1
        assert report["step_p90_over_p50"] < 1.1
        assert report["hbm_creep"] == 0.0
        assert report["img_per_s_chip"] == pytest.approx(8 / report["step_p50_s"], rel=0.01)

    def test_unstable_step_time_fails(self, tmp_path):
        from soak_train import analyze_soak

        losses = [10.0 - 0.1 * i for i in range(40)]
        times = [1.0, 1.0, 1.0] + [1.0 if i % 3 else 2.5 for i in range(37)]
        _write_logs(str(tmp_path), losses, times)
        report, ok = analyze_soak(str(tmp_path), batch=8)
        assert not ok
        assert report["step_p90_over_p50"] >= 1.5

    def test_hbm_creep_fails(self, tmp_path):
        from soak_train import analyze_soak

        n = 30
        losses = [10.0 - 0.1 * i for i in range(n)]
        times = [1.0] * n
        hbm = [10_000_000_000 + 20_000_000 * e for e in range(n)]  # leak
        _write_logs(str(tmp_path), losses, times, hbm)
        report, ok = analyze_soak(str(tmp_path), batch=8)
        assert not ok
        assert report["hbm_creep"] > 0.02

    def test_nonfinite_loss_fails(self, tmp_path):
        from soak_train import analyze_soak

        losses = [10.0, 8.0, float("nan"), 6.0]
        times = [1.0] * 4
        _write_logs(str(tmp_path), losses, times)
        report, ok = analyze_soak(str(tmp_path), batch=8)
        assert not ok
        assert not report["loss_finite"]

    def test_increasing_loss_fails(self, tmp_path):
        from soak_train import analyze_soak

        losses = [5.0 + 0.1 * i for i in range(20)]
        times = [1.0] * 20
        _write_logs(str(tmp_path), losses, times)
        _, ok = analyze_soak(str(tmp_path), batch=8)
        assert not ok
