"""Log analyzer + kernel metrics + visualization smoke tests."""
import numpy as np
import pytest

from kmsr_tpu.analysis.kernel_metrics import ascii_kernel, kernel_delta_l2, kernel_metrics
from kmsr_tpu.analysis.log_analyzer import (
    analyze_stability,
    format_report,
    load_training_log,
    plot_loss_curves,
)


def write_log(path, n=200, noisy=False, rng=None):
    rng = rng or np.random.default_rng(0)
    with open(path, "w") as f:
        f.write("Iteration,Loss_D,Loss_G_adv,Loss_Reg,Loss_Reg_weighted\n")
        for i in range(n):
            d = 0.5 + (rng.normal(0, 0.5) if noisy else rng.normal(0, 0.01))
            g = 0.4 + rng.normal(0, 0.01)
            r = 30.0 + rng.normal(0, 0.1)
            f.write(f"{i+1},{d:.6f},{g:.6f},{r:.6f},{r*0.002:.6f}\n")
    return path


def test_log_analyzer_stable(tmp_path):
    log = load_training_log(write_log(tmp_path / "log.txt"))
    assert len(log["Loss_D"]) == 200
    report = analyze_stability(log)
    assert report["score"] >= 3
    s = report["losses"]["Loss_D"]
    assert s.stability == "stable"
    assert abs(s.mean - 0.5) < 0.05
    text = format_report(report)
    assert "stability score" in text


def test_log_analyzer_flags_instability(tmp_path):
    log = load_training_log(write_log(tmp_path / "bad.txt", noisy=True))
    report = analyze_stability(log)
    assert report["losses"]["Loss_D"].stability in ("moderate", "unstable")
    assert report["score"] < 4


def test_plot_loss_curves(tmp_path):
    log = load_training_log(write_log(tmp_path / "log.txt"))
    out = tmp_path / "curves.png"
    plot_loss_curves(log, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_kernel_metrics_gaussian():
    xs = np.arange(13) - 6
    g = np.exp(-(xs[:, None] ** 2 + xs[None] ** 2) / (2 * 2.0**2))
    g /= g.sum()
    m = kernel_metrics(g)
    assert m["k_shape"] == "13x13"
    assert m["k_sum"] == pytest.approx(1.0, rel=1e-6)
    assert m["center_offset"] == pytest.approx(0.0, abs=1e-9)
    assert 0 < m["sparsity"] < 1
    art = ascii_kernel(g)
    lines = art.splitlines()
    assert len(lines) == 11 and all(len(l) == 11 for l in lines)
    # peak maps to the second-brightest char ('%') because the scale
    # denominator is max+1e-12 (reference-parity truncation behavior)
    assert lines[5][5] == "%"
    assert lines[0].strip() == ""  # dark border
    assert kernel_delta_l2(g, None) == 0.0
    assert kernel_delta_l2(g, g * 0.5) > 0


@pytest.mark.slow
def test_visualize_outputs(tmp_path, rng):
    from kmsr_tpu.analysis.visualize import (
        plot_hr_vs_degraded,
        plot_kernels,
        plot_moe_bank,
        plot_train_sample,
    )

    hr = rng.normal(3, 1, size=(5, 64, 64)).astype(np.float32)
    blurred = rng.normal(3, 1, size=(5, 8, 8)).astype(np.float32)
    noisy = blurred + rng.normal(0, 0.1, blurred.shape).astype(np.float32)
    plot_train_sample(hr, blurred, noisy, str(tmp_path / "qa.png"))
    plot_hr_vs_degraded(hr, blurred, str(tmp_path / "cmp.png"))
    plot_kernels(rng.uniform(0, 1, (5, 13, 13)), str(tmp_path / "k.png"))
    paths = plot_moe_bank(
        rng.uniform(0, 1, (10, 5, 13, 13)).astype(np.float32),
        rng.uniform(0.1, 1, (10, 5)).astype(np.float32),
        str(tmp_path / "moe"),
    )
    for p in [tmp_path / "qa.png", tmp_path / "cmp.png", tmp_path / "k.png", *paths]:
        import os

        assert os.path.exists(p)
