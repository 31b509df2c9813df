"""bench._compare_runs: the regression gate must run on calibration-
normalized ratios (r5: this VM drifts up to ~1.42× between rounds
with byte-identical plans — a raw-wall gate sprays false flags in the
unlucky direction), while raw ratios stay recorded for transparency."""

from __future__ import annotations

import bench


def _prev(queries, shuffle_sec=1.0):
    return {
        "queries": queries,
        "calibration": {"cpu_matmul_sec": 0.02, "spark_shuffle_sec": shuffle_sec},
    }


def test_uniform_vm_drift_produces_zero_flags():
    """Walls AND calibration both 2.5× slower ⇒ environment, not code:
    raw ratios show 2.5 but the gate stays quiet."""
    prev = _prev({"a": 1.0, "b": 2.0, "c": 4.0}, shuffle_sec=1.0)
    timings = {"a": 2.5, "b": 5.0, "c": 10.0}
    calib = {"cpu_matmul_sec": 0.05, "spark_shuffle_sec": 2.5}
    out = bench._compare_runs(timings, prev, "base", calib)
    assert out["calibration_factor"] == 2.5
    assert out["ratios"]["a"] == 2.5
    assert out["ratios_normalized"]["a"] == 1.0
    assert out["regressions_over_2x"] == []
    assert out["total_ratio"] == 2.5
    assert out["total_ratio_normalized"] == 1.0


def test_real_regression_still_flags_under_drift():
    """A genuine 6× query regression survives normalization by the
    2× machine drift (6/2 = 3 > 2) and gets flagged; the merely-
    drifted queries do not."""
    prev = _prev({"slow": 1.0, "ok": 2.0}, shuffle_sec=1.0)
    timings = {"slow": 6.0, "ok": 4.0}
    calib = {"cpu_matmul_sec": 0.04, "spark_shuffle_sec": 2.0}
    out = bench._compare_runs(timings, prev, "base", calib)
    assert out["regressions_over_2x"] == ["slow"]


def test_missing_prev_calibration_falls_back_to_raw():
    prev = {"queries": {"a": 1.0}}  # pre-r5 record: no calibration
    timings = {"a": 3.0}
    calib = {"cpu_matmul_sec": 0.02, "spark_shuffle_sec": 1.5}
    out = bench._compare_runs(timings, prev, "base", calib)
    assert out["calibration_factor"] is None
    assert out["ratios_normalized"] == out["ratios"]
    assert out["regressions_over_2x"] == ["a"]


def test_faster_machine_unmasks_hidden_regression():
    """Machine got 2× faster but the query stayed flat ⇒ the code
    actually regressed 2×; the raw ratio (1.0) would hide it."""
    prev = _prev({"a": 2.0}, shuffle_sec=2.0)
    timings = {"a": 2.2}
    calib = {"cpu_matmul_sec": 0.01, "spark_shuffle_sec": 1.0}
    out = bench._compare_runs(timings, prev, "base", calib)
    assert out["ratios"]["a"] == 1.1
    assert out["ratios_normalized"]["a"] == 2.2
    # flagged: normalized ratio 2.2 > 2 and normalized absolute
    # slowdown 2.2/0.5 - 2.0 = 2.4 s > 0.75 s
    assert out["regressions_over_2x"] == ["a"]


def test_cpu_count_mismatch_disables_normalization():
    """An 8-cpu smoke's shuffle probe is not comparable to the 32-cpu
    round record — normalization must switch off, not mis-scale."""
    prev = _prev({"a": 1.0}, shuffle_sec=1.0)
    prev["calibration"]["cpus"] = 32
    calib = {"cpu_matmul_sec": 0.02, "spark_shuffle_sec": 4.0, "cpus": 8}
    out = bench._compare_runs({"a": 1.1}, prev, "base", calib)
    assert out["calibration_factor"] is None
    assert out["ratios_normalized"] == out["ratios"]


def test_sub_second_noise_not_flagged():
    """>2× ratio on a 0.3 s query is scheduler noise — the absolute
    guard keeps it quiet."""
    prev = _prev({"tiny": 0.3}, shuffle_sec=1.0)
    timings = {"tiny": 0.9}
    calib = {"cpu_matmul_sec": 0.02, "spark_shuffle_sec": 1.0}
    out = bench._compare_runs(timings, prev, "base", calib)
    assert out["regressions_over_2x"] == []


def test_uniform_drift_still_visible_in_raw_flags_and_factor_alert():
    """Normalization must not LAUNDER a framework-wide slowdown (r6
    ADVICE): a uniform 2.5× — whether VM drift or a bad session-config
    change — stays out of the normalized gate but lands in the raw
    flags AND trips the calibration-factor sanity band."""
    prev = _prev({"a": 1.0, "b": 2.0}, shuffle_sec=1.0)
    timings = {"a": 2.5, "b": 5.0}
    calib = {"cpu_matmul_sec": 0.05, "spark_shuffle_sec": 2.5}
    out = bench._compare_runs(timings, prev, "base", calib)
    assert out["regressions_over_2x"] == []
    assert out["regressions_over_2x_raw"] == ["a", "b"]
    assert out["calibration_factor_alert"] is True


def test_factor_inside_band_no_alert():
    prev = _prev({"a": 1.0}, shuffle_sec=1.0)
    calib = {"cpu_matmul_sec": 0.02, "spark_shuffle_sec": 1.3}
    out = bench._compare_runs({"a": 1.2}, prev, "base", calib)
    assert out["calibration_factor_alert"] is False
    assert out["regressions_over_2x_raw"] == []


def test_fast_machine_factor_alert_fires_low_side():
    """A probe 2× FASTER than the baseline's is as reportable as a
    slower one — the band is symmetric."""
    prev = _prev({"a": 2.0}, shuffle_sec=2.0)
    calib = {"cpu_matmul_sec": 0.01, "spark_shuffle_sec": 0.9}
    out = bench._compare_runs({"a": 1.9}, prev, "base", calib)
    assert out["calibration_factor"] == 0.45
    assert out["calibration_factor_alert"] is True
