"""bench._fit_summary: the FINAL printed line must carry per-query
timings (r11 verdict #1 — the driver's PERF per_query/scaling were
empty two rounds running) AND fit whole inside the driver's 2000-char
stdout tail (every committed BENCH_r*.json tail is exactly 2000 chars;
a longer line reproduces the r2 "parsed": null failure). The complete
157-query map cannot fit (names alone sum to 3.6 KB), so the summary
takes the most expensive queries first and accounts for the rest.

Also: the seeded standing-build accounting (r11 verdict #2) and the
variance-adjudication split of the regression flags (r11 verdict #8).
"""

from __future__ import annotations

import json

import bench


def _realistic_out(n_queries=157):
    """A full bench record shaped like a real r11 run: long query
    names, vs_prev with flag lists, dml block."""
    queries = {
        f"streaming_fingerprint_dedup_q{i:03d}": round(0.3 + (i % 40) * 0.5, 3)
        for i in range(n_queries)
    }
    return {
        "metric": "headline_queries_total_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "calibration": {"cpu_matmul_sec": 0.0217, "spark_shuffle_sec": 0.826, "cpus": 32},
        "calibration_post": {"cpu_matmul_sec": 0.022, "spark_shuffle_sec": 0.83, "cpus": 32},
        "intra_run_drift": 1.005,
        "intra_run_drift_alert": False,
        "seed_builds_sec": 17.32,
        "dml_parity_wall": {
            "elapsed_sec": 3.668, "n_ops": 25000, "n_final_rows": 12612,
            "parity": True, "n_micro_batches": 2, "batch_p50_ms": 1511,
            "batch_p95_ms": 1537,
        },
        "stage_metrics": {
            n: {"memory_spill_bytes": 0, "disk_spill_bytes": 0,
                "shuffle_read_bytes": 1, "shuffle_write_bytes": 1,
                "input_bytes": 1}
            for n in list(queries)[:5]
        },
        "vs_prev": {
            "baseline": "bench_full_sf0.1.json",
            "comparable_total": 300.1,
            "comparable_prev_total": 307.2,
            "total_ratio": 0.977,
            "total_ratio_normalized": 0.977,
            "calibration_factor": 1.0,
            "calibration_factor_alert": False,
            "new_queries_total": 0.0,
            "regressions_over_2x": [f"streaming_fingerprint_dedup_q{i:03d}" for i in range(11)],
            "regressions_over_2x_raw": [f"streaming_fingerprint_dedup_q{i:03d}" for i in range(7)],
            "regressions_over_2x_adjudicated": ["multimodal_audio_stats"],
        },
    }


def test_fit_summary_fits_the_driver_tail_window():
    out = _realistic_out()
    line = json.dumps(bench._fit_summary(out))
    assert len(line) <= bench._DRIVER_TAIL_BUDGET
    s = json.loads(line)
    # the per-query map is present and non-trivial even in this
    # worst case (33-char names, noisy-run flag lists); the committed
    # r11 record fits ~27 queries ≈ 62% of total seconds
    assert len(s["queries"]) >= 10
    # included entries are exact copies and cover the MOST expensive
    incl = s["queries"]
    cheapest_incl = min(incl.values())
    for n, t in incl.items():
        assert out["queries"][n] == t
    excluded = [t for n, t in out["queries"].items() if n not in incl]
    assert all(t <= cheapest_incl for t in excluded)
    # the omitted remainder is fully accounted
    assert s["queries_omitted"]["n"] == len(out["queries"]) - len(incl)
    assert (
        round(s["queries_omitted"]["sec"] + sum(incl.values()), 2)
        == round(out["value"], 2)
    )
    # seed-build line item + headline fields survive the fitting
    assert s["seed_builds_sec"] == 17.32
    assert s["value"] == out["value"]
    assert s["n_queries"] == 157
    # flag lists are capped with counts preserved
    assert s["vs_prev"]["n_regressions_over_2x"] == 11
    assert len(s["vs_prev"]["regressions_over_2x"]) == 6


def test_fit_summary_small_run_keeps_every_query():
    out = _realistic_out(n_queries=10)
    s = bench._fit_summary(out)
    assert len(s["queries"]) == 10
    assert s["queries_omitted"] == {"n": 0, "sec": 0.0}


def test_compare_runs_diverts_adjudicated_variance_flags():
    """An adjudicated in-suite-variance query >2× lands in the
    adjudicated list — recorded, out of the actionable gate; a real
    regression elsewhere still flags normally."""
    name = next(iter(bench.VARIANCE_ADJUDICATED))
    prev = {
        "queries": {name: 1.0, "real_regression": 1.0, "fine": 1.0},
        "calibration": {"spark_shuffle_sec": 1.0},
    }
    timings = {name: 3.5, "real_regression": 3.5, "fine": 1.1}
    calib = {"spark_shuffle_sec": 1.0}
    out = bench._compare_runs(timings, prev, "base", calib)
    assert out["regressions_over_2x"] == ["real_regression"]
    assert out["regressions_over_2x_raw"] == ["real_regression"]
    assert out["regressions_over_2x_adjudicated"] == [name]
    # the adjudicated ratio is still on the record
    assert out["ratios"][name] == 3.5


def test_seeded_build_seconds_are_recorded(tmp_path):
    from kafkaconnect_spark import queries_r7

    queries_r7.STANDING_BUILD_SECONDS.pop("t_probe", None)
    calls = []

    def _build(d):
        calls.append(d)
        (tmp_path / "src").mkdir(exist_ok=True)
        import os

        with open(os.path.join(d, "MANIFEST.json"), "w") as fh:
            fh.write("{}")

    # a table path that exists so the cache key is stable
    table = tmp_path / "tbl.parquet"
    table.write_text("x")
    d1 = queries_r7._seeded_index_dir(
        "probe", str(tmp_path), "tbl", "t_probe", _build
    )
    d2 = queries_r7._seeded_index_dir(
        "probe", str(tmp_path), "tbl", "t_probe", _build
    )
    assert len(calls) == 1  # built once per process
    assert d1 != d2  # each caller gets its own byte-copy
    assert queries_r7.STANDING_BUILD_SECONDS["t_probe"] >= 0.0
    queries_r7.STANDING_BUILD_SECONDS.pop("t_probe", None)
