"""Regression-alert logic in bench.py (VERDICT r3 "What's wrong" #1: the
alert read the top-level ``queries`` key, but driver-committed
``BENCH_r*.json`` artifacts nest it under ``parsed.queries``, so the
>1.5x alert could never fire).  No SparkSession needed."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_alert_fires_on_driver_wrapper_artifact():
    # the exact shape the driver commits: query map under parsed.queries
    prev = {"n": 1, "rc": 0, "parsed": {"queries": {"q1": 1.0, "q2": 2.0}}}
    alerts = bench.compute_alerts(
        {"q1": 1.6, "q2": 2.1}, {}, prev, "BENCH_r03.json"
    )
    assert len(alerts) == 1 and alerts[0].startswith("q1:")
    assert "BENCH_r03.json" in alerts[0]


def test_alert_fires_on_raw_bench_artifact():
    prev = {"queries": {"q1": 1.0}}
    assert bench.compute_alerts({"q1": 1.51}, {}, prev, "x") != []
    assert bench.compute_alerts({"q1": 1.49}, {}, prev, "x") == []


def test_scaling_efficiency_gate_alert():
    alerts = bench.compute_alerts(
        {}, {"scaling_efficiency_8_to_32": 0.79, "turns_per_sec@32": 1.0}, {}, ""
    )
    assert alerts == ["scaling_efficiency_8_to_32=0.79 below the 0.8 gate"]


def test_no_prior_artifact_is_quiet():
    assert bench.compute_alerts({"q1": 9.9}, {}, {}, "") == []
