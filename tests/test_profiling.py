"""Observability utilities: stage timers and metric logs."""

import json

import jax.numpy as jnp

from voxelhashing_demo_tpu.utils import profiling


def test_stage_timer_accumulates():
    t = profiling.StageTimer()
    for _ in range(3):
        with t.stage("work") as h:
            h["out"] = jnp.ones((8, 8)) * 2
    s = t.summary()
    assert s["work"]["count"] == 3
    assert s["work"]["mean_ms"] >= 0
    assert "work" in t.report()


def test_metrics_log(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = profiling.MetricsLog(path)
    log.log(frame=0, err=jnp.float32(0.5), ok=True)
    log.log(frame=1, err=0.25, ok=False)
    log.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["frame"] == 0 and abs(rows[0]["err"] - 0.5) < 1e-6
    assert rows[1]["ok"] is False
    assert len(log.rows) == 2
