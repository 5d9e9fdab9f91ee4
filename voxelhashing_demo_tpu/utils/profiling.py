"""Profiling and observability: stage timers, device traces, metric logs.

The reference's observability is colored printf and an nvcc ``-lineinfo``
flag (SURVEY.md §5 tracing row; reference CameraTracking.cpp:37-41,
CMakeLists.txt:22).  Here:

- ``StageTimer``: wall-clock timing of named stages with proper device
  synchronization (``block_until_ready``) — the per-kernel timing harness.
- ``device_trace``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the on-device execution.
- ``MetricsLog``: append-only JSONL of per-frame records (the structured
  replacement for the reference's stdout).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional

import jax


class StageTimer:
    """Accumulates wall-clock stats per named stage.

    Usage::

        timer = StageTimer()
        with timer.stage("icp"):
            out = icp(...)          # block_until_ready called on exit
        print(timer.summary())
    """

    def __init__(self):
        self.records: Dict[str, List[float]] = {}
        self._last_out = None

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            target = holder.get("out", sync_on)
            if target is not None:
                jax.block_until_ready(target)
            self.records.setdefault(name, []).append(
                time.perf_counter() - t0
            )

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.records.items():
            n = len(ts)
            mean = sum(ts) / n
            out[name] = {
                "count": n,
                "mean_ms": round(mean * 1e3, 3),
                "min_ms": round(min(ts) * 1e3, 3),
                "max_ms": round(max(ts) * 1e3, 3),
                "total_s": round(sum(ts), 4),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':24s} {'count':>6s} {'mean':>9s} {'min':>9s} "
                 f"{'max':>9s}"]
        for name, s in self.summary().items():
            lines.append(
                f"{name:24s} {s['count']:6d} {s['mean_ms']:8.2f}m "
                f"{s['min_ms']:8.2f}m {s['max_ms']:8.2f}m"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device-level profiler trace (view with TensorBoard or
    Perfetto).  Wrap the steady-state frames, not compilation."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    """Append-only JSONL metrics file with an in-memory tail."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.rows: List[dict] = []
        self._fh = open(path, "a") if path else None

    def log(self, **fields) -> None:
        row = {k: _jsonable(v) for k, v in fields.items()}
        self.rows.append(row)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()

    def log_step_info(self, frame: int, info) -> None:
        """Record a models.hash_slam.StepInfo."""
        self.log(
            frame=frame,
            tracked=bool(info.tracked),
            icp_error=float(info.icp_error),
            icp_iters=int(info.icp_iters),
            icp_count=int(info.icp_count),
            blocks_allocated=int(info.blocks_allocated),
            blocks_active=int(info.blocks_active),
            blocks_freed=int(info.blocks_freed),
            free_blocks=int(info.free_blocks),
        )

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


def _jsonable(v):
    if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v
