"""Training metric logging: console + JSONL, iteration timing.

TPU equivalent of mmcv's TextLoggerHook/TensorboardLoggerHook +
IterTimerHook (reference configs/instance/coco_b48n17.py:302-307; hooks
registered at open_set/apis/train.py:192-198): per-interval loss dicts
with `time`/`data_time`, appended to <work_dir>/metrics.jsonl. Optional
``jax.profiler`` trace capture around a chosen step window (the tracing
subsystem the reference lacks, SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(
        self,
        work_dir: Optional[str] = None,
        interval: int = 50,
        tensorboard: bool = False,
    ):
        """``tensorboard=True`` additionally writes event files under
        <work_dir>/tb (reference TensorboardLoggerHook,
        configs/instance/coco_b48n17.py:302-307); requires tensorboardX
        — degrades to JSONL-only with a warning when unavailable."""
        self.interval = interval
        self.work_dir = work_dir
        self._file = None
        self._tb = None
        if work_dir:
            os.makedirs(work_dir, exist_ok=True)
            self._file = open(os.path.join(work_dir, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    from tensorboardX import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
                except Exception as e:  # noqa: BLE001
                    print(f"tensorboard logging unavailable ({e}); JSONL only")
        self._accum: Dict[str, object] = {}
        self._count = 0
        self._last_time = time.perf_counter()
        self._data_time = 0.0
        self._step_time = 0.0

    def log_event(self, record: Dict[str, object]):
        """Append an event record (e.g. {'event': 'train_start'}) to
        metrics.jsonl: multi-leg analyses need leg boundaries to
        exclude each leg's restore/compile warmup, not just the file
        head (tools/soak_train.analyze_soak)."""
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()

    def data_tick(self):
        """Call right after the batch is produced (measures data_time)."""
        now = time.perf_counter()
        self._data_time += now - self._last_time
        self._last_time = now

    def log_step(self, step: int, metrics: Dict[str, float], lr: float = None):
        # accumulate LAZILY (jax array adds dispatch async): converting
        # per step would force a device sync every iteration — multiple
        # seconds per step through a flaky TPU tunnel, and a pipeline
        # bubble everywhere else. One device_get per logging interval.
        for k, v in metrics.items():
            self._accum[k] = v if k not in self._accum else self._accum[k] + v
        self._count += 1
        now = time.perf_counter()
        self._step_time += now - self._last_time
        self._last_time = now
        if step % self.interval != 0 or self._count == 0:
            return
        import jax

        if lr is not None:
            self._accum["lr"] = lr * self._count  # survives the averaging
        vals = jax.device_get(self._accum)  # single sync point
        sync_done = time.perf_counter()
        # the sync absorbs all queued device work for the interval, so
        # charge it to step time
        self._step_time += sync_done - self._last_time
        self._last_time = sync_done
        record = {k: float(v) / self._count for k, v in vals.items()}
        record["step"] = int(step)
        record["data_time"] = self._data_time / self._count
        record["time"] = (self._step_time + self._data_time) / self._count
        short = ", ".join(
            f"{k}={v:.4f}"
            for k, v in record.items()
            if k in ("loss", "loss_cls_emb", "loss_mask", "loss_dice", "time", "lr")
        )
        print(f"[step {step}] {short}", flush=True)
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._tb is not None:
            for k, v in record.items():
                if k != "step":
                    self._tb.add_scalar(f"train/{k}", v, int(step))
        self._accum = {}
        self._count = 0
        self._data_time = 0.0
        self._step_time = 0.0
        self._last_time = time.perf_counter()


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, stop)."""

    def __init__(self, log_dir: str, start_step: int, stop_step: int):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def before_step(self, step: int):
        import jax

        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def after_step(self, step: int):
        import jax

        if step + 1 == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
