"""Metrics, logging, and profiling utilities.

The reference's observability is `print` statements with wall-clock deltas
every 20 iterations (`train_function.py:99-103`) and nothing else
(SURVEY.md §5).  Here: structured running averages, step-time/images-per-sec
counters, and `jax.profiler` trace hooks.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Any, Dict, Iterator, Optional

import numpy as np

logger = logging.getLogger("objectdetection_ssd_tpu")


def setup_logging(level: int = logging.INFO) -> None:
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s",
                              "%H:%M:%S"))
        logger.addHandler(handler)
    logger.propagate = False  # avoid double lines via the root logger
    logger.setLevel(level)


class RunningAverage:
    """Weighted running average (reference weights by batch size,
    `train_function.py:98`).

    Values may be device scalars: they are held unrealized and only pulled
    to the host when the average is read.  A `float()` on a jitted step's
    metric is a device sync — doing it every step serializes device
    execution with host-side batching, so the Trainer reads averages only
    on log steps and at epoch end."""

    def __init__(self):
        self.total = 0.0
        self.weight = 0.0
        self._pending = []

    # Bound on retained unrealized device scalars: with the log cadence off
    # (log_every_steps=0) nothing else flushes until epoch end, and holding
    # one device buffer per step for a long epoch adds up.  By the time the
    # bound is hit the oldest values have long since been computed, so the
    # flush is effectively sync-free.
    _MAX_PENDING = 256

    def update(self, value, weight: float = 1.0) -> None:
        self._pending.append((value, weight))
        self.weight += weight
        if len(self._pending) >= self._MAX_PENDING:
            self._flush()

    def _flush(self) -> None:
        if self._pending:
            self.total += sum(float(v) * w for v, w in self._pending)
            self._pending.clear()

    @property
    def average(self) -> float:
        self._flush()
        return self.total / self.weight if self.weight else float("nan")


class MetricsLogger:
    """Accumulates per-step metric dicts; logs every ``log_every`` steps.

    ``on_log``: optional callback invoked with (step, {name: average})
    at each log event — the hook TensorBoard/W&B-style writers attach to
    (device scalars have already been realized at that point, so the
    callback adds no extra syncs)."""

    def __init__(self, log_every: int = 20, prefix: str = "train",
                 on_log=None):
        self.log_every = log_every
        self.prefix = prefix
        self.on_log = on_log
        self.averages: Dict[str, RunningAverage] = {}
        self._step = 0
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, metrics: Dict[str, Any], batch_size: int) -> None:
        # Device scalars are stored unrealized; the host sync happens only
        # when a log line is emitted (below) or summary() is read.
        for k, v in metrics.items():
            self.averages.setdefault(k, RunningAverage()).update(
                v, batch_size)
        self._images += batch_size
        self._step += 1
        if self.log_every and self._step % self.log_every == 0:
            dt = time.perf_counter() - self._t0
            ips = self._images / dt if dt > 0 else 0.0
            parts = " ".join(
                f"{k}={a.average:.4f}" for k, a in self.averages.items())
            logger.info("[%s] step=%d %s img/s=%.1f",
                        self.prefix, self._step, parts, ips)
            if self.on_log is not None:
                scalars = {k: a.average for k, a in self.averages.items()}
                scalars["img_per_sec"] = ips
                self.on_log(self._step, scalars)

    def summary(self) -> Dict[str, float]:
        return {k: a.average for k, a in self.averages.items()}


class TensorBoardWriter:
    """Optional TensorBoard scalar logging via tensorboardX (no TF needed).

    The reference's only observability is prints + a loss-curve PNG in its
    README (`train_function.py:99-103`, SURVEY.md §5); this writes real
    event files.  Import is lazy and failure-tolerant: without tensorboardX
    the writer becomes a no-op with a warning."""

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(log_dir)
        except Exception as e:                       # pragma: no cover
            logger.warning("tensorboard logging disabled: %s", e)

    def scalars(self, prefix: str, step: int,
                values: Dict[str, float]) -> None:
        if self._writer is None:
            return
        for k, v in values.items():
            self._writer.add_scalar(f"{prefix}/{k}", v, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class Stopwatch:
    """Step-time tracker with percentile report."""

    def __init__(self):
        self.times = []
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self):
        self.times.append(time.perf_counter() - self._t)

    def percentile(self, p: float) -> float:
        return float(np.percentile(self.times, p)) if self.times else 0.0

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]) -> Iterator[None]:
    """`jax.profiler` trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def write_history(path: str, history: Dict[str, Any]) -> None:
    """Persist epoch-loss history as JSON (the reference keeps it inside the
    torch checkpoint dict, `train_function.py:119`)."""
    with open(path, "w") as f:
        json.dump(history, f, indent=2)
