"""Training hooks: LogBuffer, text logger, timers.

Keeps the reference's observability surface (torchie/trainer/
log_buffer.py, hooks/logger/text.py:12-142, hooks/iter_timer.py:6-24):
running-average LogBuffer flushed every ``interval`` steps with the same key
names (data_time/transfer_time/forward_time/time), lr, per-loss means, and
device memory when the backend exposes it.
"""

import logging
import os
import time
from collections import OrderedDict

import numpy as np


class LogBuffer:
    def __init__(self):
        self.val_history = OrderedDict()
        self.n_history = OrderedDict()
        self.output = OrderedDict()
        self.ready = False

    def clear(self):
        self.val_history.clear()
        self.n_history.clear()
        self.clear_output()

    def clear_output(self):
        self.output.clear()
        self.ready = False

    def update(self, vars, count=1):
        for k, v in vars.items():
            self.val_history.setdefault(k, []).append(v)
            self.n_history.setdefault(k, []).append(count)

    def average(self, n=0):
        for k in self.val_history:
            vals = np.array(self.val_history[k][-n:], dtype=np.float64)
            nums = np.array(self.n_history[k][-n:], dtype=np.float64)
            self.output[k] = float((vals * nums).sum() / nums.sum())
        self.ready = True


def get_logger(work_dir=None, name="partner_tpu", level=logging.INFO):
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if work_dir:
        os.makedirs(work_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
        fh = logging.FileHandler(os.path.join(work_dir, f"{stamp}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class TextLoggerHook:
    def __init__(self, logger, interval=5, total_steps=None):
        self.logger = logger
        self.interval = interval
        self.total_steps = total_steps

    def after_iter(self, buffer: LogBuffer, step, epoch, lr,
                   max_steps_in_epoch=None):
        if (step + 1) % self.interval:
            return
        buffer.average(self.interval)
        # step is global; display the within-epoch iter like the reference
        it = (step % max_steps_in_epoch) + 1 if max_steps_in_epoch else step + 1
        parts = [f"Epoch [{epoch}][{it}"
                 + (f"/{max_steps_in_epoch}]" if max_steps_in_epoch else "]")]
        parts.append(f"lr: {lr:.5f}")
        for k, v in buffer.output.items():
            if k.endswith("time"):
                parts.append(f"{k}: {v:.3f}")
            else:
                parts.append(f"{k}: {v:.4f}")
        mem = device_memory_mb()
        if mem is not None:
            parts.append(f"memory: {mem:.0f}MB")
        self.logger.info(", ".join(parts))
        buffer.clear_output()


def device_memory_mb():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 2 ** 20
    except Exception:
        pass
    return None


class IterTimer:
    """Phase timer mirroring IterTimerHook's keys."""

    def __init__(self):
        self.t = time.perf_counter()

    def lap(self):
        now = time.perf_counter()
        dt = now - self.t
        self.t = now
        return dt


class TensorBoardLoggerHook:
    """TensorBoard scalar logging (the reference's TensorboardLoggerHook,
    torchie/trainer/hooks/logger/tensorboard.py) via tensorboardX."""

    def __init__(self, log_dir, interval=5):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(log_dir)
        self.interval = interval

    def log(self, step, scalars, lr=None):
        if step % self.interval:
            return
        for k, v in scalars.items():
            try:
                self.writer.add_scalar(f"train/{k}", float(v), step)
            except (TypeError, ValueError):
                pass
        if lr is not None:
            self.writer.add_scalar("train/lr", float(lr), step)

    def close(self):
        self.writer.close()


class MetricsSinkHook:
    """Structured metrics sink — the remote-metrics-service surface of the
    reference's PaviLoggerHook (torchie/trainer/hooks/logger/pavi.py),
    which streams {step, metric: value} records to SenseTime's proprietary
    Pavi service. Here the transport is pluggable: a JSON-lines file by
    default (ingestible by any dashboard), or any callable sink for a real
    service client. Registered alongside the other logger hooks so configs
    naming PaviLoggerHook keep working.
    """

    def __init__(self, path=None, sink=None, interval=5, session_text=""):
        import json

        self._json = json
        self.interval = interval
        self.session_text = session_text
        if sink is not None:
            self.sink = sink
            self._fh = None
        else:
            path = path or "metrics.jsonl"
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
            self.sink = lambda rec: (
                self._fh.write(self._json.dumps(rec) + "\n"),
                self._fh.flush(),
            )

    def log(self, step, scalars, lr=None, epoch=None):
        if step % self.interval:
            return
        rec = {"step": int(step)}
        if epoch is not None:
            rec["epoch"] = int(epoch)
        if lr is not None:
            rec["lr"] = float(lr)
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self.sink(rec)

    def close(self):
        if self._fh is not None:
            self._fh.close()


# config-compat alias (reference hook name)
PaviLoggerHook = MetricsSinkHook


class ClosureHook:
    """Attach an ad-hoc callable as a hook stage (the reference's
    ClosureHook, torchie/trainer/hooks/closure.py): fn_name is one of the
    hook-point method names, fn the callable bound to it."""

    def __init__(self, fn_name, fn):
        assert callable(fn)
        setattr(self, fn_name, fn)
