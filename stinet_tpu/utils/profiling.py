"""Profiling & timing utilities — parity with the reference's observability
(SURVEY.md §5): torch.profiler wrapped the 2D train epoch with a
skip/wait/warmup/active schedule writing TB traces
(inpainting2d_trainer.py:319-325); `SyncedTimer` did cuda-synchronized named
section timing (utils/util.py:58-86).

TPU equivalents: `jax.profiler` trace capture viewable in TensorBoard's
profile plugin (an epoch-level schedule mirrors the reference's), and a
device-synchronized section timer. Device memory stats replace the CUDA
memory counters."""
import time
from contextlib import contextmanager

import jax
import numpy as np


class EpochProfiler:
    """Profile selected steps of selected epochs, reference-style schedule:
    skip_first, then cycles of (wait, warmup, active)."""

    def __init__(self, log_dir, skip_first=1, wait=2, warmup=1, active=3,
                 repeat=4, enabled=True):
        self.log_dir = str(log_dir)
        self.schedule = (skip_first, wait, warmup, active, repeat)
        self.enabled = enabled
        self._step = 0
        self._tracing = False

    def _should_trace(self, step):
        skip, wait, warmup, active, repeat = self.schedule
        if step < skip:
            return False
        cycle = wait + warmup + active
        idx = step - skip
        if repeat and idx >= cycle * repeat:
            return False
        return (idx % cycle) >= (wait + warmup)

    def step(self):
        """Call once per training step; starts/stops traces per schedule."""
        if not self.enabled:
            return
        want = self._should_trace(self._step)
        if want and not self._tracing:
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        elif not want and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
        self._step += 1

    def close(self):
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


class SyncedTimer:
    """Named-section timing with device synchronization and warmup-drop
    (reference SyncedTimer semantics, utils/util.py:58-86)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times = {}
        self._counts = {}

    @contextmanager
    def section(self, name, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            # a readback is the only reliable sync on tunneled platforms
            np.asarray(jax.device_get(jax.tree.leaves(sync_value)[0]))
        dt = time.perf_counter() - t0
        c = self._counts.get(name, 0)
        self._counts[name] = c + 1
        if c >= self.warmup:
            self._times.setdefault(name, []).append(dt)

    def results(self):
        return {k: float(np.mean(v)) for k, v in self._times.items()}


def device_memory_stats():
    """Per-device memory metrics (replaces torch.cuda.memory_allocated
    counters, reference inpainting3d_trainer.py:161-164)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {
            "mem_allocated": stats.get("bytes_in_use", 0),
            "mem_reserved": stats.get("bytes_reserved",
                                      stats.get("bytes_limit", 0)),
        }
    except Exception:
        return {"mem_allocated": 0, "mem_reserved": 0}
