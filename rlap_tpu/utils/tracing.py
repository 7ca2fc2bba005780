"""Tracing / profiling utilities — the TPU-native equivalent of the
reference's `TRACER` printf macro (`rlap/csrc/tracer.h:5-8`) and
memory-profiler harness (`scripts/augmentor_benchmarks.py:366-393`).

Three levels:
* `TRACER(fmt, *args)` — stderr printf with flush, gated by the
  RLAP_TPU_TRACE env var (like the reference's compile-time macro).
* `trace(dir)` — context manager around `jax.profiler.trace`; produces a
  TensorBoard-loadable XPlane trace of every XLA kernel on device.
* `annotate(name)` — `jax.profiler.TraceAnnotation` wrapper so host-side
  phases show up as named spans inside the device trace.
* `Timer` — wall-clock phase timer with a `report()` table, materializing
  outputs per phase (`block_until_ready` alone can read falsely fast on
  remote backends; see .claude/skills/verify).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Dict, Optional

import jax


def TRACER(fmt: str, *args) -> None:
    if os.environ.get("RLAP_TPU_TRACE"):
        print(fmt % args if args else fmt, file=sys.stderr, flush=True)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rlap_tpu_trace"):
    """Capture a device profile: `with trace('/tmp/t'): step()` then
    inspect with TensorBoard or xprof."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating phase timer: `with timer("sort"): out = f(x)`.
    Synchronizes jax values on phase exit so the numbers are honest."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, file=sys.stderr) -> Dict[str, float]:
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            cnt = self.counts[name]
            print(f"{name:40s} {total * 1e3:10.2f} ms total "
                  f"({cnt}x, {total / cnt * 1e3:.2f} ms each)",
                  file=file, flush=True)
        return dict(self.totals)
