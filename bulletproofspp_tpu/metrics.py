"""Structured metrics & profiling (SURVEY §5: the reference has only
``--verbosity`` prints, reference: app/Main.hs:214-239; production needs
proofs/sec, verifies/sec, MSM lanes/s and kernel traces).

Lightweight process-global counters + timers; ``trace`` wraps
``jax.profiler.trace`` when a trace directory is requested via
BPPP_TRACE_DIR (inspect with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict

_lock = threading.Lock()
_counters: dict = defaultdict(int)
_timers: dict = defaultdict(float)


def count(name: str, n: int = 1):
    with _lock:
        _counters[name] += n


@contextlib.contextmanager
def timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _timers[name] += dt
            _counters[name + ".calls"] += 1


def snapshot() -> dict:
    with _lock:
        out = {"counters": dict(_counters), "seconds": dict(_timers)}
    rates = {}
    for k, secs in out["seconds"].items():
        calls = out["counters"].get(k + ".calls", 0)
        if secs > 0 and calls:
            rates[k + ".per_sec"] = calls / secs
    out["rates"] = rates
    return out


def reset():
    with _lock:
        _counters.clear()
        _timers.clear()


@contextlib.contextmanager
def trace(label: str = "bppp"):
    """jax.profiler trace scope when BPPP_TRACE_DIR is set; no-op otherwise."""
    trace_dir = os.environ.get("BPPP_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
