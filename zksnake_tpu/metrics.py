"""Structured per-phase metrics (SURVEY.md section 5: the reference has only
an unused wall-clock Timer, utils.py:65-78; the rebuild's BASELINE metrics
need named per-phase timings and throughput counters).

Usage:

    from zksnake_tpu.metrics import phase, report, enable

    enable()                      # or ZKSNAKE_METRICS=1
    with phase("groth16.prove.msm", items=n):
        ...
    print(report())               # {"groth16.prove.msm": {"seconds": ..,
                                  #   "calls": .., "items_per_s": ..}, ...}

When metrics are enabled under JAX, each phase also opens a
jax.profiler.TraceAnnotation so device traces carry the same phase names.
Disabled (the default), `phase` is a no-op with zero overhead.
"""

import os
import time
from collections import defaultdict
from contextlib import contextmanager

_ENABLED = os.environ.get("ZKSNAKE_METRICS", "0") == "1"
_STATS = defaultdict(lambda: {"seconds": 0.0, "calls": 0, "items": 0})


def enable(on=True):
    global _ENABLED
    _ENABLED = on


def enabled():
    return _ENABLED


def reset():
    _STATS.clear()


@contextmanager
def phase(name, items=0):
    """Time a named phase; `items` feeds the items/s throughput counter."""
    if not _ENABLED:
        yield
        return
    ann = None
    try:
        import jax.profiler

        ann = jax.profiler.TraceAnnotation(name)
        ann.__enter__()
    except Exception:
        ann = None
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if ann is not None:
            ann.__exit__(None, None, None)
        s = _STATS[name]
        s["seconds"] += dt
        s["calls"] += 1
        s["items"] += items


def report():
    """Snapshot of accumulated phase stats with derived throughput."""
    out = {}
    for name, s in sorted(_STATS.items()):
        entry = {"seconds": round(s["seconds"], 6), "calls": s["calls"]}
        if s["items"]:
            entry["items"] = s["items"]
            if s["seconds"] > 0:
                entry["items_per_s"] = round(s["items"] / s["seconds"], 1)
        out[name] = entry
    return out
