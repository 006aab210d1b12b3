"""Off-by-default profiling layer.

The reference leaves debug printfs enabled in its hot loops
(fe/lib/lal_annp.cpp:546,603-604; fe/src/pair_annp.cpp:143 prints every pair
every step) and accumulates UCL_Timers per phase (SURVEY.md section 5). Here:
a zero-cost-when-off phase timer plus a hook into the JAX trace profiler.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_ENABLED = False
_TOTALS: dict = defaultdict(float)
_COUNTS: dict = defaultdict(int)


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def phase(name: str):
    """Wall-time a named phase (blocks on device work when enabled)."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        # block so device work is attributed to the right phase
        try:
            jax.effects_barrier()
        except Exception:
            pass
        dt = time.perf_counter() - t0
        _TOTALS[name] += dt
        _COUNTS[name] += 1


def report() -> str:
    """Per-phase table like the GPU package's end-of-run device-time summary
    (device->output_times, fe/lib/lal_base_annp.cpp:118-119)."""
    lines = ["%-24s %10s %8s %12s" % ("phase", "total[s]", "calls", "avg[ms]")]
    for name in sorted(_TOTALS, key=_TOTALS.get, reverse=True):
        t, c = _TOTALS[name], _COUNTS[name]
        lines.append("%-24s %10.3f %8d %12.3f" % (name, t, c, t / c * 1e3))
    return "\n".join(lines)


def reset() -> None:
    _TOTALS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def jax_trace(logdir: str):
    """Capture a JAX/XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
