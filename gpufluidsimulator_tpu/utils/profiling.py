"""Tracing / profiling utilities.

Reference counterpart: CUDA event timers + external nvprof (SURVEY.md §5.1).
Rebuild: `jax.profiler` traces (TensorBoard/Perfetto), compiled cost
analysis, and a **slope timer** — on this TPU environment the host<->device
sync costs ~30ms (tunnel latency) and `block_until_ready` does not reliably
fence, so per-step time is measured as the slope of wall time vs scan length
with a forced scalar host pull.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def slope_time(step_fn: Callable, init_state, k1: int = 2, k2: int = 12,
               reps: int = 3) -> float:
    """Seconds per step_fn application, latency-free.

    step_fn: state -> state (pure). Runs k applications inside one jitted
    fori_loop, pulls a scalar to the host, and differences two loop lengths.
    """
    def make(k):
        @jax.jit
        def f(s):
            s = jax.lax.fori_loop(0, k, lambda i, s: step_fn(s), s)
            # pull ONE element of EVERY leaf: XLA's while-loop DCE removes
            # carry elements whose instructions feed no live output, so
            # summing only the first leaf lets independent carry chains be
            # deleted wholesale and the measurement lie (observed: a
            # "2.3 ms" binning variant that was really ~11 ms).
            tot = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(s):
                tot = tot + leaf.ravel()[0].astype(jnp.float32)
            return tot
        float(f(init_state))                     # compile + warm
        t0 = time.time()
        for _ in range(reps):
            float(f(init_state))
        return (time.time() - t0) / reps

    t1, t2 = make(k1), make(k2)
    return max((t2 - t1) / (k2 - k1), 1e-12)


def cost_analysis(fn: Callable, *args) -> Dict:
    """XLA cost analysis of a jitted function (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):                   # older jax returns [dict]
        costs = costs[0] if costs else {}
    keep = {}
    for key in ("flops", "bytes accessed", "transcendentals",
                "utilization operand 0 {}"):
        if costs and key in costs:
            keep[key] = costs[key]
    return keep or dict(costs or {})


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context -> TensorBoard/Perfetto dump in logdir."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
