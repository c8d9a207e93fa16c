"""Slope-time compact_flagged alone on random flags at a given density.

This is the stage-compact phase of the incremental step in isolation
(BASELINE.md: 13.9 ms flat-128-row -> 11.9 ms flat-72-row -> two-level).
Random flags at 2.3% make every routing tile live, reproducing the
evolved-flow worst case.

Usage:  python scripts/bench_compact.py [N] [dim] [density]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import numpy as np
import jax
import jax.numpy as jnp

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.ops import inc
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.utils.profiling import slope_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    density = float(sys.argv[3]) if len(sys.argv) > 3 else 0.023

    params, state = scenes.double_dam_break(n=n, dim=dim)
    geom = pm.geometry(params)
    shape = (geom.k, geom.pz, geom.n_bx, geom.py, pm.LANES)
    # generate on device — shipping ~750MB of host arrays through the
    # axon tunnel takes longer than the measurement
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    flags = jax.jit(
        lambda k: (jax.random.uniform(k, shape) < density)
        & inc.interior_mask(geom)[None])(keys[0])
    channels = [jax.jit(jax.random.normal, static_argnums=1)(k, shape)
                for k in keys[1:]]
    m_cap = inc.mover_capacity(state.n)
    nt = int(np.prod(shape)) // inc.TILE
    live = int(np.asarray(
        jnp.sum(jnp.any(flags.reshape(nt, -1), axis=1))))
    print(f"N={state.n} slots={int(np.prod(shape))} tiles={nt} "
          f"live={live} flagged={int(np.asarray(jnp.sum(flags)))} "
          f"m_cap={m_cap}", flush=True)

    def f(carry):
        chs, fl = carry
        vals, m = inc.compact_flagged(list(chs), fl, m_cap)
        # feed a scalar of the output back into the carry so neither the
        # compact kernel nor the stitch can be DCE'd by the while loop;
        # channels/flags ride the carry so they are arguments, not HLO
        # constants (a closed-over 750MB literal overflows remote_compile)
        fb = vals[0, :8].sum() + m.astype(jnp.float32)
        return ((chs[0] + 1e-30 * fb,) + tuple(chs[1:]), fl)

    ms = slope_time(f, (tuple(channels), flags)) * 1e3
    print(f"compact_flagged (7x1-ch): {ms:.2f} ms", flush=True)

    # production form: the 6 pos/vel channels as ONE group (one strided
    # DMA per tile) + id — the round-3 DMA-latency fix
    g6 = jax.jit(jnp.stack)(channels[:6])

    def fg(carry):
        g, ch_id, fl = carry
        vals, m = inc.compact_flagged([g, ch_id], fl, m_cap)
        fb = vals[0, :8].sum() + m.astype(jnp.float32)
        return (g + 1e-30 * fb, ch_id, fl)

    ms = slope_time(fg, (g6, channels[6], flags)) * 1e3
    print(f"compact_flagged (6-ch group + id): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
