"""Slope-time occupancy_bounds alone (+ a Pallas one-pass variant).

The halo+occ phase measures ~1.7 ms @1.2M (profile_inc) against ~0.15 ms
of ideal HBM traffic (read the (K, cells) x channel once).  This isolates
the XLA formulation vs a fused Pallas block kernel.

Usage:  python scripts/bench_occ.py [N] [dim]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import inc
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.utils.profiling import slope_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    state = solver.run(state, params, 100, method="pallas")
    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)

    def f_xla(p6):
        occ_q, occ_s = pm.occupancy_bounds(p6, params, geom)
        return p6 + 1e-30 * (occ_q.ravel()[0] + occ_s.ravel()[0]
                             ).astype(jnp.float32)

    ms = slope_time(f_xla, s0.fields6) * 1e3
    print(f"occupancy_bounds (XLA): {ms:.3f} ms", flush=True)

    def f_halo(p6):
        h = pm.halo_x(p6)
        occ_q, occ_s = pm.occupancy_bounds(h, params, geom)
        return p6 + 1e-30 * (occ_q.ravel()[0] + occ_s.ravel()[0]
                             ).astype(jnp.float32)

    ms = slope_time(f_halo, s0.fields6) * 1e3
    print(f"halo_x + occupancy_bounds: {ms:.3f} ms", flush=True)

    def f_xla_only(p6):
        occ_q, occ_s = pm.occupancy_bounds(p6, params, geom,
                                           use_kernel=False)
        return p6 + 1e-30 * (occ_q.ravel()[0] + occ_s.ravel()[0]
                             ).astype(jnp.float32)

    ms = slope_time(f_xla_only, s0.fields6) * 1e3
    print(f"occupancy_bounds (forced XLA): {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
