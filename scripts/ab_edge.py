"""Micro-bench that recorded the edge-row fetch NEGATIVE result.

Measured @1.47M 3D with the sweeps fetching (2, 128) edge blocks:
edge_rows(6ch) build 1.43 ms, density 8.35 ms (vs 7.09 with full-block
fetches), force 16.16 ms (vs 13.64): the redundant full-block DMA overlaps
the rank-loop compute, so trimming fetch bytes bought nothing and the
extra specs/builds were pure loss.  The production kernels keep the
9-full-block fetch; run this against them to re-check.

Usage: python scripts/ab_edge.py [N] [dim]
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
from gpufluidsimulator_tpu.ops import inc, pallas_sph
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.utils.profiling import slope_time


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    params, state = scenes.double_dam_break(n=n_target, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    state = solver.run(state, params, 50, method="pallas")
    jax.block_until_ready(state.pos)
    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)
    planes6 = pm.halo_x(s0.fields6)
    occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
    rho_h = pm.halo_x(pallas_sph.density_planes(
        planes6[:3], occ_q, occ_s, params, geom))
    rho_h = jax.block_until_ready(rho_h)

    def run_edges(pp):
        e = pm.edge_rows(pp, geom)
        return pp + 1e-30 * e[(0,) * e.ndim]

    def run_force(pp):
        out = pallas_sph.accel_planes(pp, rho_h, occ_q, occ_s, params, geom)
        return pp + 1e-30 * out[(0,) * out.ndim]

    def run_density(pp):
        rho = pallas_sph.density_planes(pp[:3], occ_q, occ_s, params, geom)
        return pp + 1e-30 * rho[(0,) * rho.ndim]

    print(f"N={state.n} dim={dim} grid={params.grid_res}")
    t = slope_time(run_edges, planes6)
    print(f"edge_rows(6ch)  : {t * 1e3:8.3f} ms", flush=True)
    t = slope_time(run_density, planes6)
    print(f"density sweep   : {t * 1e3:8.3f} ms", flush=True)
    t = slope_time(run_force, planes6)
    print(f"force sweep     : {t * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
