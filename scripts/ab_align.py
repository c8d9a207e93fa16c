"""A/B cost decomposition of the density sweep.

Historical findings (pre-24-row-window layout, N=1.47M 3D):
  * full pair math replaced by 1 add/channel ("reads" mode): 0.95x — the
    pair ALU work was hidden; the kernel was NOT math-bound.
  * all candidate reads forced sublane-aligned: 1.06x.
  * candidate reads cut 27 -> 9 per trip: 1.11x.
  * 3-way accumulator split ("multiacc"): 1.12x (chain latency).
  * window build + 9 pre-rolled variants, NO pair loop ("build"): 2.71 ms
    of the 7.09 ms sweep — the per-block fixed cost dominated everything
    the pair-loop probes could reach.
Those findings drove the production rewrite (ops/pallas_sph.py): query-roll
instead of window pre-rolls, 3-way dx accumulators, and the 24-row aligned
window build.  The remaining probe mode measures the new fixed cost:

  build : window build only (24-row aligned copies), no pair loop.

Usage: python scripts/ab_align.py [N] [dim]
"""

from __future__ import annotations

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import inc, pallas_sph
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.ops.planes import LANES, ROWS_PER_BLOCK
from gpufluidsimulator_tpu.utils.profiling import slope_time


def _density_build_kernel(occ_q_ref, occ_s_ref, *args, params, geom):
    dzs, _, _ = pallas_sph._stencil(params.dim)
    n_in = 3 * len(dzs)
    refs, (rho_ref, win) = args[:n_in], args[n_in:]
    refs = [refs[3 * i:3 * i + 3] for i in range(len(dzs))]
    if params.dim == 3:
        bz, bx, by = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    else:
        bz, bx, by = 0, pl.program_id(0), pl.program_id(1)
    bidx = (bz * geom.n_bx + bx) * geom.n_by + by
    occ_q = occ_q_ref[bidx]

    @pl.when(occ_q > 0)
    def _():
        pallas_sph._build_windows(win, refs, pm.N_POS_FIELDS, dzs)
        rho_ref[0, 0, 0, :, :] = win[0, 0, 0, 0:8, :]

    def fill_loop(k1, _):
        @pl.when(k1 >= occ_q)
        def _():
            rho_ref[k1, 0, 0, :, :] = jnp.zeros((ROWS_PER_BLOCK, LANES),
                                                jnp.float32)
        return 0
    jax.lax.fori_loop(0, geom.k, fill_loop, 0)


def density_probe(pos_planes, occ_q, occ_s, params, geom):
    n_dz = 3 if geom.dim == 3 else 1
    grid, in_specs = pallas_sph._grid_and_specs(geom, pm.N_POS_FIELDS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (geom.k, 1, 1, ROWS_PER_BLOCK, LANES),
            pallas_sph._out_index(geom, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_dz, pm.N_POS_FIELDS, geom.k,
                        3 * ROWS_PER_BLOCK, LANES), jnp.float32),
        ],
    )
    kernel = functools.partial(_density_build_kernel, params=params,
                               geom=geom)
    n_copies = len(in_specs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (geom.k, geom.pz, geom.n_bx, geom.py, LANES), jnp.float32),
        interpret=pallas_sph._interpret(),
    )(occ_q.reshape(-1), occ_s.reshape(-1), *([pos_planes] * n_copies))


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
    pos_planes = planes6[:3]

    def run_prod(pp):
        rho = pallas_sph.density_planes(pp, occ_q, occ_s, params, geom)
        return pp + 1e-30 * rho[(0,) * rho.ndim]

    def run_build(pp):
        rho = density_probe(pp, occ_q, occ_s, params, geom)
        return pp + 1e-30 * rho[(0,) * rho.ndim]

    print(f"N={state.n} dim={dim} grid={params.grid_res}")
    t_prod = slope_time(run_prod, pos_planes)
    print(f"density production : {t_prod * 1e3:8.3f} ms", flush=True)
    t = slope_time(run_build, pos_planes)
    print(f"density build      : {t * 1e3:8.3f} ms   "
          f"ratio {t_prod / t:.3f}x", flush=True)


if __name__ == "__main__":
    main()
