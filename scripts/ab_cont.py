"""A/B: continuity-density tier vs summation-density pallas_inc on the
real chip — step time at both operating points + carried-rho drift.

Usage: python scripts/ab_cont.py [N] [dim] [warm] [drift_steps]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    drift_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    m_cap = inc.mover_capacity(state.n)
    print(f"N={state.n} dim={dim} grid={params.grid_res} warm={warm}",
          flush=True)
    state = solver.run(state, params, min(warm, 100), method="pallas")
    if warm > 100:
        state = solver.run(state, params, warm - 100, method="pallas_inc")
    jax.block_until_ready(state.pos)

    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)
    t0 = slope_time(lambda s: inc.step_planes(s, params, geom, m_cap),
                    s0, k1=2, k2=10, reps=3)
    print(f"pallas_inc       {t0*1e3:8.3f} ms/step "
          f"({state.n/t0:.3e} p-steps/s)", flush=True)

    sc = inc.to_planes(state.pos, state.vel, state.ids, params, geom,
                       continuity=True)
    # age=1 so the slope window never hits a resum step (the steady-state
    # continuity rate); the resum step costs +1 density sweep every
    # RESUM_EVERY steps, amortized separately
    sc = sc._replace(rhop=jnp.zeros_like(sc.idp), age=jnp.int32(1))
    # fill rhop with a real summation so the EOS sees sane densities
    p6 = pm.halo_x(sc.fields6)
    occ_q, occ_s = pm.occupancy_bounds(p6, params, geom)
    sc = sc._replace(rhop=pallas_sph.density_planes(p6[:3], occ_q, occ_s,
                                                    params, geom))
    t1 = slope_time(lambda s: inc.step_planes(s, params, geom, m_cap),
                    sc, k1=2, k2=10, reps=3)
    print(f"pallas_inc_cont  {t1*1e3:8.3f} ms/step "
          f"({state.n/t1:.3e} p-steps/s)  [steady, no resum]", flush=True)
    print(f"speedup {t0/t1:.3f}x; saved {1e3*(t0-t1):.2f} ms", flush=True)

    if drift_steps:
        # carried-rho drift vs a fresh summation after drift_steps
        # continuity steps (no resum in between)
        @jax.jit
        def roll(s):
            def body(s, _):
                return inc.step_planes(s, params, geom, m_cap), None
            return jax.lax.scan(body, s, None, length=drift_steps)[0]

        sd = roll(sc)
        p6 = pm.halo_x(sd.fields6)
        occ_q, occ_s = pm.occupancy_bounds(p6, params, geom)
        rho_sum = pallas_sph.density_planes(p6[:3], occ_q, occ_s, params,
                                            geom)
        valid = (sd.fields6[0] < pm.SENTINEL * 0.5) \
            & inc.interior_mask(geom)[None]
        err = jnp.where(valid, jnp.abs(sd.rhop - rho_sum), 0.0)
        mx = float(jnp.max(err))
        mean = float(jnp.sum(err) / jnp.sum(valid))
        print(f"drift after {drift_steps} cont steps: max {mx:.2f} "
              f"mean {mean:.3f} (rho0 = {params.rest_density})", flush=True)


if __name__ == "__main__":
    main()
