"""Per-phase slope-timing of the incremental (planes-resident) step @N.

Same cumulative-prefix method as profile_step.py, but over the v2
inc.step_planes pipeline (in-kernel mover emission) with IncState as the
carried value.  Phase deltas at fusion boundaries are +-1-2 ms noisy;
trust the full-step row.

Usage:  python scripts/profile_inc.py [N] [dim] [warm] [mode]
mode: 'sum' (default, summation density) | 'cont' (continuity tier — the
density-sweep phase collapses to the never-taken resum cond; rho rides as
an 8th channel through stage/arrival/consolidate)
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
from gpufluidsimulator_tpu.models.params import SimParams
from gpufluidsimulator_tpu.ops import inc, pallas_sph
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.utils.profiling import slope_time


def feedback(fields6, *vals):
    s = jnp.float32(0.0)
    for v in vals:
        s = s + v[(0,) * v.ndim].astype(jnp.float32)
    return fields6 + 1e-30 * s


def make_prefixes(params: SimParams, m_cap: int, cont: bool = False):
    geom = pm.geometry(params)

    def p_occ(s):
        planes6 = pm.halo_x(s.fields6)
        occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
        return s._replace(fields6=feedback(s.fields6, planes6, occ_q, occ_s))

    def p_density(s):
        planes6 = pm.halo_x(s.fields6)
        occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
        rho_p = pallas_sph.density_planes(planes6[:3], occ_q, occ_s,
                                          params, geom)
        return s._replace(fields6=feedback(s.fields6, planes6, rho_p))

    def _rho_h(s, planes6, occ_q, occ_s):
        if cont:
            need = (s.age % inc.RESUM_EVERY) == 0
            rho_p = jax.lax.cond(
                need,
                lambda _: pallas_sph.density_planes(
                    planes6[:3], occ_q, occ_s, params, geom),
                lambda _: s.rhop, None)
        else:
            rho_p = pallas_sph.density_planes(planes6[:3], occ_q, occ_s,
                                              params, geom)
        return pm.halo_x(rho_p)

    def _swept(s):
        planes6 = pm.halo_x(s.fields6)
        occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
        rho_h = _rho_h(s, planes6, occ_q, occ_s)
        out = pallas_sph.accel_planes(planes6, rho_h, occ_q, occ_s, params,
                                      geom, fuse_integrate=True,
                                      emit_movers=True, continuity=cont)
        if cont:
            return out          # (new6, rho_new, flagp)
        return out[0], None, out[1]

    def p_force(s):
        new6, rho_new, flagp = _swept(s)
        extras = [rho_new] if cont else []
        return s._replace(fields6=feedback(s.fields6, new6, flagp, *extras))

    def p_stage(s):
        new6, rho_new, flagp = _swept(s)
        movers, m, tot = inc.extract_movers(new6, s.idp, flagp, geom, m_cap,
                                            rhop=rho_new)
        return s._replace(fields6=feedback(s.fields6, new6, movers,
                                           m.astype(jnp.float32)))

    def p_arrival(s):
        new6, rho_new, flagp = _swept(s)
        movers, m, tot = inc.extract_movers(new6, s.idp, flagp, geom, m_cap,
                                            rhop=rho_new)
        arr, live_t, lost_dup = inc.arrival_planes(movers, m, params, geom)
        return s._replace(fields6=feedback(s.fields6, new6, flagp, arr))

    def p_full(s):
        return inc.step_planes(s, params, geom, m_cap)

    rows = [("halo+occupancy", p_occ)]
    if not cont:
        rows.append(("(+)density", p_density))
    rows += [("(+)force+integ+emit", p_force),
             ("(+)stage-compact", p_stage),
             ("(+)arrival-planes", p_arrival),
             ("(+)consolidate=full", p_full)]
    return rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    cont = len(sys.argv) > 4 and sys.argv[4] == "cont"

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    m_cap = inc.mover_capacity(state.n)
    print(f"N={state.n} dim={dim} grid={params.grid_res} "
          f"k={params.cell_capacity} m_cap={m_cap} "
          f"mode={'cont' if cont else 'sum'}", flush=True)
    state = solver.run(state, params, min(warm, 100), method="pallas")
    if warm > 100:
        state = solver.run(state, params, warm - 100, method="pallas_inc")
    jax.block_until_ready(state.pos)
    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom,
                       continuity=cont)
    if cont:
        # steady-state operating point: rho filled, age off the resum phase
        p6 = pm.halo_x(s0.fields6)
        occ_q, occ_s = pm.occupancy_bounds(p6, params, geom)
        s0 = s0._replace(
            rhop=pallas_sph.density_planes(p6[:3], occ_q, occ_s, params,
                                           geom),
            age=jnp.int32(1))

    prev = 0.0
    for name, fn in make_prefixes(params, m_cap, cont=cont):
        t = slope_time(fn, s0, k1=2, k2=8, reps=2)
        print(f"{name:22s} cum {t*1e3:8.2f} ms   phase {(t-prev)*1e3:8.2f} ms",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
