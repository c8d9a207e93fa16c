"""Per-phase slope-timing of the Pallas step @N on the real TPU chip.

Phases are timed as cumulative prefixes of the step pipeline, each made
state->state by folding a dynamic scalar back into pos with a 1e-30 weight
(exact no-op in f32, but defeats DCE).  Differences of consecutive prefixes
give per-phase cost; the axon tunnel latency cancels in the slope method.

Usage:  python scripts/profile_step.py [N] [dim]
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
from gpufluidsimulator_tpu.ops import pallas_sph, physics, route
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.utils.profiling import slope_time


def feedback(pos, *vals):
    s = jnp.float32(0.0)
    for v in vals:
        s = s + v[(0,) * v.ndim].astype(jnp.float32)
    return pos + 1e-30 * s


def make_prefixes(params: SimParams):
    geom = pm.geometry(params)

    def binned(state):
        """Everything up to (and including) the two sorts + rank scan
        (mirrors planes.build_planes)."""
        pos, vel, ids = state.pos, state.vel, state.ids
        n = pos.shape[0]
        dim = params.dim
        cid = pm.cell_linear_parts(pos, params, geom)
        operands = (cid,) + tuple(pos[:, j] for j in range(dim)) \
            + tuple(vel[:, j] for j in range(dim)) + (ids,)
        out = jax.lax.sort(operands, num_keys=1, is_stable=False)
        cid_sorted = out[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        run_start = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.where(cid_sorted[1:] != cid_sorted[:-1], idx[1:], 0)])
        rank = idx - jax.lax.cummax(run_start)
        in_domain = cid_sorted < geom.cells
        ok1 = (rank < geom.k) & in_domain
        slot1 = jnp.where(ok1, rank * geom.cells + cid_sorted,
                          geom.k * geom.cells)
        out2 = jax.lax.sort((slot1,) + out[1:], num_keys=1, is_stable=False)
        return out2

    def p_sorts(state):
        out2 = binned(state)
        return state._replace(pos=feedback(state.pos, *out2))

    def table_of(state):
        return pm.build_planes(state.pos, state.vel, state.ids, params, geom)

    def p_place(state):
        t = table_of(state)
        return state._replace(pos=feedback(state.pos, t.planes, t.pos_s))

    def p_occ(state):
        t = table_of(state)
        occ_q, occ_s = pm.occupancy_bounds(t.planes, params, geom)
        return state._replace(pos=feedback(state.pos, t.planes, t.pos_s,
                                          occ_q, occ_s))

    def p_density(state):
        t = table_of(state)
        occ_q, occ_s = pm.occupancy_bounds(t.planes, params, geom)
        rho_p = pallas_sph.density_planes(t.planes[:pm.N_POS_FIELDS],
                                          occ_q, occ_s, params, geom)
        return state._replace(pos=feedback(state.pos, t.planes, t.pos_s,
                                          occ_q, rho_p))

    def p_force(state):
        t = table_of(state)
        occ_q, occ_s = pm.occupancy_bounds(t.planes, params, geom)
        rho_p = pallas_sph.density_planes(t.planes[:pm.N_POS_FIELDS],
                                          occ_q, occ_s, params, geom)
        acc_p = pallas_sph.accel_planes(t.planes, pm.halo_x(rho_p),
                                        occ_q, occ_s, params, geom)
        return state._replace(pos=feedback(state.pos, t.planes, t.pos_s,
                                          acc_p))

    def p_extract(state):
        t = table_of(state)
        occ_q, occ_s = pm.occupancy_bounds(t.planes, params, geom)
        rho_p = pallas_sph.density_planes(t.planes[:pm.N_POS_FIELDS],
                                          occ_q, occ_s, params, geom)
        acc_p = pallas_sph.accel_planes(t.planes, pm.halo_x(rho_p),
                                        occ_q, occ_s, params, geom)
        out = route.extract_per_particle(acc_p, t.shifts, t.slot,
                                         t.starts, geom)
        return state._replace(pos=feedback(state.pos, t.planes, t.pos_s, out))

    def p_full(state):
        return solver._METHODS["pallas"](state, params)

    return [("sorts+rank", p_sorts),
            ("(+)place+halo", p_place),
            ("(+)occupancy", p_occ),
            ("(+)density", p_density),
            ("(+)force", p_force),
            ("(+)extract", p_extract),
            ("(+)integrate=full", p_full)]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    print(f"N={state.n} dim={dim} grid={params.grid_res} "
          f"k={params.cell_capacity}", flush=True)
    state = solver.run(state, params, warm, method="pallas")
    jax.block_until_ready(state.pos)

    prev = 0.0
    for name, fn in make_prefixes(params):
        t = slope_time(fn, state, k1=2, k2=8, reps=2)
        print(f"{name:22s} cum {t*1e3:8.2f} ms   phase {(t-prev)*1e3:8.2f} ms",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
