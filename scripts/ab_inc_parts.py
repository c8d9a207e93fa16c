"""Fully-live split timing of the incremental step: rebin half vs sweep half.

Unlike profile_inc.py's prefix method (whose feedback scalar lets XLA DCE
most of a dense phase), each variant here returns a complete IncState whose
planes depend on every phase output — nothing is dead.

Usage:  python scripts/ab_inc_parts.py [N] [dim] [warm]
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

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    m_cap = inc.mover_capacity(state.n)
    print(f"N={state.n} dim={dim} m_cap={m_cap}", flush=True)
    state = solver.run(state, params, warm, method="pallas")
    jax.block_until_ready(state.pos)
    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)

    def rebin_only(s):
        _, _, flags = inc.detect_movers(s.fields6, s.idp, params, geom)
        flagp = flags.astype(jnp.float32)
        channels = [s.fields6[i] for i in range(6)] + [s.idp]
        movers, m = inc.compact_flagged(channels, flags, m_cap)
        arr, live_t, lost = inc.arrival_planes(movers, m, params, geom)
        f6, idp, lr = inc.consolidate(s.fields6, s.idp, flagp, arr,
                                      live_t, geom)
        return inc.IncState(fields6=f6, idp=idp,
                            overflow=s.overflow + lost + lr,
                            mig_overflow=s.mig_overflow)

    def sweeps_only(s):
        planes6 = pm.halo_x(s.fields6)
        occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
        rho_p = pallas_sph.density_planes(planes6[:3], occ_q, occ_s,
                                          params, geom)
        rho_h = pm.halo_x(rho_p)
        new6 = pallas_sph.accel_planes(planes6, rho_h, occ_q, occ_s,
                                       params, geom, fuse_integrate=True)
        return inc.IncState(fields6=new6, idp=s.idp, overflow=s.overflow,
                            mig_overflow=s.mig_overflow)

    def full(s):
        return inc.step_planes(s, params, geom, m_cap)

    for name, fn in [("rebin-only", rebin_only),
                     ("sweeps-only", sweeps_only),
                     ("full", full)]:
        t = slope_time(fn, s0, k1=2, k2=10, reps=3)
        print(f"{name:12s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
