"""A/B the stage-compact grouped-DMA form on a REAL evolved state.

Slope-times extract_movers (flag mask + compact_flagged kernel + stitch)
with the 6-channel plane stack passed as ONE group (one strided 3D DMA
per tile) vs as six separate channels (the round-2 form), on the actual
mover flags of an evolved 3D double dam break.

Usage:  python scripts/ab_group.py [N] [dim] [warm]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import inc, pallas_sph
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.utils.profiling import slope_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    m_cap = inc.mover_capacity(state.n)
    state = solver.run(state, params, warm, method="pallas")
    jax.block_until_ready(state.pos)
    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)

    # one real swept step to get genuine post-step planes + mover flags
    @jax.jit
    def sweep(s):
        planes6 = pm.halo_x(s.fields6)
        occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
        rho = pallas_sph.density_planes(planes6[:3], occ_q, occ_s,
                                        params, geom)
        return pallas_sph.accel_planes(planes6, pm.halo_x(rho), occ_q,
                                       occ_s, params, geom,
                                       fuse_integrate=True,
                                       emit_movers=True)

    new6, flagp = sweep(s0)
    flags = (flagp > 0.5) & inc.interior_mask(geom)[None]
    print(f"N={state.n} movers={int(jnp.sum(flags))}", flush=True)

    def run_grouped(carry):
        g6, idp, fl = carry
        movers, m = inc.compact_flagged([g6, idp], fl, m_cap)
        fb = movers[0, :8].sum() + m.astype(jnp.float32)
        return (g6 + 1e-30 * fb, idp, fl)

    def run_flat(carry):
        g6, idp, fl = carry
        chans = [g6[i] for i in range(6)] + [idp]
        movers, m = inc.compact_flagged(chans, fl, m_cap)
        fb = movers[0, :8].sum() + m.astype(jnp.float32)
        return (g6 + 1e-30 * fb, idp, fl)

    nt = int(np.prod(flags.shape)) // inc.TILE

    def run_counts(carry):
        g6, idp, fl = carry
        lane_cnt = jnp.sum(fl.reshape(nt, 64, 128), axis=1,
                           dtype=jnp.int32)
        counts = jnp.sum(lane_cnt, axis=1)
        order = jnp.argsort(~(counts > 0), stable=True)
        fb = (jnp.sum(counts) + order[0]).astype(jnp.float32)
        return (g6 + 1e-30 * fb, idp, fl)

    def run_small(carry):
        g6, idp, fl = carry
        movers, m = inc.compact_flagged([g6, idp], fl, inc.TILE)
        fb = movers[0, :8].sum() + m.astype(jnp.float32)
        return (g6 + 1e-30 * fb, idp, fl)

    carry = (new6, s0.idp, flags)
    for name, fn in [("counts-only", run_counts),
                     ("grouped max_out=8192", run_small),
                     ("flat 7x1-ch", run_flat),
                     ("grouped 6+1", run_grouped)]:
        ms = slope_time(fn, carry) * 1e3
        print(f"extract_movers [{name}]: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
