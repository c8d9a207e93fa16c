"""Per-tile mover-count distribution probe for the two-level stage compact.

The stage-compact kernel (ops/inc.compact_flagged) runs a flat butterfly
over each live 8192-slot routing tile (64 rows x 128 lanes).  A two-level
scheme (per-lane sublane compaction to the top B rows, then a flat
compaction over the (B, 128) space) cuts the butterfly work ~2-3x, but
needs a per-tile bound on the per-lane flagged count: fluid fronts aligned
with the grid can flag whole rows/columns at once.  This probe measures,
in evolved double-dam-break flow, the distribution of

  * per-tile flagged totals (how many tiles are live at all),
  * per-lane maxima within each tile (the B for the vertical scheme),
  * per-row maxima within each tile (the B for a horizontal scheme),

to size B and estimate the fallback rate.  Usage:
  python scripts/mover_rows.py [N] [dim] [warm_steps]
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
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.ops import inc
from gpufluidsimulator_tpu.ops import route
from gpufluidsimulator_tpu.ops.pallas_sph import density_planes, accel_planes


def flags_one_step(state_inc, params, geom):
    planes6 = pm.halo_x(state_inc.fields6)
    occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
    rho_p = density_planes(planes6[:3], occ_q, occ_s, params, geom)
    rho_h = pm.halo_x(rho_p)
    new6, flagp = accel_planes(planes6, rho_h, occ_q, occ_s, params, geom,
                               fuse_integrate=True, emit_movers=True)
    flags = (flagp > 0.5) & inc.interior_mask(geom)[None]
    return new6, flags


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 400

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    state = solver.run(state, params, warm, method="pallas")
    jax.block_until_ready(state.pos)

    s = inc.to_planes(state.pos, state.vel, state.ids, params, geom)
    flags = jax.jit(
        lambda si: flags_one_step(si, params, geom)[1])(s)
    f = np.asarray(flags).reshape(-1, route.OUT_ROWS, pm.LANES)
    tot = f.sum(axis=(1, 2))
    live = tot > 0
    lane_max = f.sum(axis=1).max(axis=1)      # per-tile max per-lane count
    row_max = f.sum(axis=2).max(axis=1)       # per-tile max per-row count
    nt = f.shape[0]
    print(f"N={state.n} warm={warm} tiles={nt} live={live.sum()} "
          f"movers={int(tot.sum())} ({tot.sum()/state.n*100:.2f}%)")
    print(f"per-tile totals: mean={tot[live].mean():.1f} "
          f"p99={np.percentile(tot[live], 99):.0f} max={tot.max()}")
    for name, v in (("lane_max", lane_max), ("row_max", row_max)):
        v = v[live]
        print(f"{name}: mean={v.mean():.2f} p90={np.percentile(v, 90):.0f} "
              f"p99={np.percentile(v, 99):.0f} max={v.max()}  "
              f"fallback-rate B=8:{(v > 8).mean()*100:.2f}% "
              f"B=16:{(v > 16).mean()*100:.2f}% "
          f"B=32:{(v > 32).mean()*100:.2f}%")


if __name__ == "__main__":
    main()
