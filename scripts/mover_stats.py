"""Measure the per-step cell-change ("mover") fraction in evolved flow.

Feasibility probe for incremental binning: if only a small fraction of
particles change cell per step (CFL displacement is ~0.035h/step), the two
full multi-operand sorts could be replaced by extract/sort/re-insert of the
movers only.  Usage: python scripts/mover_stats.py [N] [dim] [probe_steps]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import numpy as np
import jax

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import planes as pm


def cid_by_id(state, params, geom):
    cid = np.asarray(pm.cell_linear_parts(state.pos, params, geom))
    ids = np.asarray(state.ids)
    out = np.empty_like(cid)
    out[ids] = cid
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    probes = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    print(f"N={state.n} cells={geom.cells} k={geom.k}")

    total = 0
    for warm in (100, 400, 1000):
        state = solver.run(state, params, warm - total, method="pallas")
        total = warm
        fracs = []
        prev = cid_by_id(state, params, geom)
        for _ in range(probes):
            state = solver.run(state, params, 1, method="pallas")
            cur = cid_by_id(state, params, geom)
            fracs.append(float((cur != prev).mean()))
            prev = cur
        vmax = float(np.abs(np.asarray(state.vel)).max())
        cfl = vmax * params.dt / params.cell
        print(f"warm={warm}: mover frac mean={np.mean(fracs):.4f} "
              f"max={np.max(fracs):.4f}  vmax={vmax:.3f} cfl_disp={cfl:.4f}")


if __name__ == "__main__":
    main()
