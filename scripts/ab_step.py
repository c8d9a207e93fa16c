"""Tight full-step timing @N for A/B of route flags / methods.

Usage: [FS_ROUTE_*=0/1] python scripts/ab_step.py [N] [dim] [warm] [method]
method: pallas (default) | pallas_inc (slope-times the planes-resident step)
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import jax

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.utils.profiling import slope_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    method = sys.argv[4] if len(sys.argv) > 4 else "pallas"

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    # FS_CELL=0 -> disable the scene's snapped cell; FS_CELL=<f> -> stretch
    # the binning cell to f*h (A/B of planes.snap_cell choices)
    if "FS_CELL" in os.environ:
        f = float(os.environ["FS_CELL"])
        params = params.replace(cell_size=f * params.h if f > 0 else 0.0)
    print(f"grid_res={params.grid_res} cell/h={params.cell/params.h:.4f}",
          flush=True)
    state = solver.run(state, params, warm, method="pallas")
    jax.block_until_ready(state.pos)
    if method == "pallas_inc":
        from gpufluidsimulator_tpu.ops import inc
        from gpufluidsimulator_tpu.ops import planes as pm
        geom = pm.geometry(params)
        m_cap = inc.mover_capacity(state.n)
        s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)
        t = slope_time(lambda s: inc.step_planes(s, params, geom, m_cap),
                       s0, k1=3, k2=23, reps=3)
    else:
        fn = solver._METHODS[method]
        t = slope_time(lambda s: fn(s, params), state, k1=3, k2=23, reps=3)
    print(f"N={state.n}  method={method}  step={t*1e3:.2f} ms  "
          f"({state.n/t:.3e} particle-steps/s)", flush=True)


if __name__ == "__main__":
    main()
