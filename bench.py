"""Benchmark harness — run on the real TPU chip; prints ONE JSON line.

Headline metric (BASELINE.json): particle-steps/sec/chip at 1M SPH particles,
3D double dam break with obstacle boundaries, fused Pallas step under scan
(config 4).  vs_baseline is relative to the 1e9 target in BASELINE.json
north_star (see BASELINE.md §roofline for why that target exceeds the v5e
VPU roofline for this algorithm).

Timing uses the slope method (utils/profiling.py): the axon tunnel adds
~30ms per host sync and block_until_ready does not fence reliably, so we
difference two scan lengths with forced scalar pulls.
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_TARGET = 1.0e9  # particle-steps/sec/chip @1M (BASELINE.json)


def main() -> None:
    from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
    _enable_cache()
    import jax
    from gpufluidsimulator_tpu import scenes
    from gpufluidsimulator_tpu.models import solver
    from gpufluidsimulator_tpu.ops import inc
    from gpufluidsimulator_tpu.ops import planes as pm
    from gpufluidsimulator_tpu.utils.profiling import slope_time

    from gpufluidsimulator_tpu.models.solver import run

    params, state = scenes.double_dam_break(n=1_000_000, dim=3)
    params = params.replace(diagnostics=False)
    # measure the evolved flow, not the degenerate rest lattice: warm up a
    # few hundred steps so cell occupancies reflect production conditions
    state = run(state, params, 100, method="pallas")
    jax.block_until_ready(state.pos)
    # production stepping is the incremental (planes-resident) pipeline:
    # the plane stack is the carried state, movers-only rebinning
    # (verified: overflow == 0 over 500 steps at this config, and
    # end states match the full-rebuild path — tests/test_inc.py)
    geom = pm.geometry(params)
    m_cap = inc.mover_capacity(state.n)
    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)
    t = slope_time(lambda s: inc.step_planes(s, params, geom, m_cap),
                   s0, k1=2, k2=10, reps=3)
    value = state.n / t

    print(json.dumps({
        "metric":
            "particle-steps/sec/chip @1M 3D double-dam-break (pallas_inc)",
        "value": value,
        "unit": "particle-steps/s",
        "vs_baseline": value / BASELINE_TARGET,
    }))


if __name__ == "__main__":
    main()
