"""Config-1 acceptance: the jitted f32 naive path vs the float64 NumPy oracle
(SURVEY.md §4.3; BASELINE.json north_star: trajectories within 1e-3 relative
error over 1000 steps — run at reduced step count in CI, full in slow mode).
"""

import numpy as np
import pytest

from gpufluidsimulator_tpu import scenes, run, make_state
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.oracle import numpy_ref


def _rel_err(a, b):
    scale = np.maximum(np.abs(b).max(), 1e-9)
    return np.abs(a - b).max() / scale


@pytest.mark.parametrize("dim", [2, 3])
def test_single_step_matches_oracle(dim):
    params, state = scenes.dam_break(n=256 if dim == 2 else 512, dim=dim,
                                     jitter=0.2, seed=1)
    p0 = np.asarray(state.pos, np.float64)
    v0 = np.asarray(state.vel, np.float64)
    op, ov, orho, opres = numpy_ref.step(p0, v0, params)
    st = solver.step(state, params, method="naive")
    assert _rel_err(np.asarray(st.rho), orho) < 1e-5
    assert _rel_err(np.asarray(st.pos), op) < 1e-5
    assert _rel_err(np.asarray(st.vel), ov) < 1e-4


def test_trajectory_matches_oracle_200_steps():
    """Lattice (no-jitter) dam break: the orderly collapse regime where f32
    rounding noise is not chaos-amplified; 200 steps must track the float64
    oracle far inside the 1e-3 acceptance band."""
    params, state = scenes.dam_break(n=400, dim=2)
    p, v = np.asarray(state.pos, np.float64), np.asarray(state.vel, np.float64)
    p, v, _, _ = numpy_ref.run(p, v, params, 200)
    st = run(state, params, 200, method="naive")
    # displacement-scale relative error (positions are O(1))
    assert _rel_err(np.asarray(st.pos), p) < 1e-4


@pytest.mark.slow
def test_trajectory_matches_oracle_1000_steps():
    """Config-1 acceptance (BASELINE.json north_star): 1e-3 relative error
    over 1000 steps vs the CPU/NumPy float64 reference, full 4k scene."""
    params, state = scenes.dam_break(n=4096, dim=2)
    p, v = np.asarray(state.pos, np.float64), np.asarray(state.vel, np.float64)
    p, v, _, _ = numpy_ref.run(p, v, params, 1000)
    st = run(state, params, 1000, method="naive")
    assert _rel_err(np.asarray(st.pos), p) < 1e-3
