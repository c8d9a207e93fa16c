"""Physical invariants (SURVEY.md §4.4): momentum conservation under zero
gravity, energy boundedness in the damped dam break, no NaNs over long scans,
determinism (same seed -> bitwise-equal trajectory).
"""

import numpy as np
import pytest

from gpufluidsimulator_tpu import scenes, run
from gpufluidsimulator_tpu.models import solver


def test_momentum_conserved_zero_gravity():
    """The symmetric WCSPH force form exchanges momentum antisymmetrically —
    total momentum of a free blob (no walls, no gravity) must be conserved
    up to f32 rounding."""
    params, _ = scenes.dam_break(n=4000, dim=2)
    params = params.replace(gravity=(0.0, 0.0))
    # small centered blob so the expanding fluid never touches a wall
    state = scenes.spawn_box(params, [0.42, 0.42], [0.58, 0.58],
                             jitter=0.3, seed=3)
    st = run(state, params, 30, method="naive")
    assert np.asarray(st.pos).min() > 1e-3 and np.asarray(st.pos).max() < 1 - 1e-3, \
        "test invalid: blob reached the walls"
    mom1 = np.sum(np.asarray(st.vel), axis=0)
    v_scale = max(np.abs(np.asarray(st.vel)).max(), 1e-9)
    drift = np.abs(mom1).max() / (state.n * v_scale)
    assert drift < 1e-4


def test_energy_bounded_dam_break():
    params, state = scenes.dam_break(n=400, dim=2)
    st = run(state, params, 300, method="naive")
    ke = 0.5 * params.particle_mass * np.sum(np.asarray(st.vel) ** 2)
    h0 = 0.8  # initial column height: free-fall bound on kinetic energy
    pe0 = params.particle_mass * 9.81 * h0 * state.n
    assert np.isfinite(ke)
    assert ke < 2.0 * pe0


def test_no_nan_long_scan():
    params, state = scenes.dam_break(n=256, dim=2, jitter=0.2, seed=4)
    st = run(state, params, 400, method="naive")
    for leaf in st:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_determinism_bitwise():
    params, state = scenes.dam_break(n=256, dim=2, jitter=0.2, seed=5)
    a = run(state, params, 50, method="naive")
    b = run(state, params, 50, method="naive")
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_particles_stay_in_bounds():
    params, state = scenes.dam_break(n=256, dim=2, jitter=0.2, seed=6)
    st = run(state, params, 300, method="naive")
    pos = np.asarray(st.pos)
    lo = np.asarray(params.bounds_min)
    hi = np.asarray(params.bounds_max)
    assert np.all(pos >= lo - 1e-6) and np.all(pos <= hi + 1e-6)


def test_obstacles_exclude_particles():
    params, state = scenes.double_dam_break(n=2000, dim=2)
    st = run(state, params, 200, method="naive")
    pos = np.asarray(st.pos)
    for ob in params.obstacles:
        if ob[0] == "sphere":
            _, c, r = ob
            d = np.linalg.norm(pos - np.asarray(c), axis=-1)
            assert np.all(d >= r - 1e-4)
        else:
            _, c, half = ob
            q = np.abs(pos - np.asarray(c)) - np.asarray(half)
            assert np.all(np.max(q, axis=-1) >= -1e-4)
