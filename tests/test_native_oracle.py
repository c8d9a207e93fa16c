"""Native C++ oracle (csrc/fluidcore) vs NumPy oracle and vs the device path.

The native engine must reproduce numpy_ref to near-f64 precision (same
physics, different op order) and track the jitted f32 paths like the NumPy
oracle does — giving a fast oracle at 65k+ scales (SURVEY.md §2 CPU path).
"""

import numpy as np
import pytest

from gpufluidsimulator_tpu import scenes, run
from gpufluidsimulator_tpu.oracle import native, numpy_ref

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native fluidcore not built")


def _max_rel(a, b):
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)


@pytest.mark.parametrize("dim,n", [(2, 500), (3, 900)])
def test_native_matches_numpy_oracle(dim, n):
    params, state = scenes.dam_break(n=n, dim=dim, jitter=0.3, seed=13)
    p0 = np.asarray(state.pos, np.float64)
    v0 = np.asarray(state.vel, np.float64)
    for use_grid in (False, True):
        pn, vn, rn, _ = native.run(p0, v0, params, 20, use_grid=use_grid)
        pr, vr = p0.copy(), v0.copy()
        pr, vr, rr, _ = numpy_ref.run(pr, vr, params, 20)
        assert _max_rel(pn, pr) < 1e-12, f"grid={use_grid}"
        assert _max_rel(rn, rr) < 1e-12


def test_native_grid_equals_native_naive():
    params, state = scenes.dam_break(n=800, dim=2, jitter=0.2, seed=3)
    p0 = np.asarray(state.pos, np.float64)
    v0 = np.asarray(state.vel, np.float64)
    pa, va, _, _ = native.run(p0, v0, params, 50, use_grid=False)
    pb, vb, _, _ = native.run(p0, v0, params, 50, use_grid=True)
    # identical neighbor sets; only accumulation order differs
    assert _max_rel(pa, pb) < 1e-9


def test_native_obstacles():
    params, state = scenes.double_dam_break(n=900, dim=2)
    p0 = np.asarray(state.pos, np.float64)
    v0 = np.asarray(state.vel, np.float64)
    pn, vn, _, _ = native.run(p0, v0, params, 40)
    pr, vr, _, _ = numpy_ref.run(p0.copy(), v0.copy(), params, 40)
    assert _max_rel(pn, pr) < 1e-10


def test_native_tracks_pallas_at_scale():
    """The native oracle exists to validate the device path at sizes NumPy
    can't reach; check agreement at 10k particles over 50 steps."""
    params, state = scenes.dam_break(n=10000, dim=2)
    pn, vn, _, _ = native.run(np.asarray(state.pos, np.float64),
                              np.asarray(state.vel, np.float64),
                              params, 50)
    st = run(state, params, 50, method="pallas")
    order = np.argsort(np.asarray(st.ids))
    assert np.abs(np.asarray(st.pos)[order] - pn).max() < 1e-4
