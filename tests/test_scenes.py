"""Scene construction tests: particle counts, densities near rest density,
spawn boxes, parameter derivation sanity."""

import numpy as np
import pytest

from gpufluidsimulator_tpu import scenes, SimParams
from gpufluidsimulator_tpu.ops import naive


@pytest.mark.parametrize("dim,n", [(2, 1000), (3, 4000)])
def test_dam_break_counts(dim, n):
    params, state = scenes.dam_break(n=n, dim=dim)
    # lattice fill gives approximately the requested count
    assert 0.6 * n <= state.n <= 1.5 * n
    assert state.pos.shape == (state.n, dim)
    assert params.dim == dim


def test_initial_density_near_rest():
    params, state = scenes.dam_break(n=2000, dim=2)
    rho = np.asarray(naive.density_naive(state.pos, params))
    interior = rho > 0.8 * params.rest_density  # exclude free-surface deficit
    med = np.median(rho[interior])
    assert 0.85 * params.rest_density < med < 1.3 * params.rest_density


def test_spawn_box_and_concat():
    params, state = scenes.dam_break(n=500, dim=2)
    extra = scenes.spawn_box(params, [0.6, 0.6], [0.9, 0.9],
                             velocity=[0.0, -1.0])
    both = scenes.add_states(state, extra)
    assert both.n == state.n + extra.n
    assert np.allclose(np.asarray(extra.vel)[:, 1], -1.0)


def test_double_dam_break_has_obstacles():
    params, state = scenes.double_dam_break(n=1000, dim=2)
    assert len(params.obstacles) == 2
    kinds = {o[0] for o in params.obstacles}
    assert kinds == {"box", "sphere"}


def test_params_validation():
    with pytest.raises(ValueError):
        SimParams(dim=4)
    with pytest.raises(ValueError):
        SimParams(dim=2, gravity=(0.0, -9.81, 0.0))
    p = SimParams(dim=2, gravity=(0.0, -9.81), bounds_min=(0.0, 0.0),
                  bounds_max=(1.0, 0.5), h=0.05)
    assert p.grid_res == (20, 10)
    assert p.num_cells == 200
    # cont_delta rides the viscosity window channel: inviscid configs must
    # refuse it rather than silently skip the stabilizer (ADVICE round 4)
    with pytest.raises(ValueError, match="cont_delta"):
        SimParams(dim=2, gravity=(0.0, -9.81), bounds_min=(0.0, 0.0),
                  bounds_max=(1.0, 1.0), viscosity=0.0, cont_delta=0.1)
