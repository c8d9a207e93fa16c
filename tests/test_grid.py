"""Unit tests for the uniform grid / fixed-capacity cell table
(SURVEY.md §4.2): hash correctness, one-cell-per-particle, overflow counter,
and neighbor-offset completeness.
"""

import numpy as np
import jax.numpy as jnp

from gpufluidsimulator_tpu import SimParams, scenes
from gpufluidsimulator_tpu.ops import grid


def _params2d(h=0.1, k=8):
    return SimParams(dim=2, h=h, gravity=(0.0, -9.81),
                     bounds_min=(0.0, 0.0), bounds_max=(1.0, 1.0),
                     cell_capacity=k)


def test_cell_id_interior_and_clipped():
    p = _params2d(h=0.25)            # grid_res = (4, 4), padded (6, 6)
    pos = jnp.asarray([
        [0.0, 0.0],     # cell (0,0) -> padded (1,1)
        [0.99, 0.99],   # cell (3,3) -> padded (4,4)
        [0.26, 0.74],   # cell (1,2) -> padded (2,3)
        [-5.0, 5.0],    # out of bounds -> clipped to (0,3) -> padded (1,4)
    ])
    cid = np.asarray(grid.cell_id(pos, p))
    px = p.grid_res[0] + 2
    assert cid[0] == 1 * 1 + 1 * px
    assert cid[1] == 4 * 1 + 4 * px
    assert cid[2] == 2 * 1 + 3 * px
    assert cid[3] == 1 * 1 + 4 * px


def test_every_particle_exactly_one_slot():
    p = _params2d(h=0.1, k=16)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 1, (500, 2)), jnp.float32)
    vel = jnp.zeros_like(pos)
    t = grid.build_cell_table(pos, vel, p)
    assert int(t.overflow) == 0
    assert int(jnp.sum(t.valid)) == 500
    slots = np.asarray(t.slot)
    assert np.all(slots >= 0)
    assert len(np.unique(slots)) == 500           # bijective
    # slot round-trip: dense position at my slot == my position
    flat = np.asarray(t.pos).reshape(-1, 2)
    np.testing.assert_allclose(flat[slots], np.asarray(pos), rtol=1e-6)


def test_overflow_counted_and_deterministic():
    p = _params2d(h=0.25, k=4)
    # 10 particles all in one cell, capacity 4 -> 6 dropped
    pos = jnp.full((10, 2), 0.1, jnp.float32)
    vel = jnp.zeros_like(pos)
    t = grid.build_cell_table(pos, vel, p)
    assert int(t.overflow) == 6
    assert int(jnp.sum(t.valid)) == 4
    assert int(jnp.sum(t.slot >= 0)) == 4
    t2 = grid.build_cell_table(pos, vel, p)
    assert np.array_equal(np.asarray(t.slot), np.asarray(t2.slot))


def test_neighbor_offsets_cover_stencil():
    p = _params2d(h=0.1)
    offs = grid.neighbor_offsets(p)
    assert len(offs) == 9
    px = p.grid_res[0] + 2
    expected = sorted(dx + dy * px for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    assert list(offs) == expected

    p3 = SimParams(dim=3, h=0.25, cell_capacity=8)
    offs3 = grid.neighbor_offsets(p3)
    assert len(offs3) == 27
    assert 0 in offs3


def test_empty_slots_hold_sentinel():
    p = _params2d(h=0.25, k=4)
    pos = jnp.asarray([[0.5, 0.5]], jnp.float32)
    t = grid.build_cell_table(pos, jnp.zeros_like(pos), p)
    flat = np.asarray(t.pos).reshape(-1, 2)
    valid = np.asarray(t.valid).reshape(-1)
    assert np.all(flat[~valid] == grid.SENTINEL)
    assert np.all(flat[valid] == 0.5)


def test_shipped_scene_no_overflow():
    """Default cell_capacity must hold the dam-break scene with headroom
    (SURVEY.md §4.2: overflow must be 0 in test scenes)."""
    params, state = scenes.dam_break(n=2000, dim=2)
    t = grid.build_cell_table(state.pos, state.vel, params)
    assert int(t.overflow) == 0
    occ = np.asarray(jnp.sum(t.valid, axis=1))
    assert occ.max() <= params.cell_capacity // 2   # 2x headroom at rest
