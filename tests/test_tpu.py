"""ON-CHIP test tier (`PYTEST_TPU=1 python -m pytest tests -m tpu -q`):
kernel-vs-host equivalence on the REAL TPU (VERDICT r3 #4 — the fast tier
is CPU-only, so compiled-kernel regressions were previously visible only
through ad-hoc scripts).  Small N; minutes total once compiles are cached.

Every test here skips unless the active backend is a real TPU (the default
tier's conftest forces CPU; set PYTEST_TPU=1 to keep the chip).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import inc, kernels, pallas_sph
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.ops import route

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs a real TPU (run with PYTEST_TPU=1)"),
]


def _evolved(n=2000, dim=2, steps=300):
    params, state = scenes.dam_break(n=n, dim=dim)
    st = solver.run(state, params, steps, method="pallas_inc")
    return params, st


def _planes_state(params, st, continuity=False):
    geom = pm.geometry(params)
    s = inc.to_planes(st.pos, st.vel, st.ids, params, geom,
                      continuity=continuity)
    return geom, s


def test_pallas_step_matches_gridded_on_chip():
    """Compiled Pallas sweep pipeline vs the gridded XLA tier on the real
    chip — one step from an evolved state, aligned by id."""
    params, st = _evolved()
    a = solver.step(st, params, method="pallas")
    b = solver.step(st, params, method="gridded")
    ai = np.argsort(np.asarray(a.ids))
    bi = np.argsort(np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(a.pos)[ai],
                               np.asarray(b.pos)[bi], rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.vel)[ai],
                               np.asarray(b.vel)[bi], rtol=0, atol=2e-2)


@pytest.mark.parametrize("density", [0.003, 0.08])
def test_compact_flagged_kernel_matches_host_on_chip(density):
    """The COMPILED compact kernel (tile classes, DMA ring, stitch) vs the
    host argsort path, at a sparse and a dense flag density."""
    params, st = _evolved()
    geom, s = _planes_state(params, st)
    rng = np.random.default_rng(3)
    valid = np.asarray((s.fields6[0] < pm.SENTINEL * 0.5)
                       & inc.interior_mask(geom)[None])
    flags = jnp.asarray(valid & (rng.random(valid.shape) < density))
    channels = [s.fields6[i] for i in range(6)] + [s.idp]
    cap = inc.mover_capacity(st.n)
    vk, mk = inc.compact_flagged(channels, flags, cap, use_kernel=True)
    vh, mh = inc.compact_flagged(channels, flags, cap, use_kernel=False)
    assert int(mk) == int(mh) == int(np.asarray(flags).sum())
    m = int(mk)
    np.testing.assert_array_equal(np.asarray(vk)[:, :m],
                                  np.asarray(vh)[:, :m])


@pytest.mark.parametrize("with_rho", [False, True])
def test_consolidate_kernel_matches_jnp_on_chip(with_rho):
    """Compiled consolidate (incl. the round-4 rho field) vs the jnp
    reference.  Dead arrival tiles hold garbage by contract (skip-empty
    place) — sanitize them for the host reference only."""
    params, st = _evolved()
    geom, s = _planes_state(params, st)
    rng = np.random.default_rng(5)
    valid = np.asarray((s.fields6[0] < pm.SENTINEL * 0.5)
                       & inc.interior_mask(geom)[None])
    flags = jnp.asarray(valid & (rng.random(valid.shape) < 0.05))
    flagp = flags.astype(jnp.float32)
    rhop = jnp.where(s.idp >= 0, 1000.0 + s.idp, 0.0) if with_rho else None
    channels = [s.fields6[i] for i in range(6)] + [s.idp]
    if with_rho:
        channels.append(rhop)
    movers, m = inc.compact_flagged(channels, flags,
                                    inc.mover_capacity(st.n))
    arr, live_t, _ = inc.arrival_planes(movers, m, params, geom)
    got = inc.consolidate(s.fields6, s.idp, flagp, arr, live_t, geom,
                          use_kernel=True, rhop=rhop)
    arr_s = np.asarray(arr).copy()
    dead = ~np.concatenate([np.asarray(live_t).astype(bool),
                            np.array([False])])
    arr_s[:3, dead] = pm.SENTINEL
    arr_s[3:, dead] = 0.0
    ref = inc.consolidate(s.fields6, s.idp, flagp, jnp.asarray(arr_s),
                          live_t, geom, use_kernel=False, rhop=rhop)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_occ_rowmax_kernel_matches_xla_on_chip():
    """The one-pass occupancy kernel vs the XLA compare+reduce form."""
    params, st = _evolved()
    geom, s = _planes_state(params, st)
    planes6 = pm.halo_x(s.fields6)
    got = pm.occ_rowmax(planes6[pm.FIELD_X], geom, use_kernel=True)
    ref = pm.occ_rowmax(planes6[pm.FIELD_X], geom, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_continuity_drho_matches_n2_on_chip():
    """The COMPILED fused RATE-form continuity accumulation +
    deferred-correction pressure path vs an O(N^2) f64 reference for the
    density rate (cont_form='rate', the round-4 formulation, kept)."""
    params, st = _evolved(n=1200, steps=200)
    params = params.replace(cont_form="rate")
    geom, s = _planes_state(params, st, continuity=True)
    p6 = pm.halo_x(s.fields6)
    occ_q, occ_s = pm.occupancy_bounds(p6, params, geom)
    rho_p = pallas_sph.density_planes(p6[:3], occ_q, occ_s, params, geom)
    rho_h = pm.halo_x(rho_p)
    new6, rho_new, flagp = pallas_sph.accel_planes(
        p6, rho_h, occ_q, occ_s, params, geom, fuse_integrate=True,
        emit_movers=True, continuity=True)
    valid = np.asarray((s.fields6[0] < pm.SENTINEL * 0.5)
                       & inc.interior_mask(geom)[None])
    ids_slot = np.asarray(s.idp)[valid].astype(int)
    drho_k = (np.asarray(rho_new) - np.asarray(rho_h))[valid] / params.dt

    pos = np.asarray(st.pos, np.float64)
    vel = np.asarray(st.vel, np.float64)
    dd = pos[:, None, :] - pos[None, :, :]
    r2 = (dd ** 2).sum(-1)
    w = np.maximum(params.h ** 2 - r2, 0.0) ** 2
    dv = vel[:, None, :] - vel[None, :, :]
    dot = (dv * dd).sum(-1)
    c = kernels.poly6_coef(params.h, params.dim) * params.particle_mass
    drho_ref = -6.0 * c * (w * dot).sum(axis=1)
    id2row = {int(pid): i for i, pid in enumerate(np.asarray(st.ids))}
    ref = np.array([drho_ref[id2row[i]] for i in ids_slot])
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(drho_k, ref, rtol=0, atol=5e-6 * scale)


def test_continuity_sum_rho_matches_density_sweep_on_chip():
    """The COMPILED sum-form (round-5 default) in-sweep summation density
    must match the standalone density sweep over the same planes — the
    same poly6 math through a different kernel and accumulation order."""
    params, st = _evolved(n=1200, steps=200)
    params = params.replace(cont_form="sum")
    geom, s = _planes_state(params, st, continuity=True)
    p6 = pm.halo_x(s.fields6)
    occ_q, occ_s = pm.occupancy_bounds(p6, params, geom)
    rho_p = pallas_sph.density_planes(p6[:3], occ_q, occ_s, params, geom)
    rho_h = pm.halo_x(rho_p)
    new6, rho_new, flagp = pallas_sph.accel_planes(
        p6, rho_h, occ_q, occ_s, params, geom, fuse_integrate=True,
        emit_movers=True, continuity=True)
    valid = np.asarray((s.fields6[0] < pm.SENTINEL * 0.5)
                       & inc.interior_mask(geom)[None])
    np.testing.assert_allclose(np.asarray(rho_new)[valid],
                               np.asarray(rho_p)[valid],
                               rtol=0, atol=2e-3 * params.rest_density)


def test_place_extract_roundtrip_on_chip():
    """Compiled butterfly place + inverse extract: per-particle values out
    of the planes must equal what was placed (the full routing path the
    pallas step uses)."""
    params, st = _evolved()
    geom = pm.geometry(params)
    table = pm.build_planes(st.pos, st.vel, st.ids, params, geom)
    vals = route.extract_per_particle(
        table.planes[:3], table.shifts, table.slot, table.starts, geom,
        use_kernel=True)
    ok = np.asarray(table.ok)
    np.testing.assert_array_equal(
        np.asarray(vals)[ok][:, :params.dim],
        np.asarray(table.pos_s)[ok])


def test_run_inc_cont_stable_on_chip():
    """The continuity tier's stabilized step survives 600 compiled steps of
    the coarse dam break (the configuration that exposed the lag
    instability) with zero overflow and finite state."""
    params, state = scenes.dam_break(n=2000, dim=2)
    st = solver.run(state, params, 600, method="pallas_inc_cont")
    assert int(st.overflow) == 0
    assert bool(jnp.all(jnp.isfinite(st.pos)))
