"""Packed-pair (MXU-prototype) force sweep vs naive O(N^2) (SURVEY.md §4.3).

Covers ops/mxu_sweep.py — the VERDICT-r4 #1 neighbor-representation
prototype: exact parity of both reduction variants ("vpu" deferred
elementwise, "mxu" dot_general) against ops/naive.accel_naive, including
range-mask exactness (no double-counted pairs across band-boundary
tiles), the dense-packed sentinel tail, spb/skip_dead invariance, and the
descriptor arithmetic the kernel's index maps rely on.
"""

import numpy as np
import pytest

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import mxu_sweep, naive, physics


def _settled(n, steps=5, seed=3, jitter=0.3):
    params, state = scenes.dam_break(n=n, dim=3, jitter=jitter, seed=seed)
    state = solver.run(state, params, steps, method="naive")
    rho = naive.density_naive(state.pos, params)
    pres = physics.eos_pressure(rho, params)
    return params, state, rho, pres


def _rel(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max() / max(
        np.abs(np.asarray(b)).max(), 1e-9)


@pytest.mark.parametrize("variant", ["vpu", "mxu"])
def test_accel_matches_naive(variant):
    params, state, rho, pres = _settled(n=1100)
    ref = naive.accel_naive(state.pos, state.vel, rho, pres, params)
    ref = ref - np.asarray(params.gravity)      # sweep excludes gravity
    got = mxu_sweep.accel_mxu(state.pos, state.vel, rho, pres, params,
                              variant=variant)
    assert _rel(got, ref) < 2e-5


def test_spb_skipdead_invariance_and_tail():
    """spb=2 vs spb=4, skip_dead on/off: identical physics; n not a
    multiple of 128 exercises the sentinel tail tile."""
    params, state, rho, pres = _settled(n=777, steps=3)
    a2 = mxu_sweep.accel_mxu(state.pos, state.vel, rho, pres, params, spb=2)
    a4 = mxu_sweep.accel_mxu(state.pos, state.vel, rho, pres, params, spb=4)
    an = mxu_sweep.accel_mxu(state.pos, state.vel, rho, pres, params,
                             spb=4, skip_dead=False)
    assert _rel(a2, a4) < 1e-7
    assert _rel(an, a4) < 1e-7
    ref = naive.accel_naive(state.pos, state.vel, rho, pres, params)
    ref = ref - np.asarray(params.gravity)
    assert _rel(a4, ref) < 2e-5


def test_no_double_counted_pairs():
    """Each slot sees tile ∩ [lo,hi); across all slots of a qtile these
    intersections must partition the coverage (a candidate index seen
    twice would double-count its pair forces), and every covered index's
    cell must be inside the query tile's dilated stencil bands."""
    params, state, rho, pres = _settled(n=900, steps=2)
    f, ft, cids, order = mxu_sweep.pack(state.pos, state.vel, rho, pres,
                                        params)
    cids_np = np.asarray(cids)
    desc, mx = mxu_sweep.build_desc(cids_np, f.shape[0], params)
    qt, tiles, lo, hi = mxu_sweep.slot_table(desc)
    assert (lo >= 0).all() and (hi <= len(cids_np)).all()
    tc = mxu_sweep.TC
    for t in range(f.shape[0] // mxu_sweep.TQ):
        seen = set()
        for i in np.nonzero(qt == t)[0]:
            l = max(int(lo[i]), int(tiles[i]) * tc)
            h = min(int(hi[i]), (int(tiles[i]) + 1) * tc)
            for j in range(l, h):
                assert j not in seen, f"qtile {t}: candidate {j} twice"
                seen.add(j)
        # completeness: every true stencil candidate of every query in
        # this tile is covered (the superset property parity relies on)
        i0, i1 = t * mxu_sweep.TQ, min((t + 1) * mxu_sweep.TQ,
                                       len(cids_np))
        from gpufluidsimulator_tpu.ops import grid as g
        st = g.strides(params)
        for i in range(i0, i1):
            for off in g.neighbor_offsets(params):
                c = cids_np[i] + off
                jlo = np.searchsorted(cids_np, c, "left")
                jhi = np.searchsorted(cids_np, c, "right")
                for j in range(jlo, jhi):
                    assert j in seen, (
                        f"qtile {t}: stencil candidate {j} missed")


def test_slot_scalars_match_slot_table():
    """The kernel/index-map arithmetic (_slot_scalars) must agree with the
    expanded numpy slot table for every live slot, and clamp dead slots
    onto the last live one."""
    import jax.numpy as jnp
    params, state, rho, pres = _settled(n=600, steps=2)
    f, ft, cids, order = mxu_sweep.pack(state.pos, state.vel, rho, pres,
                                        params)
    desc, mx = mxu_sweep.build_desc(np.asarray(cids), f.shape[0], params)
    qt, tiles, lo, hi = mxu_sweep.slot_table(desc)
    d = jnp.asarray(desc).reshape(-1)
    # live slots agree
    si = {}
    for i in range(len(qt)):
        si.setdefault(int(qt[i]), []).append(i)
    for t, idxs in si.items():
        for s, i in enumerate(idxs):
            tl, l, h, ns = mxu_sweep._slot_scalars(d, t, s)
            assert (int(tl), int(l), int(h)) == (
                int(tiles[i]), int(lo[i]), int(hi[i]))
            assert int(ns) == len(idxs) == int(desc[t, 6])
        # dead slot clamps to last live
        tl, l, h, ns = mxu_sweep._slot_scalars(d, t, len(idxs) + 3)
        assert int(tl) == int(tiles[idxs[-1]])
