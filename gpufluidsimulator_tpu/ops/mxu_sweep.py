"""MXU-first packed dense-pair force sweep — the VERDICT-r4 #1 prototype.

Reference counterpart: ``computeForcesKernel`` (SURVEY.md §2 "Force pass" —
the capability, not the representation).  This is the "fundamentally
different neighbor representation designed around the MXU from scratch"
that BASELINE.md's frozen-layout decision named as the one remaining
multiple-sized lever (front (c)): it abandons the rank-planar cell-aligned
layout entirely and is built so the FLOP-heavy j-reductions can ride the
MXU as matmul contractions instead of VPU accumulation.

Representation
--------------
  * Particles are packed DENSE in padded-cell-id order (x-fastest
    linearisation, ops/grid.py): no fixed-capacity K padding, no empty
    cell slots — the two structural paddings of the rank-planar layout
    (17.6x block-bounded tile work vs the true pair ideal) do not exist
    here.
  * Queries are tiles of TQ=128 consecutive packed particles.  For each
    query tile and each dz in {-1,0,1}, the stencil candidates of ALL its
    cells lie in ONE contiguous packed-index range
        [cid_lo + dz*sz - sy - 1,  cid_hi + dz*sz + sy + 1]
    (sy/sz = y/z linearisation strides): a 3^d stencil collapses to 3
    interval intersections with the sorted cid array (searchsorted).
    The price is slop — each band over-covers by ~2 cell-rows — which is
    exactly the trade this prototype exists to measure.
  * Each range is chopped into TC=128-particle tiles ("slots"); a slot's
    pairs are evaluated as a dense (TC, TQ) pair tile, masked to the
    slot's range [lo, hi) so no pair is double-counted (ranges are
    clipped disjoint at build time; partition tested).
  * The per-qtile tables are 6 ints (3 ranges) — a (Q, 8) int32 SMEM
    descriptor.  Slot -> candidate-tile mapping is derived ARITHMETICALLY
    in the scalar-prefetch index maps (tile = lo>>7 + slot offset), so
    SMEM stays ~300 KB @1.2M (a flat per-slot table measured 2.1 MB and
    OOMs SMEM — that variant is dead).

Kernel (grid = (Q, PMAX) with SPB slots per program, dead slots skipped
via pl.when on the prefetched slot count — the same occupancy-bound trick
as the rank-planar sweeps):
  * geometry (dx,dy,dz,r2) is direct f32 differences on the VPU — the MXU
    cannot carry f32 coordinates without 3-6x multi-pass cost (measured
    family: BASELINE.md "MXU dense-query" row), so only the reduction is
    matmul-shaped;
  * per-pair WCSPH coefficients (spiky-gradient pressure, viscosity
    Laplacian — ops/kernels.py, identical math to ops/naive.py) on the
    VPU;
  * the j-reduction  F_i = sum_j coef_ij * field_j  is, per variant:
      - "mxu":  lax.dot_general(coef (TC,TQ), fields (TC,8)) contracting
        j over the MXU — the MXU-first design point;
      - "vpu":  8 elementwise products accumulated into (TC,TQ) scratch,
        reduced over sublanes ONCE per query tile (deferred reduction) —
        the control that isolates what the MXU actually buys.
  * catastrophic cancellation in  x_i*sum(coef) - sum(coef*x_j)  is
    killed by centering coordinates/velocities per query tile.

The host descriptor builder (sorted-cid searchsorted + interval
arithmetic) is numpy for the prototype; every operation it performs is an
XLA primitive already used by the production binning path, so its cost is
amortizable the same way.

Measured verdict: scripts/proto_mxu.py, recorded in BASELINE.md ("THE MXU
PROTOTYPE" chapter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import SimParams
from . import grid, kernels

TQ = 128          # queries per tile (out/accumulator minor dim)
TC = 128          # candidates per slot (pair-tile sublane dim)
SENTINEL = 1.0e6  # pad-particle position (outside every kernel support)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- packing

def pack(pos, vel, rho, pres, params: SimParams):
    """Sort by padded cell id and pack the 8 per-particle fields dense.

    Returns (F (Npad, 8), FT (8, Npad), cids_sorted (N,), order (N,)):
    channels [x, y, z, vx, vy, vz, p/rho^2, 1/rho] — the same derived
    fields the rank-planar layout stages (ops/planes.py).
    """
    n = pos.shape[0]
    cids = grid.cell_id(pos, params)
    order = jnp.argsort(cids)
    a = pres / (rho * rho)
    ir = 1.0 / rho
    f = jnp.concatenate([pos, vel, a[:, None], ir[:, None]], axis=1)
    f = f[order]
    npad = -(-n // TQ) * TQ
    padrow = jnp.array([SENTINEL] * 3 + [0.0] * 5, f.dtype)
    f = jnp.concatenate([f, jnp.broadcast_to(padrow, (npad - n, 8))], axis=0)
    return f, f.T, cids[order], order


def build_desc(cids: np.ndarray, npad: int, params: SimParams):
    """Per-query-tile candidate descriptor: 3 clipped-disjoint packed-index
    ranges [lo, hi) (one per dz band) + total slot count.

    Returns (desc (Q, 8) int32, max_slots): desc[t] =
    [lo0, hi0, lo1, hi1, lo2, hi2, nslots, 0].
    """
    assert params.dim == 3, "prototype measures the 3D configs"
    st = grid.strides(params)
    sy, sz = st[1], st[2]
    n = len(cids)
    q = npad // TQ
    i0 = np.arange(q, dtype=np.int64) * TQ
    clo = cids[i0].astype(np.int64)
    chi = cids[np.minimum(i0 + TQ, n) - 1].astype(np.int64)
    desc = np.zeros((q, 8), np.int32)
    prev_hi = np.zeros(q, np.int64)
    nslots = np.zeros(q, np.int64)
    for r, dz in enumerate((-1, 0, 1)):
        lo = np.searchsorted(cids, clo + dz * sz - sy - 1, "left")
        hi = np.searchsorted(cids, chi + dz * sz + sy + 1, "right")
        lo = np.maximum(lo, prev_hi)
        empty = hi <= lo
        desc[:, 2 * r] = np.where(empty, 0, lo)
        desc[:, 2 * r + 1] = np.where(empty, 0, hi)
        prev_hi = np.where(empty, prev_hi, hi)
        nslots += np.where(empty, 0, (hi - 1) // TC - lo // TC + 1)
    desc[:, 6] = nslots
    return desc, int(max(nslots.max(), 1))


# ------------------------------------------------- slot -> range scalars

def _slot_scalars(d_ref, t, s):
    """Scalar (index-map/kernel shared) mapping of slot s of qtile t to
    (tile, lo, hi, nslots).  Dead slots (s >= nslots) are clamped onto the
    last live slot so index maps stay valid (and consecutive dead fetches
    get copy-elided); the kernel masks them via s >= nslots.

    d_ref is the FLAT (Q*8,) descriptor: SMEM prefetch operands are
    lane-padded to 128 in their minor dim, so a (Q, 8) shape inflates
    16x and blows the 1 MB SMEM budget @1.2M (measured: 5.9 MB requested;
    flat = 368 KB)."""
    lo0, hi0 = d_ref[t * 8 + 0], d_ref[t * 8 + 1]
    lo1, hi1 = d_ref[t * 8 + 2], d_ref[t * 8 + 3]
    lo2, hi2 = d_ref[t * 8 + 4], d_ref[t * 8 + 5]
    ns = d_ref[t * 8 + 6]

    def count(lo, hi):
        return jnp.where(hi > lo, (hi - 1) // TC - lo // TC + 1, 0)

    c0, c1 = count(lo0, hi0), count(lo1, hi1)
    se = jnp.minimum(s, ns - 1)
    in0 = se < c0
    s1 = se - c0
    in1 = s1 < c1
    s2 = s1 - c1
    tile = jnp.where(in0, lo0 // TC + se,
                     jnp.where(in1, lo1 // TC + s1, lo2 // TC + s2))
    lo = jnp.where(in0, lo0, jnp.where(in1, lo1, lo2))
    hi = jnp.where(in0, hi0, jnp.where(in1, hi1, hi2))
    return tile, lo, hi, ns


# ----------------------------------------------------------------- kernel

def _sweep_kernel(desc_ref, qT_ref, *args, params: SimParams, spb: int,
                  pmax: int, variant: str, precision, skip_dead: bool):
    cand_refs = args[:spb]
    out_ref = args[spb]
    acc_ref = args[spb + 1]
    t = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = params.h
    k1 = -params.particle_mass * kernels.spiky_grad_coef(h, 3)
    k2 = params.viscosity * params.particle_mass * kernels.visc_lap_coef(h, 3)

    # per-query-tile centers (cancellation guard for the reduction split)
    ctr = [qT_ref[c, 0] for c in range(6)]
    qrow = [qT_ref[c:c + 1, :] - ctr[c] for c in range(6)]   # (1, TQ)
    qa = qT_ref[6:7, :]
    qir = qT_ref[7:8, :]

    jiota = jax.lax.broadcasted_iota(jnp.int32, (TC, 1), 0)

    for k in range(spb):
        s = p * spb + k
        tile, lo, hi, ns = _slot_scalars(desc_ref, t, s)

        def slot_body(tile=tile, lo=lo, hi=hi, ns=ns, s=s, k=k):
            jid = jiota + tile * TC
            rng = (jid >= lo) & (jid < hi) & (s < ns)         # (TC, 1)
            c = cand_refs[k][...]                             # (TC, 8)
            cc = [c[:, ch:ch + 1] - ctr[ch] for ch in range(6)]
            dx = cc[0] - qrow[0]                              # (TC, TQ)
            dy = cc[1] - qrow[1]
            dz = cc[2] - qrow[2]
            r2 = dx * dx + dy * dy + dz * dz
            rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
            d = jnp.maximum(h - r2 * rinv, 0.0)     # 0 outside support
            live = rng & (r2 > 1e-16)               # + self/overlap mask
            coefp = jnp.where(live,
                              k1 * (c[:, 6:7] + qa) * (d * d) * rinv, 0.0)
            coefv = jnp.where(live, k2 * (c[:, 7:8] * qir) * d, 0.0)
            if variant == "mxu":
                ones = jnp.ones((TC, 1), jnp.float32)
                bp = jnp.concatenate([cc[0], cc[1], cc[2], ones], axis=1)
                bv = jnp.concatenate([cc[3], cc[4], cc[5], ones], axis=1)
                dn = (((0,), (0,)), ((), ()))   # contract j (dim0 x dim0)
                sp = jax.lax.dot_general(
                    coefp, bp, dn, preferred_element_type=jnp.float32,
                    precision=precision)         # (TQ, 4)
                sv = jax.lax.dot_general(
                    coefv, bv, dn, preferred_element_type=jnp.float32,
                    precision=precision)
                acc_ref[0, :, :] += jnp.concatenate([sp, sv], axis=1)
            else:
                acc_ref[0, :, :] += coefp * cc[0]
                acc_ref[1, :, :] += coefp * cc[1]
                acc_ref[2, :, :] += coefp * cc[2]
                acc_ref[3, :, :] += coefp
                acc_ref[4, :, :] += coefv * cc[3]
                acc_ref[5, :, :] += coefv * cc[4]
                acc_ref[6, :, :] += coefv * cc[5]
                acc_ref[7, :, :] += coefv

        if skip_dead:
            pl.when(s < ns)(slot_body)
        else:
            slot_body()

    @pl.when(p == pmax - 1)
    def _():
        if variant == "mxu":
            sm = acc_ref[0].T                     # (8, TQ)
        else:
            sm = jnp.sum(acc_ref[...], axis=1)    # (8, TQ) over TC sublanes
        ax = (qrow[0] * sm[3:4, :] - sm[0:1, :]
              + sm[4:5, :] - qrow[3] * sm[7:8, :])
        ay = (qrow[1] * sm[3:4, :] - sm[1:2, :]
              + sm[5:6, :] - qrow[4] * sm[7:8, :])
        az = (qrow[2] * sm[3:4, :] - sm[2:3, :]
              + sm[6:7, :] - qrow[5] * sm[7:8, :])
        out_ref[...] = jnp.concatenate(
            [ax, ay, az, jnp.zeros((5, TQ), jnp.float32)], axis=0)


def sweep_packed(F, FT, desc, max_slots: int, params: SimParams, *,
                 spb: int = 4, variant: str = "vpu",
                 precision=jax.lax.Precision.HIGHEST,
                 skip_dead: bool = True):
    """Run the packed-pair force sweep.  F (Npad, 8) / FT (8, Npad) from
    ``pack``; (desc, max_slots) from ``build_desc``.  Returns (8, Npad):
    rows 0..2 = pressure+viscosity acceleration in packed order (no
    gravity)."""
    npad = F.shape[0]
    q = npad // TQ
    pmax = -(-int(max_slots) // spb)

    def _qidx(t, p, d):
        return (0, t)

    def _cidx(t, p, d, k=0):
        tile, _, _, _ = _slot_scalars(d, t, p * spb + k)
        return (tile, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q, pmax),
        in_specs=[
            pl.BlockSpec((8, TQ), _qidx, memory_space=pltpu.VMEM),
            *[pl.BlockSpec((TC, 8), functools.partial(_cidx, k=k),
                           memory_space=pltpu.VMEM) for k in range(spb)],
        ],
        out_specs=pl.BlockSpec((8, TQ), _qidx, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, TQ, 8) if variant == "mxu" else (8, TC, TQ),
                       jnp.float32),
        ],
    )
    kernel = functools.partial(_sweep_kernel, params=params, spb=spb,
                               pmax=pmax, variant=variant,
                               precision=precision, skip_dead=skip_dead)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(desc).reshape(-1), FT, *([F] * spb))


# ------------------------------------------------------------ parity path

def accel_mxu(pos, vel, rho, pres, params: SimParams, *, spb: int = 4,
              variant: str = "vpu", skip_dead: bool = True):
    """All-in-one packed-pair acceleration in ORIGINAL particle order
    (pressure + viscosity, no gravity) — the ops/naive.accel_naive parity
    surface.  Host round-trip for the descriptor build; prototype only."""
    f, ft, cids, order = pack(pos, vel, rho, pres, params)
    desc, mx = build_desc(np.asarray(cids), f.shape[0], params)
    out = sweep_packed(f, ft, desc, mx, params, spb=spb, variant=variant,
                       skip_dead=skip_dead)
    a = out[:3, :pos.shape[0]].T
    return jnp.zeros_like(pos).at[order].set(a)


def slot_table(desc: np.ndarray):
    """Expand desc to flat per-slot (qtile, tile, lo, hi) numpy arrays —
    the test/stats view of exactly what the kernel's arithmetic visits."""
    qts, tiles, los, his = [], [], [], []
    for t in range(desc.shape[0]):
        for r in range(3):
            lo, hi = int(desc[t, 2 * r]), int(desc[t, 2 * r + 1])
            if hi <= lo:
                continue
            for tl in range(lo // TC, (hi - 1) // TC + 1):
                qts.append(t)
                tiles.append(tl)
                los.append(lo)
                his.append(hi)
    return (np.asarray(qts, np.int32), np.asarray(tiles, np.int32),
            np.asarray(los, np.int32), np.asarray(his, np.int32))


def table_stats(cids: np.ndarray, npad: int, params: SimParams) -> dict:
    """Padding accounting for the measured verdict: evaluated pair tiles
    vs range-mask coverage vs (caller-supplied) true candidate ideal."""
    desc, mx = build_desc(cids, npad, params)
    qt, tiles, lo, hi = slot_table(desc)
    cov = np.maximum(np.minimum(hi, (tiles + 1) * TC)
                     - np.maximum(lo, tiles * TC), 0)
    q = npad // TQ
    return {
        "n": int(len(cids)),
        "qtiles": q,
        "live_slots": int(len(tiles)),
        "max_slots": int(mx),
        "eval_pairs": int(len(tiles)) * TC * TQ,
        "covered_pairs": int(cov.sum()) * TQ,
        "slots_per_qtile": float(len(tiles)) / q,
    }
