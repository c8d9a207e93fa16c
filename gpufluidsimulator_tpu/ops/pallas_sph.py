"""Fused Pallas TPU kernels for the SPH neighbor sweeps (config 3+).

Reference counterparts: ``computeDensityPressureKernel`` and
``computeForcesKernel`` — the two hot CUDA kernels (SURVEY.md §3.1).  This is
NOT a translation: the CUDA kernels are one-thread-per-particle with gather
loops; TPUs have no per-lane gather, so the sweep is restructured around the
rank-planar layout (ops/planes.py):

  * grid = (z-planes, y-blocks); each program owns an (8 y-rows x 128 x-cells)
    tile of cells and all K rank planes above it.
  * the 3^d-cell stencil is: z -> choice of slab ref, y -> static sublane
    slice of a 24-sublane row window, x -> lane roll of the query.  Zero
    gathers, zero dynamic shapes, every vector op runs on a full native
    (8, 128) tile.
  * per-block occupancy bounds (scalar-prefetched) bound the rank loops, so
    the fixed-capacity padding (K=8 vs ~2.2 mean occupancy) costs almost
    nothing: `fori_loop(0, occ)` instead of K iterations.
  * empty slots hold sentinel positions -> smoothing kernels evaluate to
    exactly 0 against them; no masks in the hot loop beyond the r>0 guard.

Distances use direct coordinate differences in f32 (positions are O(1) in
domain units; the |a|^2-2ab expansion would lose ~3 digits near r->0).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import SimParams
from . import kernels, physics
from . import planes as pm
from . import route
from .planes import LANES, ROWS_PER_BLOCK, PlaneGeom


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll_x(tile, dx: int):
    """Candidate tile for x-offset dx: lane l holds cell (l + dx)."""
    if dx == 0:
        return tile
    return pltpu.roll(tile, (-dx) % LANES, axis=1)


def _build_windows(scr, refs, n_fields: int, dzs: Sequence[int]):
    """Assemble row windows from the 3 y-block refs per dz.

    The window occupies rows 7:17 of a 24-sublane scratch: row 7 = the last
    row of the y-block below, rows 8:16 = the query block (a full
    (8, 128)-tile-ALIGNED copy), row 16 = the first row of the block above.
    Candidate reads slice rows (dy+7):(dy+15); query reads rows 8:16
    (aligned).

    NEGATIVE RESULT (kept as the 9-full-block fetch): pre-gathering the two
    needed neighbor rows into a compact (n_by, 2, 128) edge array and
    fetching (2, 128) edge blocks instead of full neighbor blocks cut the
    per-program stencil fetch bytes 2.4x — and made BOTH sweeps SLOWER
    (force 13.6 -> 14.5 ms, density 7.1 -> 7.6 @1.47M, plus 1.4+0.7 ms of
    XLA edge builds).  The pipeline DMA that a no-compute probe measures at
    4.8/2.7 ms per sweep overlaps the rank-loop compute almost entirely in
    the real kernels; the redundant fetches are effectively free, and the
    extra specs/builds are pure loss.  (Single-row BlockSpecs are illegal
    in the sublane dim, so a direct 1-row fetch is not expressible.)
    """
    for i, dz in enumerate(dzs):
        r0, r1, r2 = refs[i]
        scr[i, 0:n_fields, :, ROWS_PER_BLOCK - 1:ROWS_PER_BLOCK, :] = \
            r0[:, :, 0, 0, ROWS_PER_BLOCK - 1:ROWS_PER_BLOCK, :]
        scr[i, 0:n_fields, :, ROWS_PER_BLOCK:2 * ROWS_PER_BLOCK, :] = \
            r1[:, :, 0, 0, :, :]
        scr[i, 0:n_fields, :, 2 * ROWS_PER_BLOCK:2 * ROWS_PER_BLOCK + 1, :] \
            = r2[:, :, 0, 0, 0:1, :]


def _stencil(dim: int, hw: int = 1):
    """z slab choices, y window slices, x lane-roll offsets.

    ``hw`` is the x-stencil halfwidth: 1 for cubic cells; ceil(h/cell_x)
    under anisotropic cells (SimParams.cell_aniso) — extra x offsets are
    query lane-rolls that SHARE each trip's candidate reads, which is what
    makes the fine-x layout pay (BASELINE.md round-3 padding attack)."""
    dzs = (0, 1, 2) if dim == 3 else (1,)
    return dzs, (0, 1, 2), tuple(range(-hw, hw + 1))


# --------------------------------------------------------------------------
# density kernel
# --------------------------------------------------------------------------

def _density_kernel(occ_q_ref, occ_s_ref, *args, params: SimParams,
                    geom: PlaneGeom):
    dzs, dys, dxs = _stencil(params.dim)
    n_in = 3 * len(dzs)
    refs, (rho_ref, win) = args[:n_in], args[n_in:]
    refs = [refs[3 * i:3 * i + 3] for i in range(len(dzs))]

    if params.dim == 3:
        bz, bx, by = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    else:
        bz, bx, by = 0, pl.program_id(0), pl.program_id(1)
    bidx = (bz * geom.n_bx + bx) * geom.n_by + by
    occ_q = occ_q_ref[bidx]

    h2 = jnp.float32(params.h * params.h)
    c_poly6 = jnp.float32(kernels.poly6_coef(params.h, params.dim) *
                          params.particle_mass)

    @pl.when(occ_q > 0)
    def _():
        _build_windows(win, refs, pm.N_POS_FIELDS, dzs)
        ctr = len(dzs) // 2

        def q_loop(k1, _):
            # Roll the QUERY by +dx and accumulate each x-offset's pairs in
            # the candidate frame (the force kernel's scheme): 6 lane-rolls
            # per rank + 2 roll-backs, vs the 9 full pre-rolled window
            # variants this replaced — an A/B decomposition (scripts/
            # ab_align.py) measured that per-block fixed cost (window build
            # + pre-rolls, no pair loop) at 2.7 ms of the 7.1 ms sweep
            # @1.47M.  Bonus: candidate reads drop 27 -> 9 per trip (shared
            # across the 3 dx evals) and the accumulator chain splits 3 ways.
            q0 = [win[ctr, j, k1, 8:16, :] for j in range(pm.N_POS_FIELDS)]
            qv = {0: q0,
                  -1: [pltpu.roll(t, LANES - 1, axis=1) for t in q0],
                  1: [pltpu.roll(t, 1, axis=1) for t in q0]}
            z = jnp.zeros((ROWS_PER_BLOCK, LANES), jnp.float32)

            def pair(qf, cand, a):
                ddx = qf[0] - cand[0]
                ddy = qf[1] - cand[1]
                r2 = ddx * ddx + ddy * ddy
                if params.dim == 3:
                    ddz = qf[2] - cand[2]
                    r2 = r2 + ddz * ddz
                d = jnp.maximum(h2 - r2, 0.0)
                return a + d * d * d

            acc = {dx: z for dx in (-1, 0, 1)}
            for zi, dz in enumerate(dzs):
                occ_c = occ_s_ref[bidx * 3 + dz]

                def c_loop(k2, accs):
                    am, a0, ap = accs
                    for dy in (0, 1, 2):
                        cand = [win[zi, j, k2, dy + 7:dy + 15, :]
                                for j in range(pm.N_POS_FIELDS)]
                        am = pair(qv[-1], cand, am)
                        a0 = pair(qv[0], cand, a0)
                        ap = pair(qv[1], cand, ap)
                    return am, a0, ap

                accs = jax.lax.fori_loop(0, occ_c, c_loop,
                                         (acc[-1], acc[0], acc[1]))
                acc = {-1: accs[0], 0: accs[1], 1: accs[2]}

            # acc[dx] at lane l belongs to query lane l - dx; roll back
            out = acc[0]
            for dx in (-1, 1):
                out = out + pltpu.roll(acc[dx], (-dx) % LANES, axis=1)
            rho_ref[k1, 0, 0, :, :] = c_poly6 * out
            return 0

        jax.lax.fori_loop(0, occ_q, q_loop, 0)

    # ranks never touched above still need defined output
    def fill_loop(k1, _):
        @pl.when(k1 >= occ_q)
        def _():
            rho_ref[k1, 0, 0, :, :] = jnp.zeros((ROWS_PER_BLOCK, LANES),
                                                 jnp.float32)
        return 0
    jax.lax.fori_loop(0, geom.k, fill_loop, 0)


# --------------------------------------------------------------------------
# force kernel
# --------------------------------------------------------------------------

def _force_kernel(occ_q_ref, occ_s_ref, *args, params: SimParams,
                  geom: PlaneGeom, fuse_integrate: bool = False,
                  wall_params: SimParams = None, emit_movers: bool = False,
                  continuity: bool = False):
    """Fused pressure-gradient + viscosity sweep.

    Inputs arrive as TWO window groups — the 6-channel pos/vel plane stack
    and the 1-channel density planes (kept separate so the step never
    materializes a concatenated 7-channel stack in HBM).  Window channel
    order after the fused EOS pass:
      0:x 1:y 2:z 3:vx 4:vy 5:vz 6:m_spiky*p/rho^2 7:m_visc_sqrt/rho
    Output: (3, K, 1, 8, 128) acceleration block (gravity added outside),
    or with ``fuse_integrate`` the (6, ...) post-step pos/vel block:
    symplectic Euler + gravity + wall/obstacle collide run in-kernel on the
    query tiles (the incremental path, ops/inc.py — accelerations then never
    leave the planes).

    With ``emit_movers`` (requires fuse_integrate) the epilogue additionally
    detects slots whose post-step position left its cell and writes a 0/1
    flag plane for them; the post-step pos/vel planes are written UNBLANKED
    (mover values stay in place), so ops/inc.py can extract the movers
    straight out of the new planes with compact_flagged and the consolidate
    pass excludes them via the flag.  (v2 compacted movers in-kernel through
    a flat-1024 routing network per rank tile — measured ~11 ms @1.47M,
    BASELINE.md — v3 replaces that with one extra output channel.)

    With ``continuity`` (requires fuse_integrate + emit_movers) the
    density input group carries the CARRIED rho of the incremental path
    (ops/inc.py continuity tier) instead of a fresh summation sweep — the
    whole density sweep drops out of the step — and the pair loop emits
    next step's density plane in one of two forms (SimParams.cont_form):

      * "sum" (default, round 5): emit the COMPLETED summation
        R(x) + dt*dR/dt — the exact poly6 summation advanced by its own
        concurrent continuity rate, fused into one accumulator
        (sum d4*(d2 - 6 dt (vi-vj).dd)).  Mode-identical to the rate
        form (same lag eigenstructure, same deferred correction) but
        re-anchored at an exact summation every step: zero drift, no
        resum cadence, true self-density for isolated particles.
        Marginal pair cost ~2 ops: d2, d4 and dot are already computed
        for the correction term.
      * "rate" (round 4): accumulate drho/dt = sum_j m (v_i-v_j).gradW
        (poly6 gradient) and emit the explicit-Euler update
        rho_new = rho + dt*drho/dt; re-synced by a periodic summation
        sweep (ops/inc.RESUM_EVERY).  Marginal pair cost is ~8 VPU ops
        (dv, dv.dd, fma) on top of ~26.

    Reference match: SURVEY.md §2 "Density/pressure pass" — the
    capability is density+EOS.
    """
    dzs, dys, dxs = _stencil(params.dim)
    if continuity:
        assert fuse_integrate and emit_movers
    if emit_movers:
        # third scalar-prefetch operand: (2,) f32 [slab binning x-origin,
        # slab end) — equal to the global x bounds on a single chip, the
        # device's slab under spatial sharding (parallel/sharded.py)
        slab_ref, args = args[0], args[1:]
    n_in = 3 * len(dzs)
    refs, rest = args[:n_in], args[n_in:]
    rrefs, rest = rest[:n_in], rest[n_in:]
    if continuity:
        acc_ref, rho_ref, flag_ref, win = rest
    elif emit_movers:
        acc_ref, flag_ref, win = rest
    else:
        acc_ref, win = rest
    refs = [refs[3 * i:3 * i + 3] for i in range(len(dzs))]
    rrefs = [rrefs[3 * i:3 * i + 3] for i in range(len(dzs))]

    if params.dim == 3:
        bz, bx, by = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    else:
        bz, bx, by = 0, pl.program_id(0), pl.program_id(1)
    bidx = (bz * geom.n_bx + bx) * geom.n_by + by
    occ_q = occ_q_ref[bidx]

    h = jnp.float32(params.h)
    import math as _math
    rest = jnp.float32(params.rest_density)
    m_spiky = jnp.float32(-kernels.spiky_grad_coef(params.h, params.dim)
                          * params.particle_mass)
    m_visc_sqrt = jnp.float32(_math.sqrt(
        kernels.visc_lap_coef(params.h, params.dim)
        * params.particle_mass * params.viscosity))
    # continuity: drho = dt * m * sum((vi-vj) . grad W_poly6) with
    # grad W_poly6 = -6 c (h^2-r^2)^2 d — the POLY6 gradient, not spiky:
    # summation density is poly6, and d/dt[sum m W(x_ij)] =
    # sum m grad W . (vi-vj) is a chain-rule IDENTITY only for the same
    # kernel.  (First build used the spiky gradient — its 1/r blowup for
    # close pairs mis-estimated drho by ~50% of rho0 within 2 steps on a
    # jittered lattice; poly6-gradient continuity tracks the summation
    # field to O(dt^2)/step.)  Negative scale: approaching pairs
    # (dv.dd < 0) raise the density.
    drho_scale = jnp.float32(
        -6.0 * params.dt * kernels.poly6_coef(params.h, params.dim)
        * params.particle_mass)
    # "sum" form (SimParams.cont_form): the pair accumulator holds the
    # exact poly6 summation sum (h^2-r^2)^3 and the emitted density is
    # R(x) — a fresh summation each step, read by next step's EOS one
    # step stale, stabilized by the deferred correction exactly like the
    # rate form.  MEASURED NEGATIVE (round 5): "completing" the emission
    # to R(x) + dt*dR/dt (one fused op, d4*(d2 - 6 dt dot)) on the
    # theory that it reproduces the rate form's forward-Euler estimate
    # made the KE acceptance gate WORSE (0.0658 vs pure R(x)'s 0.0531
    # @1000 full-CFL steps) — the deferred-correction pressure term
    # already compensates the one-step lag, so completing the density as
    # well double-corrects.  Emit R(x) alone.
    sum_form = continuity and params.cont_form == "sum"
    rho_sum_scale = jnp.float32(
        kernels.poly6_coef(params.h, params.dim) * params.particle_mass)
    # "relax" form (the default): rho' = (1-l)(rho + dt drho) + l R(x),
    # folded into the single rate accumulator as d4*(dot + kappa_d2*d2):
    #   (1-l) drho_scale * sum d4*dot + l c_sum * sum d4*d2
    #     = (1-l) drho_scale * sum d4*(dot + kappa_d2 d2)
    #   kappa_d2 = l c_sum / ((1-l) drho_scale)
    # so the density-error mode decays by (1-l) per step (drift bounded,
    # frozen splash rho relaxes to truth) at ~2 extra ops/pair.
    relax_form = continuity and params.cont_form == "relax"
    _l = params.cont_relax if relax_form else 0.0
    _c_sum = (kernels.poly6_coef(params.h, params.dim)
              * params.particle_mass)
    _drho_sc = (-6.0 * params.dt
                * kernels.poly6_coef(params.h, params.dim)
                * params.particle_mass)
    kappa_d2 = jnp.float32(
        _l * _c_sum / ((1.0 - _l) * _drho_sc) if relax_form and _l < 1.0
        else 0.0)
    one_m_l = jnp.float32(1.0 - _l)
    h2c = jnp.float32(params.h * params.h)
    # Monaghan alpha-viscosity fold (continuity tier only; see
    # SimParams.cont_alpha for why the continuity form NEEDS a stabilizer):
    # the pair term m_spiky * Pi_ij with Pi = alpha c h (-mu)/rho0,
    # mu = (dv.dd)/(r^2 + 0.01 h^2), active on approaching pairs only.
    # Momentum-conserving (symmetric, central).
    c_av = jnp.float32(
        (-kernels.spiky_grad_coef(params.h, params.dim))
        * params.particle_mass * params.cont_alpha * params.sound_speed
        * params.h / params.rest_density)
    eps_h2 = jnp.float32(0.01 * params.h * params.h)
    # delta-SPH density diffusion fold (the preferred continuity
    # stabilizer, SimParams.cont_delta): adds
    #   drho_i/dt += 12 delta h c m c_poly6 * sum_j d2^2 (1 - rho_i/rho_j)
    # i.e. in the shared drho accumulator (scaled by drho_scale < 0):
    #   sr += d2^2 * (dot - kappa * (1 - rho_i/rho_j)),  kappa = 2 delta h c.
    # 1/rho_j comes free off the viscosity window channel (ch7 =
    # m_visc_sqrt / rho_j), so the query-side factor kappa*rho_i/m_visc
    # rides as a 9th rolled query channel and the pair cost is ~2 ops.
    # The self-pair cancels exactly: qf8*cir = kappa.  Requires
    # viscosity > 0 (ch7 nonzero) — statically disabled otherwise.
    use_delta = (continuity and not sum_form and params.cont_delta > 0.0
                 and params.viscosity > 0.0)
    kappa = jnp.float32(2.0 * params.cont_delta * params.h
                        * params.sound_speed)
    m_visc_f = float(_math.sqrt(
        kernels.visc_lap_coef(params.h, params.dim)
        * params.particle_mass * params.viscosity)) or 1.0
    kappa_over_mv = jnp.float32(
        2.0 * params.cont_delta * params.h * params.sound_speed / m_visc_f)
    # deferred-correction pressure fold (SimParams.cont_beta): the pairwise
    # diagonal of delta-p_i = c^2 dt drho_i/dt, entering the (p/rho^2)-sum
    # as  psum -= C_CORR * d2^2 * (dv.dd):
    #   C_CORR = m_spiky * 2 * 6 c_poly6 * m * c^2 * dt / rho0^2
    # (one m from the force fold, one from drho's mass; 1/rho^2 ~ 1/rho0^2
    # under weak compressibility).  Sign: approaching pairs (dot < 0) get
    # extra repulsion — the compression the lagged EOS hasn't seen yet.
    use_corr = continuity and params.cont_beta > 0.0
    c_corr = jnp.float32(
        params.cont_beta
        * (-kernels.spiky_grad_coef(params.h, params.dim))
        * params.particle_mass
        * 12.0 * kernels.poly6_coef(params.h, params.dim)
        * params.particle_mass * params.stiffness * params.dt
        / (params.rest_density ** 2))
    # Clamp the per-pair correction at the 20%-overdensity pressure scale:
    # the correction is an ACOUSTIC stabilizer (typical magnitude ~ the
    # pressure of a ~1% density ripple, 20x below this cap), but its raw
    # form grows with the pair's closing speed and over-kicked isolated
    # splash particles in violent encounters — a 5000-step soak measured
    # sustained vmax 13-32 vs the summation tier's 5.6-9.8 before the
    # clamp.  Outside the linear regime the term has no business being
    # large; the clamp leaves the stability analysis untouched.
    corr_cap = jnp.float32(
        (-kernels.spiky_grad_coef(params.h, params.dim))
        * params.particle_mass
        * params.stiffness * 0.2 / params.rest_density)

    @pl.when(occ_q > 0)
    def _():
        _build_windows(win, refs, 6, dzs)
        # density windows from the separate 1-channel group -> channel 6
        # (same single-row neighbor layout as _build_windows)
        for i in range(len(dzs)):
            r0, r1, r2 = rrefs[i]
            win[i, 6, :, ROWS_PER_BLOCK - 1:ROWS_PER_BLOCK, :] = \
                r0[:, 0, 0, ROWS_PER_BLOCK - 1:ROWS_PER_BLOCK, :]
            win[i, 6, :, ROWS_PER_BLOCK:2 * ROWS_PER_BLOCK, :] = \
                r1[:, 0, 0, :, :]
            win[i, 6, :, 2 * ROWS_PER_BLOCK:2 * ROWS_PER_BLOCK + 1, :] = \
                r2[:, 0, 0, 0:1, :]
        # EOS fused at window-build time: channel 6 (rho) becomes the
        # pressure term m_spiky*p/rho^2, channel 7 the viscosity sqrt-factor
        # (one pass per window instead of two extra plane channels)
        for zi in range(len(dzs)):
            xw = win[zi, 0]
            rw = win[zi, 6]
            validw = xw < pm.SENTINEL * 0.5
            rho_c = jnp.where(validw,
                              jnp.maximum(rw, 1e-3 * rest), rest)
            pres = physics.eos_pressure(rho_c, params)
            win[zi, 6] = m_spiky * pres / (rho_c * rho_c)
            win[zi, 7] = m_visc_sqrt / rho_c
        ctr = len(dzs) // 2

        def q_loop(k1, _):
            # Roll the QUERY by +dx and compute each x-offset's pairs in the
            # candidate frame, rolling the per-dx accumulators back at the
            # end: 22 lane-rolls per rank instead of 8 fields x every
            # (dz,k2,dy,dx) candidate tile (~50x fewer rolls).
            q0 = [win[ctr, j, k1, 8:16, :] for j in range(8)]
            if use_delta:
                # 9th query channel: kappa * rho_i / m_visc_sqrt — pairs
                # with the candidate viscosity channel (m_visc_sqrt/rho_j)
                # to give the delta-diffusion ratio kappa*rho_i/rho_j
                q0.append(rrefs[ctr][1][k1, 0, 0, :, :] * kappa_over_mv)
            qv = {0: q0,
                  -1: [pltpu.roll(t, LANES - 1, axis=1) for t in q0],
                  1: [pltpu.roll(t, 1, axis=1) for t in q0]}
            z = jnp.zeros((ROWS_PER_BLOCK, LANES), jnp.float32)
            n_acc = 5 if continuity else 4
            acc = {dx: (z,) * n_acc for dx in (-1, 0, 1)}

            def pair(qf, cand, a4):
                qx, qy, qz_, qvx, qvy, qvz, qp, qir = qf[:8]
                cx, cy, cz, cvx, cvy, cvz, cp, cir = cand
                if continuity:
                    ax, ay, az, sv, sr = a4
                else:
                    ax, ay, az, sv = a4
                ddx = qx - cx
                ddy = qy - cy
                r2 = ddx * ddx + ddy * ddy
                if params.dim == 3:
                    ddz = qz_ - cz
                    r2 = r2 + ddz * ddz
                inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-16))
                r = r2 * inv_r
                hr = jnp.maximum(h - r, 0.0)
                # no explicit self/degenerate guard: for the self pair every
                # coordinate/velocity difference is exactly 0, so both force
                # terms vanish by multiplication, and the r2 clamp above
                # keeps coef_p finite (eps-regularized for coincident pairs)
                # pressure: -m (pa+pb) g(r)/r * d  (constants pre-folded
                # into the pr2 plane)
                g = hr * hr * inv_r
                psum = qp + cp
                if continuity:
                    dot = (qvx - cvx) * ddx + (qvy - cvy) * ddy
                    if params.dim == 3:
                        dot = dot + (qvz - cvz) * ddz
                    d2 = jnp.maximum(h2c - r2, 0.0)
                    d4 = d2 * d2
                    t_dot = d4 * dot
                    if use_corr:
                        psum = psum - jnp.clip(c_corr * t_dot,
                                               -corr_cap, corr_cap)
                    if params.cont_alpha > 0.0:
                        rr = jax.lax.rsqrt(r2 + eps_h2)
                        u = dot * (rr * rr)
                        psum = psum - c_av * jnp.minimum(u, 0.0)
                coef_p = psum * g
                # viscosity: mu m (vb-va) ira irb lap(r)  (constants folded
                # into the irho plane as sqrt factors).  The -va term factors
                # out of the pair loop: accumulate sum(coef_v) in sv and
                # subtract qv*sv once per rank in the finalize step below
                # (saves dim subs per pair tile)
                coef_v = hr * (qir * cir)
                sv = sv + coef_v
                ax = ax + coef_p * ddx + coef_v * cvx
                ay = ay + coef_p * ddy + coef_v * cvy
                if params.dim == 3:
                    az = az + coef_p * ddz + coef_v * cvz
                if continuity:
                    # "sum": the exact poly6 summation density rides the
                    # accumulator — d4*d2 = (h^2-r^2)^3, one extra mul
                    # (d2, d4 shared with the correction term above).
                    # "rate": the continuity density rate (v_i-v_j).dd
                    # with the poly6-gradient weight (h^2-r^2)^2 — the
                    # constant -6 c_poly6 m dt folds into drho_scale
                    # outside; with use_delta the delta-SPH diffusion
                    # rides the same accumulator:
                    # w = dot - kappa*(1 - rho_i/rho_j).
                    if sum_form:
                        sr = sr + d4 * d2
                    elif relax_form:
                        sr = sr + d4 * (dot + kappa_d2 * d2)
                    elif use_delta:
                        sr = sr + d4 * ((dot - kappa) + qf[8] * cir)
                    else:
                        sr = sr + t_dot
                    return ax, ay, az, sv, sr
                return ax, ay, az, sv

            for zi, dz in enumerate(dzs):
                occ_c = occ_s_ref[bidx * 3 + dz]

                def c_loop(k2, accs):
                    am, a0, ap = accs
                    for dy in (0, 1, 2):
                        cand = [win[zi, j, k2, dy + 7:dy + 15, :]
                                for j in range(8)]
                        am = pair(qv[-1], cand, am)
                        a0 = pair(qv[0], cand, a0)
                        ap = pair(qv[1], cand, ap)
                    return am, a0, ap

                accs = (acc[-1], acc[0], acc[1])
                accs = jax.lax.fori_loop(0, occ_c, c_loop, accs)
                acc = {-1: accs[0], 0: accs[1], 1: accs[2]}

            # finalize each dx-accumulator in its own (rolled-query) frame —
            # the factored viscosity -qv*sum(coef_v) term — then roll back
            # into the query frame: s computed at lane l belongs to query
            # lane l - dx.  (2D: the vz channel is all-zero, planes.py)
            def fin(dx):
                s = acc[dx]
                f = [s[c] - qv[dx][3 + c] * s[3] for c in range(3)]
                if continuity:
                    f.append(s[4])
                return f

            n_fin = 4 if continuity else 3
            out = fin(0)
            for dx in (-1, 1):
                fdx = fin(dx)
                shift = (-dx) % LANES
                for c in range(n_fin):
                    out[c] = out[c] + pltpu.roll(fdx[c], shift, axis=1)
            if not fuse_integrate:
                acc_ref[0, k1, 0, 0, :, :] = out[0]
                acc_ref[1, k1, 0, 0, :, :] = out[1]
                acc_ref[2, k1, 0, 0, :, :] = out[2]
                return 0
            # fused symplectic Euler + collide on the query tiles
            wp = wall_params or params
            dt = jnp.float32(params.dt)
            grav = params.gravity + (0.0,) * (3 - params.dim)
            valid_q = q0[0] < pm.SENTINEL * 0.5
            vnew = [q0[3 + c] + (out[c] + jnp.float32(grav[c])) * dt
                    for c in range(params.dim)]
            pnew = [q0[c] + vnew[c] * dt for c in range(params.dim)]
            pnew, vnew = physics.collide_axes(pnew, vnew, wp)
            if not emit_movers:
                for c in range(params.dim):
                    acc_ref[c, k1, 0, 0, :, :] = jnp.where(
                        valid_q, pnew[c], pm.SENTINEL)
                    acc_ref[3 + c, k1, 0, 0, :, :] = jnp.where(
                        valid_q, vnew[c], 0.0)
                if params.dim == 2:
                    acc_ref[2, k1, 0, 0, :, :] = jnp.where(
                        valid_q, q0[2], pm.SENTINEL)
                    acc_ref[5, k1, 0, 0, :, :] = jnp.zeros(
                        (ROWS_PER_BLOCK, LANES), jnp.float32)
                return 0

            # --- mover emission (ops/inc.py step): detect slots whose
            # post-step position left its cell while it is still in VMEM
            shape = (ROWS_PER_BLOCK, LANES)
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            gx = bx * pm.TILE_X + lane - 1
            interior = (lane >= 1) & (lane <= pm.TILE_X) & (gx < geom.nx)
            cax = params.cells_axis
            lo = params.bounds_min

            def cellc(c, ncells, base=None):
                b = jnp.float32(lo[c]) if base is None else base
                f = jnp.floor((pnew[c] - b) * jnp.float32(1.0 / cax[c]))
                return jnp.clip(f.astype(jnp.int32), 0, ncells - 1)

            x0 = slab_ref[0]          # slab binning origin (= lo[0] 1-chip)
            moved = cellc(0, geom.nx, base=x0) != gx
            moved |= cellc(1, geom.ny) + ROWS_PER_BLOCK \
                != (by + 1) * ROWS_PER_BLOCK + row
            if params.dim == 3:
                moved |= cellc(2, geom.nz) != bz
            # clipping hides slab exits: a particle leaving through the
            # slab's x faces keeps its clipped edge cell, so flag it
            # explicitly (single chip: collide clamps x inside the slab,
            # so these terms are always False and the flag is unchanged)
            moved |= (pnew[0] < x0) | (pnew[0] >= slab_ref[1])
            moved &= valid_q & interior
            zeros = jnp.zeros(shape, jnp.float32)
            p3 = list(pnew) + [zeros] * (3 - params.dim)
            v3 = list(vnew) + [zeros] * (3 - params.dim)
            for c in range(3):
                acc_ref[c, k1, 0, 0, :, :] = jnp.where(
                    valid_q, p3[c], pm.SENTINEL)
                acc_ref[3 + c, k1, 0, 0, :, :] = jnp.where(
                    valid_q, v3[c], 0.0)
            flag_ref[k1, 0, 0, :, :] = moved.astype(jnp.float32)
            if continuity:
                if sum_form:
                    # fresh poly6 summation over this step's (pre-kick)
                    # positions — next step's EOS reads it one step stale
                    rho_new = rho_sum_scale * out[3]
                else:
                    # explicit-Euler continuity update of the CARRIED
                    # density: the raw (pre-EOS) query rho comes straight
                    # off the center input ref — the window's channel 6
                    # was overwritten by the EOS fold at build time.
                    # relax form: the (1-l) prefactor distributes over
                    # both terms (the kappa_d2 fold put the summation
                    # inside the same accumulator)
                    rho_q = rrefs[ctr][1][k1, 0, 0, :, :]
                    if relax_form:
                        rho_new = one_m_l * (rho_q + drho_scale * out[3])
                    else:
                        rho_new = rho_q + drho_scale * out[3]
                rho_ref[k1, 0, 0, :, :] = jnp.where(valid_q, rho_new, 0.0)
            return 0

        jax.lax.fori_loop(0, occ_q, q_loop, 0)

    def fill_loop(k1, _):
        @pl.when(k1 >= occ_q)
        def _():
            if fuse_integrate:
                for c in range(3):
                    acc_ref[c, k1, 0, 0, :, :] = jnp.full(
                        (ROWS_PER_BLOCK, LANES), pm.SENTINEL, jnp.float32)
                acc_ref[3:6, k1, 0, 0, :, :] = jnp.zeros(
                    (3, ROWS_PER_BLOCK, LANES), jnp.float32)
                if emit_movers:
                    flag_ref[k1, 0, 0, :, :] = jnp.zeros(
                        (ROWS_PER_BLOCK, LANES), jnp.float32)
                if continuity:
                    rho_ref[k1, 0, 0, :, :] = jnp.zeros(
                        (ROWS_PER_BLOCK, LANES), jnp.float32)
            else:
                acc_ref[:, k1, 0, 0, :, :] = jnp.zeros(
                    (3, ROWS_PER_BLOCK, LANES), jnp.float32)
        return 0
    jax.lax.fori_loop(0, geom.k, fill_loop, 0)


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------

def _grid_and_specs(geom: PlaneGeom, n_fields: int):
    """Build the (grid, in_specs) for the 3x3 y-block/z-plane stencil copies.

    Per (dz): the center y-block arrives as a full (8, 128) block; the two
    y-neighbors as SINGLE-ROW blocks (only the adjacent edge row is ever
    read — see _build_windows; this cuts the pipeline's stencil fetch
    redundancy from 9x to 3.75x, worth ~4.5 ms/step @1.47M).

    (An indirect 1D grid over an actives-first block list — skipping the
    empty tail's window copies via repeated-index elision — was measured
    ~2 ms SLOWER @1M: the sweeps are compute-bound, so the elided DMA was
    already hidden, and the scalar-prefetch index-map reads add per-step
    overhead.  Keep the dense static grid.)
    """
    dzs, _, _ = _stencil(geom.dim)
    blk = (n_fields, geom.k, 1, 1, ROWS_PER_BLOCK, LANES)
    if geom.dim == 3:
        grid = (geom.nz, geom.n_bx, geom.n_by)

        def mk(dz, j):
            return pl.BlockSpec(
                # grid bz in [0,nz) -> z plane bz+dz (dz in {0,1,2} == z-1..z+1
                # around interior plane bz+1); y block by+j in [0, n_by+2)
                # (*_ swallows the scalar-prefetch refs appended by the spec)
                blk,
                lambda bz, bx, by, *_, dz=dz, j=j:
                    (0, 0, bz + dz, bx, by + j, 0),
                memory_space=pltpu.VMEM)

        in_specs = [mk(dz, j) for dz in (0, 1, 2) for j in (0, 1, 2)]
    else:
        grid = (geom.n_bx, geom.n_by)

        def mk(j):
            return pl.BlockSpec(
                blk,
                lambda bx, by, *_, j=j: (0, 0, 0, bx, by + j, 0),
                memory_space=pltpu.VMEM)

        in_specs = [mk(j) for j in (0, 1, 2)]
    return grid, in_specs


def _out_index(geom: PlaneGeom, lead: int):
    if geom.dim == 3:
        return lambda bz, bx, by, *_: (0,) * lead + (0, bz + 1, bx, by + 1, 0)
    return lambda bx, by, *_: (0,) * lead + (0, 0, bx, by + 1, 0)


def density_planes(pos_planes, occ_q, occ_s, params: SimParams,
                   geom: PlaneGeom):
    """(3, K, pz, py, 128) position planes -> (K, pz, py, 128) density."""
    n_dz = 3 if geom.dim == 3 else 1
    grid, in_specs = _grid_and_specs(geom, pm.N_POS_FIELDS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (geom.k, 1, 1, ROWS_PER_BLOCK, LANES), _out_index(geom, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_dz, pm.N_POS_FIELDS, geom.k,
                        3 * ROWS_PER_BLOCK, LANES), jnp.float32),
        ],
    )
    kernel = functools.partial(_density_kernel, params=params, geom=geom)
    n_copies = len(in_specs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (geom.k, geom.pz, geom.n_bx, geom.py, LANES), jnp.float32),
        interpret=_interpret(),
    )(occ_q.reshape(-1), occ_s.reshape(-1), *([pos_planes] * n_copies))


def accel_planes(field_planes, rho_planes, occ_q, occ_s,
                 params: SimParams, geom: PlaneGeom,
                 fuse_integrate: bool = False,
                 wall_params: SimParams = None,
                 emit_movers: bool = False, slab=None,
                 continuity: bool = False):
    """(6, K, pz, n_bx, py, 128) pos/vel planes + (K, pz, n_bx, py, 128)
    density planes -> (3, ...) acceleration (pressure + viscosity; gravity
    NOT included).  The EOS runs fused inside the kernel.

    With ``fuse_integrate``: -> (6, ...) post-integration pos/vel planes
    (gravity, symplectic Euler and collide all in-kernel); ghost blocks are
    left unwritten — the incremental path masks them by interior region.

    With ``emit_movers`` (requires fuse_integrate):
    -> (new6, flagp) where new6 holds the UNBLANKED post-step pos/vel planes
    and flagp (K, pz, n_bx, py, 128) is 1.0 on interior slots whose particle
    left its cell this step (its ghost blocks, like new6's, are unwritten
    garbage — ops/inc.py masks by interior region).  ``slab`` (2,) f32
    [binning x-origin, slab end) marks particles leaving the device's x
    slab as movers under spatial sharding; default is the global domain
    padded by one cell, which never triggers on a single chip (collide
    clamps x inside the walls).

    With ``continuity`` (requires both): rho_planes is the CARRIED density
    (not a fresh sweep) and the return is (new6, rho_new, flagp) with
    rho_new the continuity-updated density plane (see _force_kernel).
    """
    n_dz = 3 if geom.dim == 3 else 1
    grid, in_specs = _grid_and_specs(geom, 6)

    rho_blk = (geom.k, 1, 1, ROWS_PER_BLOCK, LANES)
    if geom.dim == 3:
        def mk_rho(dz, j):
            return pl.BlockSpec(
                rho_blk,
                lambda bz, bx, by, *_, dz=dz, j=j:
                    (0, bz + dz, bx, by + j, 0),
                memory_space=pltpu.VMEM)

        rho_specs = [mk_rho(dz, j) for dz in (0, 1, 2) for j in (0, 1, 2)]
    else:
        def mk_rho(j):
            return pl.BlockSpec(
                rho_blk,
                lambda bx, by, *_, j=j: (0, 0, bx, by + j, 0),
                memory_space=pltpu.VMEM)

        rho_specs = [mk_rho(j) for j in (0, 1, 2)]
    n_out = 6 if fuse_integrate else 3
    main_spec = pl.BlockSpec(
        (n_out, geom.k, 1, 1, ROWS_PER_BLOCK, LANES), _out_index(geom, 1),
        memory_space=pltpu.VMEM)
    main_shape = jax.ShapeDtypeStruct(
        (n_out, geom.k, geom.pz, geom.n_bx, geom.py, LANES), jnp.float32)
    extra_scalars = []
    if emit_movers:
        assert fuse_integrate
        if slab is None:
            slab = jnp.asarray([params.bounds_min[0],
                                params.bounds_max[0] + params.cell],
                               jnp.float32)
        extra_scalars = [jnp.asarray(slab, jnp.float32)]
        plane1_spec = pl.BlockSpec((geom.k, 1, 1, ROWS_PER_BLOCK, LANES),
                                   _out_index(geom, 0),
                                   memory_space=pltpu.VMEM)
        plane1_shape = jax.ShapeDtypeStruct(
            (geom.k, geom.pz, geom.n_bx, geom.py, LANES), jnp.float32)
        if continuity:
            out_specs = [main_spec, plane1_spec, plane1_spec]
            out_shape = [main_shape, plane1_shape, plane1_shape]
        else:
            out_specs = [main_spec, plane1_spec]
            out_shape = [main_shape, plane1_shape]
    else:
        assert not continuity
        out_specs, out_shape = main_spec, main_shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + len(extra_scalars),
        grid=grid,
        in_specs=in_specs + rho_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM(
            (n_dz, 8, geom.k, 3 * ROWS_PER_BLOCK, LANES), jnp.float32)],
    )
    kernel = functools.partial(_force_kernel, params=params, geom=geom,
                               fuse_integrate=fuse_integrate,
                               wall_params=wall_params,
                               emit_movers=emit_movers,
                               continuity=continuity)
    n_copies = len(in_specs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(occ_q.reshape(-1), occ_s.reshape(-1), *extra_scalars,
      *([field_planes] * n_copies), *([rho_planes] * n_copies))


# --------------------------------------------------------------------------
# full step
# --------------------------------------------------------------------------

def step_pallas(pos, vel, ids, params: SimParams, *,
                x_origin=None, active=None, exchange=None,
                wall_params: SimParams = None):
    """One full SPH step on the Pallas path.

    bin -> (ghost exchange) -> density sweep -> EOS -> (ghost exchange) ->
    force sweep -> gather -> integrate.  Returns
    (pos, vel, rho, pres, ids, overflow) in CELL-SORTED order (the
    reference's reorder-for-coalescing trick, adopted as canonical order;
    `ids` carries identity).

    Sharded mode (parallel/sharded.py): ``x_origin`` is the device's domain
    offset, ``active`` masks live capacity slots, and ``exchange(stack,
    pos_fields)`` fills the outermost halo lanes from neighbor devices.
    """
    geom = pm.geometry(params)
    table = pm.build_planes(pos, vel, ids, params, geom,
                            x_origin=x_origin, active=active)
    planes = table.planes
    if exchange is not None:
        planes = exchange(planes, n_pos_fields=pm.N_POS_FIELDS)
    occ_q, occ_s = pm.occupancy_bounds(planes, params, geom)
    pos_planes = planes[:pm.N_POS_FIELDS]

    rho_p = density_planes(pos_planes, occ_q, occ_s, params, geom)
    # halo lanes hold edge-truncated densities from the kernel; refresh them
    # from the owning tile before the force sweep reads them as candidates.
    # The EOS + kernel-constant folding runs fused INSIDE the force kernel
    # (window-build time); rho rides as a separate 1-channel input group so
    # no concatenated 7-channel stack is ever materialized in HBM.
    rho_h = pm.halo_x(rho_p)
    if exchange is not None:
        # refresh rho's cross-device halo lanes (positions/velocities in
        # `planes` were exchanged before the density sweep; rho's 0-fill at
        # global edges is sanitized in-kernel)
        rho_h = exchange(rho_h[None], n_pos_fields=0)[0]
    acc_p = accel_planes(planes, rho_h, occ_q, occ_s, params, geom)

    # per-particle values out of the planes: acc (3) [+ rho, pres
    # diagnostics] via the inverse routing network (ops/route) — XLA
    # gathers cost 10-23ns/element here
    from . import route
    if params.diagnostics:
        valid = pos_planes[0] < pm.SENTINEL * 0.5
        rho_d = jnp.maximum(jnp.where(valid, rho_p, params.rest_density),
                            1e-3 * params.rest_density)
        pres_p = physics.eos_pressure(rho_d, params)
        stack = jnp.concatenate([acc_p, rho_d[None], pres_p[None]], axis=0)
    else:
        stack = acc_p
    out = route.extract_per_particle(stack, table.shifts, table.slot,
                                     table.starts, geom)
    out = jnp.where(table.ok[:, None], out, 0.0)
    grav = jnp.asarray(params.gravity + (0.0,) * (3 - params.dim),
                       jnp.float32)
    acc = out[:, :3] + grav                 # dropped rows: 0 + grav = grav
    acc = acc[:, :params.dim]
    if params.diagnostics:
        rho = jnp.where(table.ok, out[:, 3], params.rest_density)
        pres = jnp.where(table.ok, out[:, 4], 0.0)
    else:
        rho = jnp.full(acc.shape[:1], params.rest_density, jnp.float32)
        pres = jnp.zeros(acc.shape[:1], jnp.float32)

    if active is not None:
        active_s = table.ids_s >= 0
        acc = jnp.where(active_s[:, None], acc, 0.0)

    # walls/obstacles may differ from the binning grid (sharded mode: the
    # grid covers one slab but the walls are the global domain)
    pos, vel = physics.integrate(table.pos_s, table.vel_s, acc,
                                 wall_params or params)
    if active is not None:
        # keep inactive slots parked at the sentinel position
        pos = jnp.where(active_s[:, None], pos, pm.SENTINEL)
        vel = jnp.where(active_s[:, None], vel, 0.0)
    return pos, vel, rho, pres, table.ids_s, table.overflow
