"""A/B probes for the force sweep (the single largest step phase).

Modes (all physics-WRONG except "prod"; cost-structured clones):
  prod   : production accel_planes (no integrate fusion) for the baseline.
  1dx    : only the dx=0 pair per (dy, k2) — 1/3 of the pair math and 1/3
           of the per-rank roll state, identical reads/trips.  If ~3x
           faster the kernel is ALU/issue-bound on pair math; if barely
           faster the cost is reads/loop/register overhead.
  build  : window build + EOS only, no q_loop (per-block fixed cost).
  2k     : two candidate ranks per trip (k2*2, k2*2+1 masked) — halves the
           trip count at the same pair math; tests loop/latency overhead.

Usage: python scripts/ab_force.py [N] [dim] [modes_csv]
"""

from __future__ import annotations

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import inc, kernels, pallas_sph, physics
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.ops.planes import LANES, ROWS_PER_BLOCK
from gpufluidsimulator_tpu.utils.profiling import slope_time


def _force_kernel_probe(occ_q_ref, occ_s_ref, *args, params, geom, mode):
    dzs, dys, dxs = pallas_sph._stencil(params.dim)
    n_in = 3 * len(dzs)
    refs, rest = args[:n_in], args[n_in:]
    rrefs, rest = rest[:n_in], rest[n_in:]
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
    rest_d = jnp.float32(params.rest_density)
    m_spiky = jnp.float32(-kernels.spiky_grad_coef(params.h, params.dim)
                          * params.particle_mass)
    m_visc_sqrt = jnp.float32(_math.sqrt(
        kernels.visc_lap_coef(params.h, params.dim)
        * params.particle_mass * params.viscosity))

    @pl.when(occ_q > 0)
    def _():
        pallas_sph._build_windows(win, refs, 6, dzs)
        for i in range(len(dzs)):
            r0, r1, r2 = rrefs[i]
            win[i, 6, :, ROWS_PER_BLOCK - 1:ROWS_PER_BLOCK, :] = \
                r0[:, 0, 0, ROWS_PER_BLOCK - 1:ROWS_PER_BLOCK, :]
            win[i, 6, :, ROWS_PER_BLOCK:2 * ROWS_PER_BLOCK, :] = \
                r1[:, 0, 0, :, :]
            win[i, 6, :, 2 * ROWS_PER_BLOCK:2 * ROWS_PER_BLOCK + 1, :] = \
                r2[:, 0, 0, 0:1, :]
        for zi in range(len(dzs)):
            xw = win[zi, 0]
            rw = win[zi, 6]
            validw = xw < pm.SENTINEL * 0.5
            rho_c = jnp.where(validw,
                              jnp.maximum(rw, 1e-3 * rest_d), rest_d)
            pres = physics.eos_pressure(rho_c, params)
            win[zi, 6] = m_spiky * pres / (rho_c * rho_c)
            win[zi, 7] = m_visc_sqrt / rho_c
        if mode == "build":
            acc_ref[0, 0, 0, 0, :, :] = win[0, 0, 0, 0:8, :]
            return
        ctr = len(dzs) // 2

        def q_loop(k1, _):
            q0 = [win[ctr, j, k1, 8:16, :] for j in range(8)]
            if mode == "1dx":
                qv = {0: q0}
                dxs_used = (0,)
            else:
                qv = {0: q0,
                      -1: [pltpu.roll(t, LANES - 1, axis=1) for t in q0],
                      1: [pltpu.roll(t, 1, axis=1) for t in q0]}
                dxs_used = (-1, 0, 1)
            z = jnp.zeros((ROWS_PER_BLOCK, LANES), jnp.float32)
            acc = {dx: (z, z, z, z) for dx in dxs_used}

            def pair(qf, cand, a4):
                qx, qy, qz_, qvx, qvy, qvz, qp, qir = qf
                cx, cy, cz, cvx, cvy, cvz, cp, cir = cand
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
                coef_p = (qp + cp) * (hr * hr * inv_r)
                coef_v = hr * (qir * cir)
                sv = sv + coef_v
                ax = ax + coef_p * ddx + coef_v * cvx
                ay = ay + coef_p * ddy + coef_v * cvy
                if params.dim == 3:
                    az = az + coef_p * ddz + coef_v * cvz
                return ax, ay, az, sv

            for zi, dz in enumerate(dzs):
                occ_c = occ_s_ref[bidx * 3 + dz]

                if mode == "2k":
                    def c_loop2(i, accs):
                        out = list(accs)
                        for half in (0, 1):
                            k2 = jnp.minimum(2 * i + half, occ_c - 1)
                            for dy in (0, 1, 2):
                                cand = [win[zi, j, k2, dy + 7:dy + 15, :]
                                        for j in range(8)]
                                for ai, dx in enumerate(dxs_used):
                                    out[ai] = pair(qv[dx], cand, out[ai])
                        return tuple(out)

                    accs = tuple(acc[dx] for dx in dxs_used)
                    accs = jax.lax.fori_loop(0, (occ_c + 1) // 2, c_loop2,
                                             accs)
                else:
                    def c_loop(k2, accs):
                        out = list(accs)
                        for dy in (0, 1, 2):
                            cand = [win[zi, j, k2, dy + 7:dy + 15, :]
                                    for j in range(8)]
                            for ai, dx in enumerate(dxs_used):
                                out[ai] = pair(qv[dx], cand, out[ai])
                        return tuple(out)

                    accs = tuple(acc[dx] for dx in dxs_used)
                    accs = jax.lax.fori_loop(0, occ_c, c_loop, accs)
                acc = {dx: accs[ai] for ai, dx in enumerate(dxs_used)}

            def fin(dx):
                s = acc[dx]
                return [s[c] - qv[dx][3 + c] * s[3] for c in range(3)]

            out = fin(0)
            for dx in dxs_used:
                if dx == 0:
                    continue
                fdx = fin(dx)
                shift = (-dx) % LANES
                for c in range(3):
                    out[c] = out[c] + pltpu.roll(fdx[c], shift, axis=1)
            acc_ref[0, k1, 0, 0, :, :] = out[0]
            acc_ref[1, k1, 0, 0, :, :] = out[1]
            acc_ref[2, k1, 0, 0, :, :] = out[2]
            return 0

        jax.lax.fori_loop(0, occ_q, q_loop, 0)

    def fill_loop(k1, _):
        @pl.when(k1 >= occ_q)
        def _():
            acc_ref[:, k1, 0, 0, :, :] = jnp.zeros(
                (3, ROWS_PER_BLOCK, LANES), jnp.float32)
        return 0
    jax.lax.fori_loop(0, geom.k, fill_loop, 0)


def force_probe(field_planes, rho_planes, occ_q, occ_s, params, geom, mode):
    n_dz = 3 if geom.dim == 3 else 1
    grid, in_specs = pallas_sph._grid_and_specs(geom, 6)
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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs + rho_specs,
        out_specs=pl.BlockSpec(
            (3, geom.k, 1, 1, ROWS_PER_BLOCK, LANES),
            pallas_sph._out_index(geom, 1), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(
            (n_dz, 8, geom.k, 3 * ROWS_PER_BLOCK, LANES), jnp.float32)],
    )
    kernel = functools.partial(_force_kernel_probe, params=params, geom=geom,
                               mode=mode)
    n_copies = len(in_specs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (3, geom.k, geom.pz, geom.n_bx, geom.py, LANES), jnp.float32),
        interpret=pallas_sph._interpret(),
    )(occ_q.reshape(-1), occ_s.reshape(-1),
      *([field_planes] * n_copies), *([rho_planes] * n_copies))


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    modes = sys.argv[3].split(",") if len(sys.argv) > 3 else \
        ["1dx", "build", "2k"]
    params, state = scenes.double_dam_break(n=n_target, dim=dim)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    state = solver.run(state, params, 50, method="pallas")
    jax.block_until_ready(state.pos)
    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)
    planes6 = pm.halo_x(s0.fields6)
    occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
    rho_h = pm.halo_x(pallas_sph.density_planes(
        planes6[:3], occ_q, occ_s, params, geom))
    rho_h = jax.block_until_ready(rho_h)

    def run_prod(pp):
        acc = pallas_sph.accel_planes(pp, rho_h, occ_q, occ_s, params, geom)
        return pp + 1e-30 * acc[(0,) * acc.ndim]

    def mk(mode):
        def run(pp):
            acc = force_probe(pp, rho_h, occ_q, occ_s, params, geom, mode)
            return pp + 1e-30 * acc[(0,) * acc.ndim]
        return run

    print(f"N={state.n} dim={dim} grid={params.grid_res}")
    t_prod = slope_time(run_prod, planes6)
    print(f"force production : {t_prod * 1e3:8.3f} ms", flush=True)
    for mode in modes:
        t = slope_time(mk(mode), planes6)
        print(f"force {mode:10s} : {t * 1e3:8.3f} ms   "
              f"ratio {t_prod / t:.3f}x", flush=True)


if __name__ == "__main__":
    main()
