"""Occupancy statistics of the warmed dam-break state: how much padding the
per-block bounds leave on the table, and what finer bounds could recover.

Prints, for the force sweep's work model:
  work(block bounds)   = sum_b occ_q(b) * sum_dz occ_s(b,dz) * 9 tiles
  work(row bounds)     = same with per-(dz,dy) 8-row-band bounds
  work(exact pairs)    = sum over cells nc * (sum of neighbor-cell counts)
                         / (8*128) -- the unreachable per-lane ideal
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver
from gpufluidsimulator_tpu.ops import planes as pm


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    state = solver.run(state, params, warm, method="pallas")
    geom = pm.geometry(params)

    @jax.jit
    def occ_of(pos):
        cid = pm.cell_linear_parts(pos, params, geom)
        return jnp.zeros((geom.cells,), jnp.int32).at[cid].add(1)

    occ = np.asarray(occ_of(state.pos)).reshape(
        geom.pz, geom.n_bx, geom.py, pm.LANES)
    print(f"N={state.n} cells={geom.cells} geom={geom}")
    nz = occ[occ > 0]
    print(f"occupied cells: {nz.size}  mean occ {nz.mean():.2f}  "
          f"p50 {np.percentile(nz, 50):.0f} p90 {np.percentile(nz, 90):.0f} "
          f"p99 {np.percentile(nz, 99):.0f} max {nz.max()}")
    print(f"over-capacity cells (> {geom.k}): {(nz > geom.k).sum()}")

    R = pm.ROWS_PER_BLOCK
    nb = geom.n_by
    # per-row max over lanes
    rowmax = occ.max(axis=-1)                    # (pz, n_bx, py)
    rowsum = occ.sum(axis=-1)                    # particles per row

    # ---- block-bound work model (current kernels) ----
    blk = rowmax.reshape(geom.pz, geom.n_bx, -1, R).max(axis=-1)
    edge_lo = rowmax[..., R - 1::R]
    edge_hi = rowmax[..., R::R]
    occ_q = blk[..., 1:nb + 1]
    slab = np.maximum(blk[..., 1:nb + 1],
                      np.maximum(edge_lo[..., 0:nb], edge_hi[..., 1:nb + 1]))
    if dim == 3:
        zpad = np.zeros_like(slab[:1])
        occ_s = np.stack([
            np.concatenate([zpad, slab[:-1]], 0),
            slab,
            np.concatenate([slab[1:], zpad], 0)], -1)
        occ_q_i = occ_q[1:geom.nz + 1]
        occ_s_i = occ_s[1:geom.nz + 1]
    else:
        occ_q_i, occ_s_i = occ_q, slab[..., None] * np.array([0, 1, 0])

    w_block = (occ_q_i * occ_s_i.sum(-1)).sum() * 9  # 9 = 3dy*3dx tiles
    # ---- per-(dz, dy) 8-row band bounds ----
    # band for (block by, dy) = rows [by*R-1+dy, by*R+6+dy] of the padded grid
    w_row = 0
    pz_lo = 1 if dim == 3 else 0
    nz_range = range(1, geom.nz + 1) if dim == 3 else [0]
    for zq_i, zq in enumerate(nz_range):
        dzs = (-1, 0, 1) if dim == 3 else (0,)
        for by in range(nb):
            y0 = (by + 1) * R
            q = occ_q_i[zq_i, :, by]            # (n_bx,)
            for dz in dzs:
                for dy in (0, 1, 2):
                    band = rowmax[zq + dz, :, y0 - 1 + dy:y0 + 7 + dy]
                    w_row += (q * band.max(-1)).sum() * 3
    # ---- exact pair tiles (unreachable; per-cell granularity) ----
    npart = rowsum  # not per-cell exact; compute true pair count instead
    # true candidate pairs: sum_c occ[c] * sum_{neighbors} occ[c']
    occ_t = jnp.asarray(occ)
    acc = jnp.zeros_like(occ_t)
    for dz in ((-1, 0, 1) if dim == 3 else (0,)):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = acc + jnp.roll(
                    jnp.roll(jnp.roll(occ_t, dz, 0), dy, 2), dx, 3)
    pairs = float(jnp.sum(occ_t * acc))
    print(f"work model (pair-tile units of 8x128 lanes x ~35 ops):")
    print(f"  block bounds (current): {w_block:.3e}")
    print(f"  per-(dz,dy) row bounds: {w_row:.3e}  "
          f"({w_block / max(w_row,1):.2f}x better)")
    print(f"  true candidate pairs:   {pairs:.3e}  "
          f"(= {pairs/ (8*128):.3e} tile-equivalents, "
          f"{w_block*8*128/pairs:.1f}x padding in current)")


if __name__ == "__main__":
    main()
