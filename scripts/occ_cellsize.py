"""Occupancy + block-bound work model vs BINNING CELL SIZE.

BASELINE.md's coarser-cell analysis rejected cell=2h (stencil volume
(6h)^3/(3h)^3 = 8x for ~3.4x packing) — but 2h = 2.6 dx is NOT
commensurate with the particle lattice, so the window still aliases
between capturing 2 and 3 lattice planes per axis.  A LATTICE-SNAPPED
cell of exactly n*dx (dx = h/1.3) captures exactly n planes per axis in
bulk lattice regions (a half-open window of length exactly n*dx on a
dx-lattice always contains n points), so bulk occupancy becomes the
constant n^d and the rank-bound padding (occ_q*occ_s)/mean^2 collapses.
Evolved flow is glass-like, not a lattice, so this must be MEASURED on
a warmed state — that is what this script does: one evolve, then the
occupancy distribution + the force-sweep block-bound work model for a
sweep of cell sizes (today's h, and 2dx/2.5dx/3dx).

Work per particle ~ 27 * B_q * B_s / mu where B saturates at the
per-block p99 and mu is the mean occupancy: at cell=h (mu 2.2, B 7.5)
that is ~690 tile-lane units; if cell=2dx evolves to B<=10 at mu=8 it
is ~340 — a ~2x sweep-work reduction, on top of ~2x fewer slots for
every slot-space-proportional phase (K/cells scaling).

Usage:  python scripts/occ_cellsize.py [N] [dim] [warm]
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

_ETA = 1.3  # h/dx, models/scenes.py


def stats_for(pos, params, label):
    geom = pm.geometry(params)

    @jax.jit
    def occ_of(p):
        cid = pm.cell_linear_parts(p, params, geom)
        return jnp.zeros((geom.cells,), jnp.int32).at[cid].add(1)

    occ = np.asarray(occ_of(pos)).reshape(
        geom.pz, geom.n_bx, geom.py, pm.LANES)
    nz_ = occ[occ > 0]
    R = pm.ROWS_PER_BLOCK
    nb = geom.n_by
    dim = params.dim
    rowmax = occ.max(axis=-1)
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
        occ_q_i = occ_q
        occ_s_i = slab[..., None] * np.array([0, 1, 0])
    w_block = float((occ_q_i * occ_s_i.sum(-1)).sum()) * 9

    # true candidate pairs at this cell size (stencil-volume cost included)
    occ_t = jnp.asarray(occ)
    acc = jnp.zeros_like(occ_t)
    for dz in ((-1, 0, 1) if dim == 3 else (0,)):
        for dy in (-1, 0, 1):
            for dxs in (-1, 0, 1):
                acc = acc + jnp.roll(
                    jnp.roll(jnp.roll(occ_t, dz, 0), dy, 2), dxs, 3)
    pairs = float(jnp.sum(occ_t * acc))

    n = int(occ.sum())
    print(f"{label}: cell={params.cell:.4f} ({params.cell/params.h:.3f}h) "
          f"grid={params.grid_res} cells={geom.cells} "
          f"slots@K8={8*geom.cells}")
    print(f"  occupied {nz_.size}  mean {nz_.mean():.2f}  p50 "
          f"{np.percentile(nz_, 50):.0f} p90 {np.percentile(nz_, 90):.0f} "
          f"p99 {np.percentile(nz_, 99):.0f} max {nz_.max()}")
    print(f"  work/particle: block-bound {w_block*8*128/n:.0f} lane-ops "
          f"| true pairs {pairs/n:.0f} "
          f"| padding {w_block*8*128/max(pairs,1):.1f}x", flush=True)
    return w_block * 8 * 128 / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    state = solver.run(state, params, warm, method="pallas")
    pos = state.pos
    dx = params.h / _ETA

    base = stats_for(pos, params, "cell=h (today)")
    for mult in (2.0, 2.5, 3.0):
        p2 = params.replace(cell_size=mult * dx)
        w = stats_for(pos, p2, f"cell={mult}dx")
        print(f"  -> sweep-work ratio vs today: {base / w:.2f}x")


if __name__ == "__main__":
    main()
