"""Occupancy + block-bound work model for ANISOTROPIC binning cells.

Round-3 padding attack, step 1 (measure before building).  The round-2
decomposition killed cubic coarser cells (stencil volume cancels packing:
cell=2dx measured 1.09x, scripts/occ_cellsize.py) — but an anisotropic
cell (dx, 2dx, 2dx) changes the trade:

  * the fine axis rides the LANE dimension, where extra stencil offsets
    are query lane-rolls that SHARE the candidate reads of a trip (the
    kernels already evaluate 3 x-offsets per candidate read; widening to
    5 costs pair math only, not reads);
  * y/z stay at 2dx — the exact-integer-multiple window that measured
    ALIAS-FREE on evolved flow (occupancy exactly 2 planes per axis,
    p50=p90=p99=max, occ_cellsize.py) — so cell occupancy concentrates
    at 1*2*2 = 4 instead of aliasing over 1..8;
  * per-block rank bounds then sit at ~mean instead of ~p99: model
    evals/particle 736 -> ~180.

The open risk this script quantifies: late-time shear rotates the local
lattice and could re-alias the 2dx windows (a 45-degree xy rotation makes
the effective x spacing dx/sqrt2).  So the distribution is measured at
SEVERAL evolution depths, not just the 100-step warm state.

Usage:  python scripts/occ_aniso.py [N] [dim] [warmlist e.g. 100,1000,3000]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import jax
import numpy as np

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver

_ETA = 1.3
LANES = 128
TILE_X = 126
R = 8               # ROWS_PER_BLOCK


def occ_grid(pos, lo, cells_axis, res):
    """(N, d) -> occupancy on an anisotropic grid, shape (nz, ny, nx)."""
    dim = pos.shape[1]
    idx = []
    for d in range(dim):
        c = np.floor((pos[:, d] - lo[d]) / cells_axis[d]).astype(np.int64)
        idx.append(np.clip(c, 0, res[d] - 1))
    if dim == 2:
        flat = idx[1] * res[0] + idx[0]
        occ = np.bincount(flat, minlength=res[0] * res[1])
        return occ.reshape(1, res[1], res[0])
    flat = (idx[2] * res[1] + idx[1]) * res[0] + idx[0]
    occ = np.bincount(flat, minlength=res[0] * res[1] * res[2])
    return occ.reshape(res[2], res[1], res[0])


def work_model(occ, n, n_dx, label):
    """Block-bound sweep model on the plane layout: lanes = x (tiles of
    126 + halos -> treat as ceil(nx/126) tiles of 128 lanes), blocks =
    8 y-rows; bounds = per-block max occupancy (query) and 3-row y-slab
    max per dz (candidate), trips = occ_q * 3dy*ndz * occ_s, each trip
    evaluating n_dx lane-rolled query variants."""
    nz, ny, nx = occ.shape
    n_bx = -(-nx // TILE_X)
    n_by = -(-ny // R)
    # pad to (nz, n_bx, n_by*R, 128) lane/block layout
    occp = np.zeros((nz, n_bx, n_by * R, LANES), np.int64)
    for t in range(n_bx):
        w = min(TILE_X, nx - t * TILE_X)
        occp[:, t, :ny, 1:1 + w] = occ[:, :, t * TILE_X:t * TILE_X + w]
    rowmax = occp.max(axis=-1)                       # (nz, n_bx, rows)
    blk = rowmax.reshape(nz, n_bx, n_by, R).max(-1)  # (nz, n_bx, n_by)
    # y-slab bound: block rows +- 1 row (y stencil halfwidth 1)
    lo_e = np.zeros_like(blk)
    hi_e = np.zeros_like(blk)
    lo_e[:, :, 1:] = rowmax[:, :, R - 1:-R:R][:, :, :n_by - 1]
    hi_e[:, :, :-1] = rowmax[:, :, R::R][:, :, :n_by - 1]
    slab = np.maximum(blk, np.maximum(lo_e, hi_e))
    dzs = (-1, 0, 1) if nz > 1 else (0,)
    trips = 0.0
    for dz in dzs:
        s = np.zeros_like(slab)
        if dz == 0:
            s = slab
        elif dz == 1:
            s[:-1] = slab[1:]
        else:
            s[1:] = slab[:-1]
        trips += (blk * 3 * s).sum()
    lane_ops = trips * R * LANES * n_dx / 3.0   # normalize: today n_dx=3
    nz_ = occ[occ > 0]
    print(f"{label}:")
    print(f"  occupied {nz_.size} mean {nz_.mean():.2f} p50 "
          f"{np.percentile(nz_, 50):.0f} p90 {np.percentile(nz_, 90):.0f} "
          f"p99 {np.percentile(nz_, 99):.0f} max {nz_.max()}  "
          f"(cells {occ.size}, slots@K{int(nz_.max())}="
          f"{int(nz_.max()) * occ.size})")
    print(f"  model evals/particle (n_dx={n_dx}): {lane_ops / n:.0f}",
          flush=True)
    return lane_ops / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warms = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3
                              else "100,1000,3000").split(",")]

    params, state = scenes.double_dam_break(n=n, dim=dim)
    params = params.replace(diagnostics=False)
    dx = params.h / _ETA
    lo = params.bounds_min
    ext = [params.bounds_max[d] - lo[d] for d in range(dim)]

    done = 0
    for warm in warms:
        state = solver.run(state, params, warm - done, method="pallas_inc")
        jax.block_until_ready(state.pos)
        done = warm
        pos = np.asarray(state.pos)
        print(f"\n=== evolved {warm} steps (vmax="
              f"{np.abs(np.asarray(state.vel)).max():.3f}) ===")
        # today's layout: cubic cell=h, x fine on lanes, n_dx=3
        ch = [params.cell] * dim
        res = [max(1, int(np.ceil(ext[d] / ch[d]))) for d in range(dim)]
        work_model(occ_grid(pos, lo, ch, res), n, 3,
                   f"cubic h={params.cell:.4f}")
        # anisotropic (dx, 2dx[, 2dx]): x fine, 5 lane-roll offsets
        ca = [dx] + [2 * dx] * (dim - 1)
        res = [max(1, int(np.ceil(ext[d] / ca[d]))) for d in range(dim)]
        work_model(occ_grid(pos, lo, ca, res), n, 5,
                   "aniso (dx, 2dx, 2dx)")
        # aniso with 2dx snapped DOWN so ny*cell covers the box exactly
        # (window no longer exactly 2dx -> check alias sensitivity)
        ca2 = [dx] + [ext[d] / int(ext[d] / (2 * dx)) for d in range(1, dim)]
        res = [max(1, int(np.ceil(ext[d] / ca2[d] - 1e-9)))
               for d in range(dim)]
        work_model(occ_grid(pos, lo, ca2, res), n, 5,
                   f"aniso snapped (dx, {ca2[1]/dx:.3f}dx, ...)")


if __name__ == "__main__":
    main()
