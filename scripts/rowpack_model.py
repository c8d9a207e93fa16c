"""Work model for a row-packed sliding-window neighbor sweep (design check).

The rank-planar layout's force sweep runs its rank loops to the per-block MAX
cell occupancy (p99 = K = 8) while the mean is 2.2 — measured 17.7x padding
over true candidate pairs (scripts/occ_stats.py).  This script models the
alternative layout before building it:

  * particles packed DENSE per (z, y) row, sorted by x within the row
    (slot = row * R_cap + rank_in_row; same two-sort + monotone-route build
    machinery as ops/planes.py, different slot map);
  * query tile = (8 consecutive y-rows) x (128 packed particles each);
  * for each of the 9 (dz, dy) row-neighbor offsets, candidates are a
    contiguous packed-index window around the query tile (both sides sorted
    by x), swept with a lane-shift loop of D iterations where
    D = max over lanes/sublanes of (needed window end - lane) -
        min over lanes/sublanes of (needed window start - lane) + 1.

Prints the modeled sweep work (in lane-ops) for the shared-base and
per-sublane-base variants vs the current block-bound model and the true-pair
ideal, plus row-count stats (R_cap sizing) and query tail padding.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from gpufluidsimulator_tpu import scenes
    from gpufluidsimulator_tpu.models import solver

    params, state = scenes.double_dam_break(n=n, dim=3)
    params = params.replace(diagnostics=False)
    state = solver.run(state, params, warm, method="pallas")
    pos = np.asarray(state.pos, np.float64)
    n = pos.shape[0]

    h = params.h
    cell = params.cell
    lo = np.asarray(params.bounds_min)
    res = params.grid_res
    nx, ny, nz = res[0], res[1], res[2]

    cy = np.clip(((pos[:, 1] - lo[1]) / cell).astype(np.int64), 0, ny - 1)
    cz = np.clip(((pos[:, 2] - lo[2]) / cell).astype(np.int64), 0, nz - 1)
    row = cz * ny + cy
    n_rows = nz * ny

    order = np.lexsort((pos[:, 0], row))
    xs = pos[order, 0]
    rs = row[order]
    row_start = np.searchsorted(rs, np.arange(n_rows + 1))
    counts = np.diff(row_start)

    occ = counts[counts > 0]
    print(f"N={n} rows={n_rows} occupied_rows={occ.size}")
    print(f"row count: mean {occ.mean():.1f} p50 {np.percentile(occ,50):.0f} "
          f"p90 {np.percentile(occ,90):.0f} p99 {np.percentile(occ,99):.0f} "
          f"max {occ.max()}")
    tiles_per_row = -(-counts // 128)
    q_slots = int(tiles_per_row.sum()) * 128
    print(f"query tiles: {int(tiles_per_row.sum())}  "
          f"tail padding {q_slots / n:.3f}x")

    # lane index and combined sorted key for global searchsorted
    lane = np.arange(n) - row_start[rs]          # packed index within row
    span = xs.max() - xs.min() + 4 * h + 1.0
    key = rs * span + (xs - xs.min()) + h        # strictly increasing

    R = 8                                         # y-rows per block
    yb = cy // R
    n_yb = -(-ny // R)
    # query block id: (z, yb, tile)
    t_of = lane // 128
    max_t = int(t_of.max()) + 1
    blk = (cz * n_yb + yb) * max_t + t_of
    n_blk = nz * n_yb * max_t

    work_shared = 0.0        # shared base across the 8 sublanes
    work_subbase = 0.0       # per-sublane base (8 extra rolls per (dz,dy))
    true_pairs = 0.0

    NEG = 1 << 40
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            r2 = row + dz * ny + dy
            # clip row validity: same z slab +- 1, y within bounds
            y2 = cy + dy
            z2 = cz + dz
            ok = (y2 >= 0) & (y2 < ny) & (z2 >= 0) & (z2 < nz)
            r2c = np.clip(r2, 0, n_rows - 1)
            klo = r2c * span + (xs - xs.min()) + h - h
            khi = r2c * span + (xs - xs.min()) + h + h
            lo_g = np.searchsorted(key, klo, side="left")
            hi_g = np.searchsorted(key, khi, side="right")
            lo_in = lo_g - row_start[r2c]
            hi_in = hi_g - row_start[r2c] - 1     # inclusive
            cnt = np.maximum(hi_in - lo_in + 1, 0)
            cnt = np.where(ok, cnt, 0)
            true_pairs += cnt.sum()
            has = ok & (hi_in >= lo_in)
            a = np.where(has, lo_in - lane, NEG + 1)
            b = np.where(has, hi_in - lane, -NEG)
            # shared-base: min/max over the whole block
            amin = np.full(n_blk, NEG, np.int64)
            bmax = np.full(n_blk, -NEG, np.int64)
            np.minimum.at(amin, blk, a)
            np.maximum.at(bmax, blk, b)
            D = np.maximum(bmax - amin + 1, 0)
            D = np.where(bmax < -NEG + 1, 0, D)
            work_shared += D.sum() * 1024
            # per-sublane base: min/max per (block, sublane-row), D = max_s
            sb = blk * R + (cy % R)
            amin2 = np.full(n_blk * R, NEG, np.int64)
            bmax2 = np.full(n_blk * R, -NEG, np.int64)
            np.minimum.at(amin2, sb, a)
            np.maximum.at(bmax2, sb, b)
            D2 = np.maximum(bmax2 - amin2 + 1, 0)
            D2 = np.where(bmax2 < -NEG + 1, 0, D2)
            D2 = D2.reshape(n_blk, R).max(axis=1)
            work_subbase += D2.sum() * 1024

    cur_tiles = 1.197e6 if abs(n - 1.2e6) < 1e5 else None
    OPS_CUR, OPS_NEW = 35.0, 52.0
    print(f"true pairs (exact x-window, 9 rows): {true_pairs:.3e}")
    print(f"model lane-slots: shared-base {work_shared:.3e} "
          f"({work_shared / true_pairs:.2f}x padding), per-sublane-base "
          f"{work_subbase:.3e} ({work_subbase / true_pairs:.2f}x)")
    est_new = work_shared * OPS_NEW
    est_new2 = work_subbase * (OPS_NEW + 2)
    print(f"modeled force-sweep ops: shared {est_new:.3e}  "
          f"sub-base {est_new2:.3e}")
    if cur_tiles:
        cur = cur_tiles * 1024 * OPS_CUR
        print(f"current block-bound ops:  {cur:.3e}  -> speedup "
              f"shared {cur / est_new:.2f}x  sub-base {cur / est_new2:.2f}x")


if __name__ == "__main__":
    main()
