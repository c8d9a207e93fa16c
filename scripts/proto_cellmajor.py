"""NumPy prototype: single-sort cell-major routing + MXU deinterleave.

Validates, over randomized trials, the scheme that replaces the two-sort
rank-major binning (sort by cid, then by rank-major slot) with ONE sort:

  * slot = cid*K + rank is strictly increasing in cid-sorted order for
    kept particles.  Overflow particles (rank >= K) are pushed to the tail
    by a stable partition (in the real path: a lax.cond'd key sort that
    only runs when the overflow counter is nonzero) so the routed stream is
    GAPLESS -- a mid-stream unflagged element breaks the non-decreasing-
    shift invariant of the butterfly (validated to fail here).
  * the routed local tile is CELL-MAJOR (1024 cells x K ranks); a fixed
    permutation (one (64,128)@(128,128) matmul on the MXU in the real
    kernel) deinterleaves it into K rank planes of (8 rows, 128 lanes).
  * inverse: interleave rank planes back to cell-major, run the LSB-first
    inverse network, recover per-particle values.

Run: python scripts/proto_cellmajor.py  -> prints PASS/FAIL per trial batch.
"""

from __future__ import annotations

import numpy as np

K = 8
TILE = 8192          # slots per tile = 1024 cells * K
LOCAL = 16384
LANES = 128
N_BITS = 14


def route_fwd_np(fields, shift, flag):
    """MSB-first monotone expansion (flat 1D local space), per tile row."""
    pos = np.arange(LOCAL)
    for b in range(N_BITS - 1, -1, -1):
        d = 1 << b
        move = (flag > 0.5) & (((shift >> b) & 1) == 1)
        arrive = np.roll(move, d) & (pos >= d)
        fields = [np.where(arrive, np.roll(x, d),
                           np.where(move, 0.0, x)) for x in fields]
        shift = np.where(arrive, np.roll(shift, d) - d,
                         np.where(move, 0, shift))
        flag = np.where(arrive, 1.0, np.where(move, 0.0, flag))
    return fields, flag


def route_bwd_np(fields, shift, flag):
    pos = np.arange(LOCAL)
    for b in range(N_BITS):
        d = 1 << b
        move = (flag > 0.5) & (((shift >> b) & 1) == 1)
        arrive = np.roll(move, -d) & (pos < LOCAL - d)
        fields = [np.where(arrive, np.roll(x, -d),
                           np.where(move, 0.0, x)) for x in fields]
        shift = np.where(arrive, np.roll(shift, -d),
                         np.where(move, 0, shift))
        flag = np.where(arrive, 1.0, np.where(move, 0.0, flag))
    return fields, flag


def deinterleave(v):
    """(64,128) cell-major rows -> (K, 8, 128): out[k,y,x] =
    v[y*8 + x//16, (x%16)*8 + k]   (= one matmul by a fixed permutation
    + static slices on TPU; plain indexing here)."""
    out = np.empty((K, 8, 128), v.dtype)
    for k in range(K):
        for y in range(8):
            x = np.arange(128)
            out[k, y, :] = v[y * 8 + x // 16, (x % 16) * 8 + k]
    return out


def interleave(planes):
    """Inverse of deinterleave: (K, 8, 128) -> (64, 128)."""
    v = np.empty((64, 128), planes.dtype)
    for k in range(K):
        for y in range(8):
            x = np.arange(128)
            v[y * 8 + x // 16, (x % 16) * 8 + k] = planes[k, y, :]
    return v


def trial(rng, n_cells_tiles=3, n=None, overflow_rate=0.15):
    n_cells = 1024 * n_cells_tiles
    n_tiles = n_cells_tiles
    if n is None:
        n = rng.integers(1, n_cells * 3)
    # random cell assignment with occasional crowded cells
    crowd = rng.integers(0, n_cells, size=max(1, n_cells // 50))
    cid = rng.integers(0, n_cells, size=n)
    mask = rng.random(n) < overflow_rate
    cid[mask] = rng.choice(crowd, size=mask.sum())
    cid = np.sort(cid)
    # rank within cell (stable arrival order)
    rank = np.zeros(n, np.int64)
    for c in np.unique(cid):
        idx = np.nonzero(cid == c)[0]
        rank[idx] = np.arange(idx.size)
    ok = rank < K
    # stable partition: dropped to the tail (the lax.cond branch)
    order = np.argsort(~ok, kind="stable")
    cid, rank, ok = cid[order], rank[order], ok[order]
    slot = np.where(ok, cid * K + rank, n_cells * K)

    vals = rng.standard_normal(n).astype(np.float32)
    vals[vals == 0] = 1.0
    kept_slots = slot[ok]
    assert np.all(np.diff(kept_slots) > 0)
    assert np.all(np.diff(slot) >= 0)

    # tile windows
    bases = np.arange(n_tiles + 1) * TILE
    starts = np.searchsorted(slot, bases)

    planes = np.zeros((n_tiles, K, 8, 128), np.float32)  # value planes
    shifts_p = np.full((n_tiles, K, 8, 128), -1.0, np.float32)

    for t in range(n_tiles):
        s, e = starts[t], starts[t + 1]
        if s == e:
            continue
        row0 = s // LANES
        o = s - row0 * LANES
        # window of up to LOCAL elements from flat particle stream
        w_slot = np.full(LOCAL, -1, np.int64)
        w_val = np.zeros(LOCAL, np.float32)
        take = min(LOCAL, n - row0 * LANES)
        w_slot[:take] = slot[row0 * LANES:row0 * LANES + take]
        w_val[:take] = vals[row0 * LANES:row0 * LANES + take]
        pos = np.arange(LOCAL)
        m = e - s
        flag = ((pos >= o) & (pos < o + m)).astype(np.float32)
        target = w_slot - t * TILE + LANES
        shift = np.where(flag > 0.5, target - pos, 0)
        assert np.all(shift[flag > 0.5] >= 0), "negative shift"
        assert np.all(shift < LOCAL), "shift overflow"
        routed, flag_r = route_fwd_np([w_val, pos.astype(np.float64)],
                                      shift.copy(), flag)
        filled = flag_r > 0.5
        v = np.where(filled, routed[0], 0.0)[LANES:LANES + TILE]
        tshift = np.where(filled, pos - routed[1], -1.0)[LANES:LANES + TILE]
        planes[t] = deinterleave(v.reshape(64, 128).astype(np.float32))
        shifts_p[t] = deinterleave(
            tshift.reshape(64, 128).astype(np.float32))

    # check forward placement: every kept particle's value at its slot
    flat = np.zeros(n_tiles * TILE, np.float32)
    for t in range(n_tiles):
        v = interleave(planes[t])
        flat[t * TILE:(t + 1) * TILE] = v.reshape(-1)
    kept = ok
    assert np.allclose(flat[slot[kept]], vals[kept]), "placement mismatch"
    n_filled = (interleave_all(shifts_p) >= 0).sum()
    assert n_filled == kept.sum(), (n_filled, kept.sum())

    # inverse: planes -> per-particle
    out = np.zeros(n, np.float32)
    got = np.zeros(n, bool)
    for t in range(n_tiles):
        s, e = starts[t], starts[t + 1]
        if s == e:
            continue
        o = s % LANES
        v = interleave(planes[t]).reshape(-1)
        sh = interleave(shifts_p[t]).reshape(-1)
        w_val = np.zeros(LOCAL, np.float32)
        w_sh = np.zeros(LOCAL, np.int64)
        w_flag = np.zeros(LOCAL, np.float32)
        w_val[LANES:LANES + TILE] = v
        w_sh[LANES:LANES + TILE] = np.maximum(sh, 0).astype(np.int64)
        w_flag[LANES:LANES + TILE] = (sh >= 0).astype(np.float32)
        routed, flag_b = route_bwd_np([w_val], w_sh, w_flag)
        strip = routed[0]
        # particles of this tile land at local positions [o, o + (e-s))
        lp = np.arange(o, o + (e - s))
        sel = flag_b[lp] > 0.5
        out[np.arange(s, e)[sel]] = strip[lp][sel]
        got[np.arange(s, e)[sel]] = True
    assert np.all(got[kept]), "kept particle missing from extraction"
    assert not np.any(got[~kept]), "dropped particle got a value"
    assert np.allclose(out[kept], vals[kept]), "extraction mismatch"
    return n, int(kept.sum())


def interleave_all(planes_t):
    return np.stack([interleave(p).reshape(-1) for p in planes_t])


def main():
    rng = np.random.default_rng(0)
    trials = 120
    for i in range(trials):
        n, k = trial(rng)
    # adversarial: heavy overflow, tiny n, exact-capacity cells
    for i in range(60):
        trial(rng, overflow_rate=0.8)
        trial(rng, n=rng.integers(1, 50))
    print(f"PASS: {trials + 120} randomized trials "
          f"(incl. heavy-overflow and tiny-N)")


if __name__ == "__main__":
    main()
