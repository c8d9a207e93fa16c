"""Incremental binning: the rank-planar grid as persistent canonical state.

Reference counterpart: none — the CUDA reference re-sorts every frame
(SURVEY.md §3.1).  This module exploits a measured property of SPH under CFL
time steps (scripts/mover_stats.py: 0.2-2.3% of particles change cell per
step at 1.47M) to replace the two full multi-operand sorts of
``planes.build_planes`` with mover-only work:

  * the plane stack (6 pos/vel channels + 1 id channel) IS the state carried
    across steps; flat particle arrays exist only at the API boundary;
  * each step: detect slots whose particle left its cell (pure elementwise),
    blank them, compact the movers out with a tile-local routing network
    (``compact_flagged`` — no scatters/gathers), sort ONLY the movers
    (M = N/8 capacity), route them into K''-rank arrival planes, and
    consolidate kept+arrival ranks per cell;
  * integration is fused into the force kernel (ops/pallas_sph
    ``accel`` -> pos/vel planes directly), so accelerations never leave the
    planes and the extract/stitch pass disappears from the step.

Layout invariants (ops/planes.py): x halo lanes and y/z ghost regions are
refreshed or ignored each step; empty slots hold SENTINEL positions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import SimParams
from . import planes as pm
from . import route
from .planes import LANES, TILE_X, ROWS_PER_BLOCK, PlaneGeom, SENTINEL
from .route import TILE, OUT_ROWS, SPACE_ROWS, STRIP_ROWS

COMPACT_BATCH = 4      # routing tiles handled per compact-kernel program
COMPACT_DEPTH = 4      # DMA ring depth (tiles of prefetch lead; see
# _compact_kernel — depth 2 measured DMA-latency-bound at 3.2 us/tile)
COMPACT_DENSE = False  # round-4 NEGATIVE (kernel kept + parity-tested):
# a pipelined block-spec compact kernel (_compact_kernel2 — one
# compact-order tile per program, inputs indirected through a prefetched
# tile map) was built to attack the ring kernel's ~2.6-2.9 us/live-tile
# cost, on the theory that it was descriptor-ISSUE-bound (8-10 serial
# copy issues/tile).  Measured on-chip @1.2M: evolved 4.7 -> 4.5 ms
# (wash), early 3.2 -> 4.2 ms (SLOWER) — the Pallas pipeline's
# per-program overhead with 11 block-spec operands (index-map evals +
# DMA bookkeeping per ~0.5 us-of-compute program) costs about what the
# manual ring's descriptor issues do, and the dense input fetch wastes
# bandwidth at sparse densities.  The manual ring stays the production
# path.
STAGE_B = 8            # two-level stage compaction: after the per-lane
# (sublane-axis) compact, run the flat butterfly over only the top
# STAGE_B rows when every lane's flagged count fits (the common case —
# measured lane_max max = 8 / p99 = 4 at 0.84% mover density in evolved
# double-dam-break flow, scripts/mover_rows.py); tiles with a hotter
# lane fall back to the full 64-row flat network.  Must be a multiple of
# 8 (sublane granularity) and a power of two (cyclic roll space).

ARRIVAL_K = 8          # K'': max same-cell arrivals routed per step.  Set
# equal to the cell capacity K so the incremental path's only drop
# condition is "post-step cell occupancy > K" — exactly the full-rebuild
# binning's overflow semantics.  (At 4 it also dropped bursts of >4
# same-cell arrivals in one step: measured 271 lost particles over 500
# steps @1M 3D double dam break, where the full rebuild loses none.)

RESUM_EVERY = 64       # continuity tier, cont_form="rate" only: steps
# between summation-density re-syncs.  The rate form integrates
# drho/dt = sum m (vi-vj).gradW explicitly, which drifts
# O(dt * div-v error) per step from the summation density the EOS was
# calibrated against; a full poly6 re-summation every RESUM_EVERY steps
# pins the drift (amortized cost: one density sweep / 64 steps ~ 0.1 ms
# @1.2M).  The default cont_form="sum" (round 5) emits a fresh exact
# summation from the force sweep every step, so it only resums once, at
# age 0, to seed the EOS before the first sweep has run.


def mover_capacity(n: int) -> int:
    """Static mover-array capacity: N/8, at least one routing tile, rounded
    up to a whole tile.  Measured mover fractions are <= 2.3% (BASELINE.md);
    excess movers are dropped and counted in ``overflow``."""
    return -(-max(TILE, n // 8) // TILE) * TILE


class IncState(NamedTuple):
    """Scan-carried state of the incremental path."""
    fields6: jnp.ndarray     # (6, K, pz, n_bx, py, 128) x,y,z,vx,vy,vz
    idp: jnp.ndarray         # (K, pz, n_bx, py, 128) particle id as f32
    overflow: jnp.ndarray    # () i32, physics-capacity drops (mover stage,
    #                          arrival ranks, cell ranks)
    mig_overflow: jnp.ndarray  # () i32, ICI mover-buffer capacity misses
    #                          (sharded-inc only; 0 on a single chip) —
    #                          kept separate from ``overflow`` so cell
    #                          overflow and ICI capacity misses stay
    #                          independently observable, mirroring
    #                          parallel.sharded.run_sharded
    rhop: jnp.ndarray = None   # continuity tier only: carried density
    #                          plane (K, pz, n_bx, py, 128); None on the
    #                          summation-density path
    age: jnp.ndarray = None    # continuity tier only: () i32 step counter
    #                          driving the RESUM_EVERY re-summation cadence

    @property
    def geom_shape(self):
        return self.fields6.shape[1:]


# ---------------------------------------------------------------------------
# static slot geometry
# ---------------------------------------------------------------------------

def own_cid(geom: PlaneGeom) -> jnp.ndarray:
    """(pz, n_bx, py, 128) i32: the linear cell id of each plane column (the
    same linearization as planes.cell_linear_parts)."""
    shape = (geom.pz, geom.n_bx, geom.py, LANES)
    z = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xo = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    y = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    xi = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    return ((z * geom.n_bx + xo) * geom.py + y) * LANES + xi


def interior_mask(geom: PlaneGeom) -> jnp.ndarray:
    """(pz, n_bx, py, 128) bool: True for real (owning) cells — excludes x
    halo lanes, the x tail of the last tile, y ghost bands and z ghost
    planes.  Slots outside this mask are never particle owners."""
    shape = (geom.pz, geom.n_bx, geom.py, LANES)
    z = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xo = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    y = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    xi = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    gx = xo * TILE_X + xi - 1
    ok = (xi >= 1) & (xi <= TILE_X) & (gx < geom.nx)
    ok &= (y >= ROWS_PER_BLOCK) & (y < ROWS_PER_BLOCK + geom.ny)
    if geom.dim == 3:
        ok &= (z >= 1) & (z <= geom.nz)
    return ok


def new_cids(fields6, params: SimParams, geom: PlaneGeom, x_origin=None):
    """Per-slot linear cell id from the position channels (elementwise
    mirror of planes.cell_linear_parts)."""
    lo = params.bounds_min
    cax = params.cells_axis

    def axis(d, n, origin=None):
        base = lo[d] if origin is None else origin
        c = jnp.floor((fields6[d] - base) * (1.0 / cax[d])).astype(jnp.int32)
        return jnp.clip(c, 0, n - 1)

    x = axis(0, geom.nx, x_origin)
    xo = x // TILE_X
    xi = x % TILE_X + 1
    y = axis(1, geom.ny) + ROWS_PER_BLOCK
    if geom.dim == 3:
        z = axis(2, geom.nz) + 1
    else:
        z = jnp.zeros_like(x)
    return ((z * geom.n_bx + xo) * geom.py + y) * LANES + xi


def detect_movers(fields6, idp, params: SimParams, geom: PlaneGeom,
                  x_origin=None):
    """-> (kept6, kept_id, flags).  ``flags`` (K, pz, n_bx, py, 128) marks
    interior slots whose particle now belongs to a different cell; kept
    planes have those slots (and every non-interior slot) blanked."""
    valid = (fields6[0] < SENTINEL * 0.5) & interior_mask(geom)[None]
    cid = new_cids(fields6, params, geom, x_origin)
    flags = valid & (cid != own_cid(geom)[None])
    keep = valid & ~flags
    kept6 = jnp.where(keep[None], fields6,
                      jnp.where(jnp.arange(6)[:, None, None, None, None, None]
                                < 3, SENTINEL, 0.0))
    kept_id = jnp.where(keep, idp, -1.0)
    return kept6, kept_id, flags


# ---------------------------------------------------------------------------
# flagged compaction: plane slots -> compact particle rows (no gathers)
# ---------------------------------------------------------------------------

def _compact_kernel(tile_ids_ref, starts_ref, cls_ref, nlive_ref, *refs,
                    group_sizes, rows_total: int, nt: int):
    """Compact the flagged slots of one routing tile into its particle run.

    Grid program b handles COMPACT_BATCH consecutive compact tile indices
    (tile ids prefetched); live tiles are a prefix of the compacted order,
    so whole batches beyond the live count skip (and share the dummy out
    block).  Channel refs arrive as GROUPS: a (rows_total, 128) single
    channel, or a (g, rows_total, 128) multi-channel stack.  A group's
    channels are fetched with g SEPARATE per-channel copies (each a 2D
    slice at a static leading index — round 3 measured the alternative
    one-strided-(g, 64, 128) DMA SLOWER at real mover densities, the
    huge inter-channel HBM stride defeating the DMA engine, while
    per-copy issue latency hides behind the COMPACT_DEPTH ring), but the
    HBM OPERAND stays the unsliced stack: round 5's profiler timeline
    caught XLA materializing six full-plane slice copies (~1.1 ms/step
    @1.2M, fusion.93) when the caller passed new6[i] per channel —
    grouped operands + per-channel kernel copies keep both costs off.
    DMA ring-buffered at tile granularity across sub-tiles AND across
    programs with COMPACT_DEPTH-1 tiles of lead.
    """
    b = pl.program_id(0)

    n_g = len(group_sizes)
    n_ch = sum(group_sizes) - 1     # last group is the flag channel
    g_off = [sum(group_sizes[:i]) for i in range(n_g)]
    ch_refs = refs[:n_g]
    out_ref = refs[n_g]             # (1, B, n_ch, STRIP_ROWS, 128) VMEM
    scr = refs[n_g + 1]             # (DEPTH, n_ch + 1, OUT_ROWS, 128) VMEM
    sems = refs[n_g + 2]            # (DEPTH, n_ch + 1) DMA semaphores
    B = COMPACT_BATCH
    D = COMPACT_DEPTH

    def m_of(t):
        tc = jnp.minimum(t, nt - 1)
        return jnp.where(t < nt, starts_ref[tc + 1] - starts_ref[tc], 0)

    def dmas(i, slot, tid):
        """Per-CHANNEL copies for group i (see the docstring: separate
        copies beat the strided group DMA; the 2D-slice-of-3D-ref form
        with a static leading index and a 64-row middle dim is safe)."""
        src, g, off = ch_refs[i], group_sizes[i], g_off[i]
        if g == 1:
            return [pltpu.make_async_copy(
                src.at[pl.ds(tid * OUT_ROWS, OUT_ROWS), :],
                scr.at[slot, off], sems.at[slot, off])]
        return [pltpu.make_async_copy(
            src.at[kc, pl.ds(tid * OUT_ROWS, OUT_ROWS), :],
            scr.at[slot, off + kc], sems.at[slot, off + kc])
            for kc in range(g)]

    @pl.when(b == 0)
    def _():
        for t0 in range(D - 1):
            @pl.when((t0 < nt) & (m_of(t0) > 0))
            def _(t0=t0):
                tc = jnp.minimum(t0, nt - 1)
                for i in range(n_g):
                    for cp in dmas(i, t0 % D, tile_ids_ref[tc]):
                        cp.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANES), 1)
    row_ = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANES), 0)
    for j in range(B):
        t = b * B + j
        nxt = jnp.minimum(t + D - 1, nt - 1)

        @pl.when((t + D - 1 < nt) & (m_of(nxt) > 0))
        def _(nxt=nxt, t=t):
            for i in range(n_g):
                for cp in dmas(i, (t + D - 1) % D, tile_ids_ref[nxt]):
                    cp.start()

        @pl.when(m_of(t) > 0)
        def _(t=t, j=j):
            tc = jnp.minimum(t, nt - 1)
            tid = tile_ids_ref[tc]
            buf = t % D
            for i in range(n_g):
                for cp in dmas(i, buf, tid):
                    cp.wait()

            o = starts_ref[tc] % LANES
            cls = cls_ref[tc]

            # class 0: SINGLE flagged slot (the dominant case at the
            # 100-step-warm bench operating point: ~1.4k movers spread
            # Poisson over ~1.8k routing tiles -> ~70% of live tiles hold
            # exactly one).  Extraction degenerates to a masked full
            # reduce per channel — no prefix sums, no butterfly stages;
            # the tile cost drops to its DMA floor.  The output (one
            # element at flat position o, i.e. row 0 lane o) is exactly
            # what the general path produces for m_t == 1, so the choice
            # is invisible downstream.  The class is computed host-side
            # and PREFETCHED (the in-kernel-branch stall lesson, below).
            @pl.when(cls == 0)
            def _(o=o, j=j, buf=buf):
                sel = scr[buf, n_ch, :, :] > 0.5
                lane1 = lane[0:1]
                for i in range(n_ch):
                    v = jnp.sum(jnp.where(sel, scr[buf, i, :, :], 0.0))
                    out_ref[0, j, i, 0:1, :] = jnp.where(
                        lane1 == o, v, 0.0)
                    out_ref[0, j, i, 1:, :] = jnp.zeros(
                        (STRIP_ROWS - 1, LANES), jnp.float32)

            # two-level compact (BASELINE.md stage-compact front): first
            # collapse each lane's flagged elements to its top rows with a
            # 6-stage sublane-axis butterfly, then run the flat network
            # over only the top STAGE_B rows — 10 stages on 1/8 of the
            # tile instead of 13 on all of it.  Tiles where some lane
            # holds > STAGE_B flags (fluid fronts aligned with the grid)
            # fall back to the flat network over the full 64 rows; all
            # branches produce the same (lane-rank, lane) output order,
            # so the choice is invisible downstream.  The tile class is
            # computed host-side and PREFETCHED — an in-kernel
            # jnp.max(counts) branch was measured at +0.4 ms (vector ->
            # scalar stall, the lax.cond lesson again).  The run then
            # lands at its lane offset with one dynamic flat-rotate;
            # elements wrapping past the body belong in the strip's 65th
            # row.
            @pl.when(cls != 0)
            def _(o=o, j=j, buf=buf, cls=cls):
                flag = scr[buf, n_ch, :, :]
                flag = jnp.where(flag > 0.5, 1.0, 0.0)
                fields = [scr[buf, i, :, :] for i in range(n_ch)]
                fields, flag, _ = route.compact_lanes(fields, flag,
                                                      OUT_ROWS)

                @pl.when(cls == 1)
                def _(fields=fields, flag=flag, o=o, j=j):
                    small = [f[:STAGE_B] for f in fields]
                    routed, _ = route.compact_tile(small, flag[:STAGE_B],
                                                   STAGE_B)
                    lane_s = lane[:STAGE_B]
                    for i in range(n_ch):
                        a = pltpu.roll(routed[i], o, axis=1)
                        hi = pltpu.roll(a, 1, axis=0)
                        rot = jnp.where(lane_s < o, hi, a)
                        body = jnp.where((row_[:STAGE_B] == 0)
                                         & (lane_s < o), 0.0, rot)
                        out_ref[0, j, i, :STAGE_B, :] = body
                        # wrap row: the tail of the rotated run spills into
                        # row STAGE_B; rows past it are zero (the run is at
                        # most STAGE_B*128 long + o < 128 offset)
                        out_ref[0, j, i, STAGE_B:STAGE_B + 1, :] = \
                            jnp.where(lane_s < o, a,
                                      0.0)[STAGE_B - 1:STAGE_B, :]
                        out_ref[0, j, i, STAGE_B + 1:, :] = jnp.zeros(
                            (STRIP_ROWS - STAGE_B - 1, LANES), jnp.float32)

                @pl.when(cls == 2)
                def _(fields=fields, flag=flag, o=o, j=j):
                    routed, _ = route.compact_tile(fields, flag, OUT_ROWS)
                    for i in range(n_ch):
                        a = pltpu.roll(routed[i], o, axis=1)
                        hi = pltpu.roll(a, 1, axis=0)
                        rot = jnp.where(lane < o, hi, a)  # flat-rotate +o
                        body = jnp.where((row_ == 0) & (lane < o), 0.0,
                                         rot)
                        out_ref[0, j, i, :OUT_ROWS, :] = body
                        # wrap row at 64; rows 65+ zero (never read)
                        out_ref[0, j, i, OUT_ROWS:OUT_ROWS + 1, :] = \
                            jnp.where(lane < o, rot, 0.0)[0:1, :]
                        out_ref[0, j, i, OUT_ROWS + 1:, :] = jnp.zeros(
                            (STRIP_ROWS - OUT_ROWS - 1, LANES),
                            jnp.float32)


def _compact_kernel2(tile_ids_ref, cls_ref, o_ref, nlive_ref, *refs,
                     group_sizes, nt: int):
    """Pipelined (block-spec) flagged compaction — one COMPACT-ORDER tile
    per program.

    The manual-DMA ring (_compact_kernel) is descriptor-issue-bound at
    real mover densities: 8-10 serial copy issues per live tile cost
    ~2.8 us against ~0.45 us of transfer, ~4.7 ms/step at the evolved
    operating point (every tile live).  Here every channel arrives as a
    Pallas-pipelined input block whose index map reads the prefetched
    compact->slot tile indirection, so fetches double-buffer with no
    scalar-core descriptor work; the grid runs in COMPACT order so the
    dead tail shares one input fetch and one dummy output block (index
    unchanged -> the pipeline skips the copy).  Tile classes
    (0 single-flag, 1 cold two-level, 2 hot full-64, 3 dead) and the
    lane offset of each tile's output run are prefetched as before.
    """
    t = pl.program_id(0)
    n_g = len(group_sizes)
    n_ch = sum(group_sizes) - 1     # last group is the flag channel
    in_refs = refs[:n_g]
    out_ref = refs[n_g]             # (1, n_ch, STRIP_ROWS, 128) VMEM

    def chan(i):
        """Global channel i (0..n_ch-1 data, n_ch = flag) -> (64,128) tile."""
        k = i
        for gi, g in enumerate(group_sizes):
            if k < g:
                r = in_refs[gi]
                return r[:, :] if g == 1 else r[k, :, :]
            k -= g
        raise AssertionError(i)

    cls = cls_ref[t]
    o = o_ref[t]
    lane = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANES), 1)
    row_ = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANES), 0)

    @pl.when(cls == 0)
    def _():
        sel = chan(n_ch) > 0.5
        lane1 = lane[0:1]
        for i in range(n_ch):
            v = jnp.sum(jnp.where(sel, chan(i), 0.0))
            out_ref[0, i, 0:1, :] = jnp.where(lane1 == o, v, 0.0)
            out_ref[0, i, 1:, :] = jnp.zeros((STRIP_ROWS - 1, LANES),
                                             jnp.float32)

    @pl.when((cls == 1) | (cls == 2))
    def _():
        flag = jnp.where(chan(n_ch) > 0.5, 1.0, 0.0)
        fields = [chan(i) for i in range(n_ch)]
        fields, flag, _ = route.compact_lanes(fields, flag, OUT_ROWS)

        @pl.when(cls == 1)
        def _(fields=fields, flag=flag):
            small = [f[:STAGE_B] for f in fields]
            routed, _ = route.compact_tile(small, flag[:STAGE_B], STAGE_B)
            lane_s = lane[:STAGE_B]
            for i in range(n_ch):
                a = pltpu.roll(routed[i], o, axis=1)
                hi = pltpu.roll(a, 1, axis=0)
                rot = jnp.where(lane_s < o, hi, a)
                body = jnp.where((row_[:STAGE_B] == 0) & (lane_s < o),
                                 0.0, rot)
                out_ref[0, i, :STAGE_B, :] = body
                out_ref[0, i, STAGE_B:STAGE_B + 1, :] = \
                    jnp.where(lane_s < o, a, 0.0)[STAGE_B - 1:STAGE_B, :]
                out_ref[0, i, STAGE_B + 1:, :] = jnp.zeros(
                    (STRIP_ROWS - STAGE_B - 1, LANES), jnp.float32)

        @pl.when(cls == 2)
        def _(fields=fields, flag=flag):
            routed, _ = route.compact_tile(fields, flag, OUT_ROWS)
            for i in range(n_ch):
                a = pltpu.roll(routed[i], o, axis=1)
                hi = pltpu.roll(a, 1, axis=0)
                rot = jnp.where(lane < o, hi, a)
                body = jnp.where((row_ == 0) & (lane < o), 0.0, rot)
                out_ref[0, i, :OUT_ROWS, :] = body
                out_ref[0, i, OUT_ROWS:OUT_ROWS + 1, :] = jnp.where(
                    lane < o, rot, 0.0)[0:1, :]
                out_ref[0, i, OUT_ROWS + 1:, :] = jnp.zeros(
                    (STRIP_ROWS - OUT_ROWS - 1, LANES), jnp.float32)


def compact_flagged(channels, flags, max_out: int, use_kernel=None):
    """Extract flagged slots' channel values into compact rows.

    channels: list of f32 arrays — each either a single channel (shape ==
    flags.shape) or a GROUP (leading dim = channel count, rest ==
    flags.shape).  Production callers pass the plane stack as ONE group:
    per-channel stack[i] operands made XLA materialize full-plane slice
    copies (~1.1 ms/step @1.2M, round-5 profiler timeline), while inside
    the kernel a group is still fetched with per-channel copies (the
    strided group DMA measured slower at real mover densities,
    scripts/bench_compact.py round 3).  flags: bool array.  Returns
    (vals (C, max_out), count ()) — slots beyond ``max_out`` are dropped
    (caller counts).  Output order is the deterministic two-level tile
    order: tiles in slot order, and within a tile (lane-rank, lane)-major
    (see STAGE_B) — downstream consumers never rely on slot order.
    """
    groups = [c if c.shape != flags.shape else c[None] for c in channels]
    assert all(g.shape[1:] == flags.shape for g in groups), (
        [g.shape for g in groups], flags.shape)
    channels = [g[i] for g in groups for i in range(g.shape[0])]
    n_ch = len(channels)
    flat_flags = flags.reshape(-1)
    total = flat_flags.shape[0]
    assert total % TILE == 0, total
    nt = total // TILE
    rows_total = total // LANES
    lane_cnt = jnp.sum(flat_flags.reshape(nt, OUT_ROWS, LANES), axis=1,
                       dtype=jnp.int32)                  # (nt, LANES)
    counts = jnp.sum(lane_cnt, axis=1)
    m_total = jnp.sum(counts)

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if not use_kernel:
        # host path: argsort over the kernel's two-level order — per tile,
        # flagged slots come out (lane-rank, lane)-major, NOT slot order
        # (no caller relies on slot order: movers are re-sorted by cell,
        # conversions align by id)
        f3 = flat_flags.reshape(nt, OUT_ROWS, LANES).astype(jnp.int32)
        lane_rank = jnp.cumsum(f3, axis=1) - f3
        tidx = jnp.arange(nt, dtype=jnp.int32)[:, None, None]
        lidx = jnp.arange(LANES, dtype=jnp.int32)[None, None, :]
        key = jnp.where(f3 == 1,
                        tidx * TILE + lane_rank * LANES + lidx,
                        nt * TILE + jnp.arange(total, dtype=jnp.int32)
                        .reshape(nt, OUT_ROWS, LANES)).reshape(-1)
        order = jnp.argsort(key)[:max_out]
        got = jnp.arange(max_out) < m_total
        vals = jnp.stack(
            [jnp.where(got, c.reshape(-1)[order], 0.0) for c in channels])
        return vals, m_total

    nonempty = counts > 0
    n_live = jnp.sum(nonempty.astype(jnp.int32))
    # compact (tile id, start) lists so skipped tiles cost nothing and strip
    # rows are dense in compact order (a stitch over sparse movers would
    # otherwise DMA hundreds of empty strips per output block)
    order = jnp.argsort(~nonempty, stable=True)
    tile_ids = order.astype(jnp.int32)
    # tile class: 0 = single flagged slot (masked-reduce fast path),
    # 1 = cold (two-level STAGE_B compact), 2 = hot (some lane holds
    # > STAGE_B flags — the cheap path would overflow its STAGE_B-row
    # space, so fall back to the full 64-row flat network).  All three
    # produce the same output order.
    hot = jnp.max(lane_cnt, axis=1) > STAGE_B
    cls = jnp.where(hot, 2, jnp.where(counts == 1, 0, 1)).astype(jnp.int32)
    cls_c = cls[order]
    counts_c = jnp.where(jnp.arange(nt) < n_live, counts[order], 0)
    starts_c = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts_c, dtype=jnp.int32)])
    starts_c = jnp.minimum(starts_c, max_out)

    flat_g = [g.reshape(g.shape[0], rows_total, LANES) if g.shape[0] > 1
              else g.reshape(rows_total, LANES) for g in groups]
    flat_g.append(flat_flags.reshape(rows_total, LANES).astype(jnp.float32))
    group_sizes = tuple(g.shape[0] for g in groups) + (1,)
    n_g = len(group_sizes)

    if COMPACT_DENSE:
        # pipelined block-spec kernel (see _compact_kernel2): grid in
        # COMPACT order, inputs indirected through the prefetched
        # compact->slot tile map (dead tail pinned to tile 0 so the
        # pipeline fetches it once), outputs dense in compact order with
        # the dead tail sharing the dummy block nt.
        cls_d = jnp.where(jnp.arange(nt) < n_live, cls_c, 3)
        o_t = starts_c[:nt] % LANES
        tids_in = jnp.where(jnp.arange(nt) < n_live, tile_ids, 0)

        def mk_in(g):
            if g == 1:
                return pl.BlockSpec(
                    (OUT_ROWS, LANES),
                    lambda t, tids, cls, o, nl: (tids[t], 0),
                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(
                (g, OUT_ROWS, LANES),
                lambda t, tids, cls, o, nl: (0, tids[t], 0),
                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nt,),
            in_specs=[mk_in(g) for g in group_sizes],
            out_specs=pl.BlockSpec(
                (1, n_ch, STRIP_ROWS, LANES),
                lambda t, tids, cls, o, nl:
                    (jnp.where(t < nl[0], t, nt), 0, 0, 0),
                memory_space=pltpu.VMEM),
        )
        strips = pl.pallas_call(
            functools.partial(_compact_kernel2, group_sizes=group_sizes,
                              nt=nt),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nt + 1, n_ch, STRIP_ROWS, LANES), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(tids_in, cls_d, o_t, n_live.reshape(1), *flat_g)
    else:
        nb = -(-nt // COMPACT_BATCH)

        def omap(b, tids_ref, starts_ref, cls_ref, nlive_ref):
            # all-empty batches (the compacted tail) share ONE dummy out
            # block: Pallas copies every visited out block back to HBM
            # whether written or not, and at 2.3% mover density many tile
            # programs are empty — ~0.7 ms of garbage copies otherwise
            live_b = -(-nlive_ref[0] // COMPACT_BATCH)
            return (jnp.where(b < live_b, b, nb), 0, 0, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_g,
            out_specs=pl.BlockSpec(
                (1, COMPACT_BATCH, n_ch, STRIP_ROWS, LANES), omap,
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((COMPACT_DEPTH, n_ch + 1, OUT_ROWS, LANES),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((COMPACT_DEPTH, n_ch + 1)),
            ],
        )
        kernel = functools.partial(_compact_kernel, group_sizes=group_sizes,
                                   rows_total=rows_total, nt=nt)
        strips = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nb + 1, COMPACT_BATCH, n_ch, STRIP_ROWS, LANES),
                jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(tile_ids, starts_c, cls_c, n_live.reshape(1), *flat_g)
        # flatten batches back to per-tile strips; the dummy batch rides
        # along at the tail — stitch spans [tfirst, tlast] from starts_c,
        # all < nt, so it never reads it (slicing it off would
        # materialize a copy)
        strips = strips.reshape((nb + 1) * COMPACT_BATCH, n_ch,
                                STRIP_ROWS, LANES)

    n_blocks = max_out // TILE
    p0s = jnp.arange(n_blocks, dtype=jnp.int32) * TILE
    # block b spans compact tiles [tfirst, tlast].  tlast clamps to the
    # last LIVE tile, not nt-1: live tiles are a prefix of the compacted
    # order, and for the block holding the tail of the mover run the
    # unclamped searchsorted saturates past m_total — at sub-percent mover
    # density that made the stitch DMA the ENTIRE (mostly dead) strips
    # array for a few thousand movers (round 3; this was the real
    # stage-compact cost at the 100-step bench operating point, not the
    # per-tile copy chain).
    last_live = jnp.maximum(n_live.astype(jnp.int32), 1) - 1
    tfirst = jnp.minimum(jnp.maximum(
        jnp.searchsorted(starts_c[1:], p0s, side="right"), 0),
        last_live).astype(jnp.int32)
    tlast = jnp.clip(
        jnp.searchsorted(starts_c[1:], p0s + TILE - 1, side="right"),
        0, last_live).astype(jnp.int32)
    tlast = jnp.maximum(tlast, tfirst)
    flat = route.stitch(strips, starts_c, tfirst, tlast, n_blocks, None)
    return flat, jnp.minimum(m_total, max_out)


# ---------------------------------------------------------------------------
# mover re-insertion
# ---------------------------------------------------------------------------

def arrival_planes(movers, m, params: SimParams, geom: PlaneGeom,
                   x_origin=None, live=None):
    """Route the compacted movers into ARRIVAL_K-rank arrival planes.

    movers: (nf, M) compacted mover rows (x,y,z,vx,vy,vz,id[,rho] — nf=7,
    or 8 on the continuity tier); m: live count (or an explicit (M,)
    ``live`` mask — the sharded path merges ICI-received movers into the
    tail, so liveness is not a prefix there).
    Returns (flat-tile stack (nf, nt_a+1, 64, 128) in place's skip-empty
    form — no shift channel, arrival planes are never un-placed, dead
    tiles hold garbage behind the dummy; tile liveness (nt_a,); and the
    count of arrivals dropped for exceeding ARRIVAL_K same-cell arrivals
    or the M capacity).
    """
    nf = movers.shape[0]
    max_out = movers.shape[1]
    cells = geom.cells
    gk = geom._replace(k=ARRIVAL_K)
    nt_a = route.n_tiles(gk)

    def impl(mv, live_mask):
        cap = mv.shape[1]
        jdx = jnp.arange(cap, dtype=jnp.int32)
        pos = jnp.stack([mv[0], mv[1], mv[2]], axis=-1)
        cid = pm.cell_linear_parts(pos, params, geom, x_origin)
        cid = jnp.where(live_mask, cid, cells)
        # sort #1 (movers only): by target cell, all fields carried
        out = jax.lax.sort((cid,) + tuple(mv[i] for i in range(nf)),
                           num_keys=1, is_stable=False)
        cid_s = out[0]
        run_start = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.where(cid_s[1:] != cid_s[:-1], jdx[1:], 0)])
        dup = jdx - jax.lax.cummax(run_start)
        ok = (dup < ARRIVAL_K) & (cid_s < cells)
        dropped = jnp.sum((cid_s < cells) & ~ok).astype(jnp.int32)
        slot = jnp.where(ok, dup * cells + cid_s, ARRIVAL_K * cells)
        # sort #2 (movers only): by rank-major arrival slot -> monotone
        # placement
        out2 = jax.lax.sort((slot,) + out[1:], num_keys=1, is_stable=False)
        slot_s = out2[0]

        rows = route.pad_rows(cap)
        pad_len = rows * LANES - cap

        def pad2d(a, fill):
            return jnp.pad(a, (0, pad_len),
                           constant_values=fill).reshape(rows, LANES)

        fields2d = [pad2d(c, 0.0) for c in out2[1:]]
        slot2d = pad2d(slot_s, ARRIVAL_K * cells + route.LOCAL)
        bases = jnp.arange(nt_a + 1, dtype=jnp.int32) * TILE
        starts = jnp.searchsorted(slot_s, bases).astype(jnp.int32)
        # flat-tile skip-empty form: at ~2% arrival occupancy, filling and
        # copying the full (7, A_K, cells) stack costs ~1.5 ms of pure HBM
        # traffic for ~40k particles of payload; empty tiles now hold
        # garbage behind the dummy block and consolidate gates its reads
        # by ``live``
        stack = route.place(fields2d, slot2d, starts, gk, n_pos=3,
                            with_shift=False, skip_empty=True)
        live_t = (starts[1:] > starts[:-1]).astype(jnp.int32)   # (nt_a,)
        return stack, live_t, dropped

    if live is not None:
        # sharded path: ICI-received movers merge into the tail, so
        # liveness is NOT a prefix — no tier slicing possible
        return impl(movers, live)

    # single-chip path: liveness IS a prefix (compact_flagged output), so
    # when the mover count fits a smaller prefix, run the whole pipeline
    # — including the two 8-operand sorts that dominate this phase — over
    # that prefix only.  At the 100-step-warm bench operating point ~1.4k
    # movers ride in a 155k-row space; the m_cap/8 tier cuts the sort
    # volume 8x.  Output shapes are cap-independent (the arrival stack is
    # sized by the cell space), so the tiers select with lax.cond — one
    # COARSE branch around the phase, not the per-stage cond that
    # measured +6 ms (BASELINE.md negative results).
    tiers = []
    for div in (8, 4, 2):
        # the /4 tier covers the evolved operating point: ~27k movers @1.2M
        # sit just above the /8 tier's cap, and the tier ladder halves the
        # dominant 9-operand sort volume there (round 4)
        cap = -(-max_out // (div * TILE)) * TILE
        if TILE <= cap < max_out and cap not in tiers:
            tiers.append(cap)

    def prefix_fn(cap):
        def f(mv):
            return impl(mv[:, :cap],
                        jnp.arange(cap, dtype=jnp.int32) < m)
        return f

    branch = prefix_fn(max_out)
    for cap in reversed(tiers):
        branch = functools.partial(
            lambda cap, inner, mv: jax.lax.cond(
                m <= cap, prefix_fn(cap), inner, mv),
            cap, branch)
    return branch(movers)


def _consolidate_kernel(tidx_ref, occ_ref, new6_ref, idp_ref, flag_ref,
                        *rest, geom: PlaneGeom, has_rho: bool = False):
    """Per-block rank compaction: kept (K ranks, movers flagged out) +
    arrival (ARRIVAL_K ranks) slots down to K dense ranks, in VMEM with
    static rank indexing.  (The XLA formulation of the same select-sum
    materializes ~96 full-slot-space intermediates and measured 18.1 ms
    @1.47M — HBM-bound on temporaries, not compute; BASELINE.md.)

    Arrival ranks arrive as ARRIVAL_K separate views of the flat-tile
    skip-empty stack; dead (rank, tile) pairs were never written (their
    index maps all point at the dummy tile, fetched once), so every
    arrival read is gated by ``a < occ_ref[spatial tile]``.

    ``has_rho``: the continuity tier's carried-density plane rides as an
    8th per-slot field (input after flag, arrival channel 7, own output).
    """
    k = geom.k
    a_k = ARRIVAL_K
    if has_rho:
        rho_ref, rest = rest[0], rest[1:]
    arrs = rest[:a_k]                      # (nf, 1, 8, 128) views
    if has_rho:
        out6_ref, oid_ref, orho_ref, drop_ref = rest[a_k:a_k + 4]
    else:
        out6_ref, oid_ref, drop_ref = rest[a_k:a_k + 3]
    nf = 8 if has_rho else 7
    if geom.dim == 3:
        bz, bx, byb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    else:
        bz = 0
        bx, byb = pl.program_id(0), pl.program_id(1)
    t_sp = ((bz * geom.n_bx + bx) * (geom.py // route.OUT_ROWS)
            + byb // (route.OUT_ROWS // ROWS_PER_BLOCK))
    occ_a = occ_ref[t_sp]
    shape = (ROWS_PER_BLOCK, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gx = bx * TILE_X + lane - 1
    inter = (lane >= 1) & (lane <= TILE_X) & (gx < geom.nx)
    gy = byb * ROWS_PER_BLOCK + row
    inter &= (gy >= ROWS_PER_BLOCK) & (gy < ROWS_PER_BLOCK + geom.ny)
    if geom.dim == 3:
        inter &= (bz >= 1) & (bz <= geom.nz)

    # validity + exclusive running count per in-rank (kept ranks first, then
    # arrival ranks — same order as the jnp reference's concatenation)
    valids, cnts = [], []
    cnt = jnp.zeros(shape, jnp.int32)
    for r in range(k):
        v = (new6_ref[0, r, 0, 0, :, :] < SENTINEL * 0.5) & inter \
            & (flag_ref[r, 0, 0, :, :] < 0.5)
        valids.append(v)
        cnts.append(cnt)
        cnt = cnt + v.astype(jnp.int32)
    for a in range(a_k):
        v = ((a < occ_a) & (arrs[a][0, 0, :, :] < SENTINEL * 0.5)
             & inter)
        valids.append(v)
        cnts.append(cnt)
        cnt = cnt + v.astype(jnp.int32)
    total = cnt

    def src(f, i):
        if i < k:
            if f < 6:
                return new6_ref[f, i, 0, 0, :, :]
            if f == 6:
                return idp_ref[i, 0, 0, :, :]
            return rho_ref[i, 0, 0, :, :]
        return arrs[i - k][f, 0, :, :]

    for r in range(k):
        sels = [valids[i] & (cnts[i] == r) for i in range(k + a_k)]
        got = total > r
        for f in range(nf):
            acc = jnp.zeros(shape, jnp.float32)
            for i in range(k + a_k):
                acc = acc + jnp.where(sels[i], src(f, i), 0.0)
            fill = SENTINEL if f < 3 else (-1.0 if f == 6 else 0.0)
            val = jnp.where(got, acc, jnp.float32(fill))
            if f < 6:
                out6_ref[f, r, 0, 0, :, :] = val
            elif f == 6:
                oid_ref[r, 0, 0, :, :] = val
            else:
                orho_ref[r, 0, 0, :, :] = val
    drop = jnp.sum(jnp.maximum(total - k, 0).astype(jnp.float32))
    drop_ref[0, :, :] = jnp.where((row == 0) & (lane == 0), drop, 0.0)


def consolidate_jnp(new6, idp, flagp, arrivals, geom: PlaneGeom,
                    rhop=None):
    """jnp reference for _consolidate_kernel (CPU backend / tests)."""
    k = geom.k
    inter = interior_mask(geom)[None]
    valid_k = (new6[0] < SENTINEL * 0.5) & inter & (flagp < 0.5)
    valid_a = (arrivals[0] < SENTINEL * 0.5) & inter
    valid = jnp.concatenate([valid_k, valid_a], axis=0)      # (K+A, ...)
    cnt = jnp.cumsum(valid.astype(jnp.int32), axis=0) - valid
    n_dropped = jnp.sum(valid & (cnt >= k)).astype(jnp.int32)

    def compact(ext, fill):
        out = []
        for r in range(k):
            sel = valid & (cnt == r)
            any_r = jnp.any(sel, axis=0)
            v = jnp.sum(jnp.where(sel, ext, 0.0), axis=0)
            out.append(jnp.where(any_r, v, fill))
        return jnp.stack(out, axis=0)

    fields6 = jnp.stack(
        [compact(jnp.concatenate([new6[f], arrivals[f]], axis=0),
                 SENTINEL if f < 3 else 0.0) for f in range(6)], axis=0)
    idp_o = compact(jnp.concatenate([idp, arrivals[6]], axis=0), -1.0)
    if rhop is not None:
        rho_o = compact(jnp.concatenate([rhop, arrivals[7]], axis=0), 0.0)
        return fields6, idp_o, rho_o, n_dropped
    return fields6, idp_o, n_dropped


def consolidate(new6, idp, flagp, arr_flat, live, geom: PlaneGeom,
                use_kernel=None, rhop=None):
    """Per-cell rank compaction of kept (K ranks; this step's movers and all
    non-interior slots excluded) + arrival (ARRIVAL_K ranks) slots down to K
    dense ranks.  Heals rank gaps left by departures and re-sanitizes the
    force kernel's unwritten ghost blocks / stale halo lanes in the same
    pass.  ``arr_flat`` is arrival_planes' flat-tile skip-empty stack
    (nf, nt_a+1, 64, 128) with ``live`` (nt_a,) tile liveness — dead tiles
    hold garbage and are never fetched (their index maps share the dummy
    tile, which Pallas fetches once).  Returns (fields6, idp, n_dropped),
    or (fields6, idp, rho, n_dropped) when the continuity tier's carried
    density plane ``rhop`` is given (nf = 8, rho = arrival channel 7).
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    k, a_k = geom.k, ARRIVAL_K
    has_rho = rhop is not None
    nf = arr_flat.shape[0]
    assert nf == (8 if has_rho else 7), (nf, has_rho)
    nt_a = arr_flat.shape[1] - 1
    tpr = nt_a // a_k
    if not use_kernel:
        dense = arr_flat[:, :nt_a].reshape(
            nf, a_k, geom.pz, geom.n_bx, geom.py, LANES)
        return consolidate_jnp(new6, idp, flagp, dense, geom, rhop=rhop)

    # prefetch tables: per-(rank, spatial tile) block index (dummy when
    # dead) and per-spatial-tile arrival-rank bound.  Cell-level dup ranks
    # are contiguous, so tile liveness is contiguous in rank and the
    # bound is just the sum.
    live2 = live.reshape(a_k, tpr)
    tidx = jnp.where(live2.astype(bool),
                     jnp.arange(nt_a, dtype=jnp.int32).reshape(a_k, tpr),
                     nt_a).reshape(-1)
    occ_t = jnp.sum(live2, axis=0).astype(jnp.int32)
    sub = route.OUT_ROWS // ROWS_PER_BLOCK

    if geom.dim == 3:
        grid = (geom.pz, geom.n_bx, geom.py // ROWS_PER_BLOCK)

        def sp(bz, bx, byb):
            return ((bz * geom.n_bx + bx) * (geom.py // route.OUT_ROWS)
                    + byb // sub)

        def idx6(bz, bx, byb, *_):
            return (0, 0, bz, bx, byb, 0)

        def idx1(bz, bx, byb, *_):
            return (0, bz, bx, byb, 0)

        def idxd(bz, bx, byb, *_):
            return ((bz * geom.n_bx + bx) * (geom.py // ROWS_PER_BLOCK)
                    + byb, 0, 0)

        def mk_arr(a):
            def f(bz, bx, byb, tidx_ref, occ_ref):
                i = tidx_ref[a * tpr + sp(bz, bx, byb)]
                j = jnp.where(i == nt_a, 0, byb % sub)
                return (0, i, j, 0)
            return f
    else:
        grid = (geom.n_bx, geom.py // ROWS_PER_BLOCK)

        def sp2(bx, byb):
            return bx * (geom.py // route.OUT_ROWS) + byb // sub

        def idx6(bx, byb, *_):
            return (0, 0, 0, bx, byb, 0)

        def idx1(bx, byb, *_):
            return (0, 0, bx, byb, 0)

        def idxd(bx, byb, *_):
            return (bx * (geom.py // ROWS_PER_BLOCK) + byb, 0, 0)

        def mk_arr(a):
            def f(bx, byb, tidx_ref, occ_ref):
                i = tidx_ref[a * tpr + sp2(bx, byb)]
                j = jnp.where(i == nt_a, 0, byb % sub)
                return (0, i, j, 0)
            return f

    n_blocks = geom.pz * geom.n_bx * (geom.py // ROWS_PER_BLOCK)
    blk6 = (6, k, 1, 1, ROWS_PER_BLOCK, LANES)
    blk1 = (k, 1, 1, ROWS_PER_BLOCK, LANES)
    blka = (nf, 1, ROWS_PER_BLOCK, LANES)
    rho_in = [pl.BlockSpec(blk1, idx1, memory_space=pltpu.VMEM)] \
        if has_rho else []
    rho_out_spec = [pl.BlockSpec(blk1, idx1, memory_space=pltpu.VMEM)] \
        if has_rho else []
    rho_out_shape = [jax.ShapeDtypeStruct(idp.shape, jnp.float32)] \
        if has_rho else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk6, idx6, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk1, idx1, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk1, idx1, memory_space=pltpu.VMEM),
        ] + rho_in
        + [pl.BlockSpec(blka, mk_arr(a), memory_space=pltpu.VMEM)
           for a in range(a_k)],
        out_specs=[
            pl.BlockSpec(blk6, idx6, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk1, idx1, memory_space=pltpu.VMEM),
        ] + rho_out_spec + [
            pl.BlockSpec((1, ROWS_PER_BLOCK, LANES), idxd,
                         memory_space=pltpu.VMEM),
        ],
    )
    extra_in = [rhop] if has_rho else []
    outs = pl.pallas_call(
        functools.partial(_consolidate_kernel, geom=geom, has_rho=has_rho),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(new6.shape, jnp.float32),
            jax.ShapeDtypeStruct(idp.shape, jnp.float32),
        ] + rho_out_shape + [
            jax.ShapeDtypeStruct((n_blocks, ROWS_PER_BLOCK, LANES),
                                 jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(tidx, occ_t, new6, idp, flagp, *extra_in, *([arr_flat] * a_k))
    drop = outs[-1]
    n_drop = jnp.sum(drop[:, 0, 0]).astype(jnp.int32)
    if has_rho:
        return outs[0], outs[1], outs[2], n_drop
    return outs[0], outs[1], n_drop


# ---------------------------------------------------------------------------
# API-boundary conversions
# ---------------------------------------------------------------------------

def to_planes(pos, vel, ids, params: SimParams, geom: PlaneGeom,
              x_origin=None, active=None,
              continuity: bool = False) -> IncState:
    """Full rebuild (the build_planes path) producing the carried state.

    ``continuity``: attach the carried-density fields of the continuity
    tier.  rhop starts at zeros with age 0 — the first step's
    age % RESUM_EVERY == 0 re-summation fills it before the EOS ever
    reads it."""
    table = pm.build_planes(pos, vel, ids, params, geom, x_origin=x_origin,
                            with_ids=True, active=active)
    planes = table.planes
    rhop = jnp.zeros_like(planes[6]) if continuity else None
    age = jnp.int32(0) if continuity else None
    return IncState(fields6=planes[:6], idp=planes[6],
                    overflow=table.overflow, mig_overflow=jnp.int32(0),
                    rhop=rhop, age=age)


def to_flat(state: IncState, params: SimParams, geom: PlaneGeom, n: int):
    """Planes -> flat channel rows (x,y,z,vx,vy,vz,id[,rho]), two-level
    tile order (compact_flagged); callers align by id.

    rho is recomputed with one density sweep when diagnostics are on (it is
    not carried across steps).  ``n`` bounds the output capacity (valid
    slots never exceed the particle count).
    """
    valid = (state.fields6[0] < SENTINEL * 0.5) & interior_mask(geom)[None]
    # fields6 rides as ONE grouped operand (slice-copy avoidance, see
    # extract_movers); the kernel's fetches stay per-channel — the
    # strided group DMA measured SLOWER at both mover densities
    # (scripts/bench_compact.py round 3: 3.41 vs 2.33 ms @1e-4 slot
    # density, 6.25 vs 5.50 @1.3e-3).
    channels = [state.fields6, state.idp]
    if params.diagnostics:
        from .pallas_sph import density_planes
        halo6 = pm.halo_x(state.fields6)
        occ_q, occ_s = pm.occupancy_bounds(halo6, params, geom)
        rho_p = density_planes(halo6[:3], occ_q, occ_s, params, geom)
        channels.append(rho_p)
    # every valid slot is "flagged": compaction = full extraction
    return compact_flagged(channels, valid, _round_tile(n))


def to_flat_lite(state: IncState, geom: PlaneGeom, n: int):
    """Positions + id only (4 channels) — the in-scan frame-recording
    extraction for movie rollouts (SURVEY.md §3.3 render-frame stack).
    Same two-level tile order as to_flat; order is set-valued per frame."""
    valid = (state.fields6[0] < SENTINEL * 0.5) & interior_mask(geom)[None]
    channels = [state.fields6[:3], state.idp]
    return compact_flagged(channels, valid, _round_tile(n))


def _round_tile(n: int) -> int:
    return -(-n // TILE) * TILE


# ---------------------------------------------------------------------------
# the incremental step
# ---------------------------------------------------------------------------

def extract_movers(new6, idp, flagp, geom: PlaneGeom, m_cap: int,
                   rhop=None):
    """Pull flagged movers straight out of the unblanked post-step planes.

    new6: (6, K, pz, n_bx, py, 128) post-step pos/vel planes; idp the carried
    id plane; flagp the force kernel's mover-flag plane (ghost blocks
    garbage).  Returns ((7, m_cap) mover rows, live count, flagged total)
    — or (8, m_cap) with the continuity tier's post-step density plane
    ``rhop`` riding as a trailing channel (id stays at index 6: the mover
    liveness encoding of exchange_movers keys on it).
    The only dense work is the 1-channel flag mask + per-tile counts;
    compact_flagged's kernel then touches live tiles only.
    """
    flags = (flagp > 0.5) & interior_mask(geom)[None]
    staged_total = jnp.sum(flags).astype(jnp.int32)
    # new6 rides as ONE grouped operand: per-channel new6[i] operands made
    # XLA materialize six full-plane slice copies (~1.1 ms/step @1.2M —
    # round-5 profiler timeline); the kernel still issues per-channel
    # copies internally (the strided group DMA stays measured-slower)
    channels = [new6, idp]
    if rhop is not None:
        channels.append(rhop)
    movers, m = compact_flagged(channels, flags, m_cap)
    return movers, m, staged_total


def exchange_movers(movers, m, x_origin, width, mig_cap: int, n_dev: int,
                    axis: str):
    """Ship slab-leaving movers to the x-neighbor devices over ICI.

    The mover set IS the migration traffic under spatial sharding: only a
    particle that changed cell can have crossed a slab face, so the
    per-step ICI payload is two fixed (nf, mig_cap) buffers instead of the
    full-path's particle-array repack (parallel/sharded.migrate).  nf = 7,
    or 8 with the continuity tier's rho channel (id stays at index 6).
    Returns (merged (nf, M + 2*mig_cap), live mask, n lost to mig_cap).
    """
    nf = movers.shape[0]
    max_out = movers.shape[1]
    jdx = jnp.arange(max_out, dtype=jnp.int32)
    live = jdx < m
    x = movers[0]
    go_l = live & (x < x_origin)
    go_r = live & (x >= x_origin + width)
    # group: stayers(0) < left(1) < right(2) < dead(3); the multi-operand
    # sort carries all fields (cheaper than argsort + gathers, BASELINE.md)
    key = (go_l.astype(jnp.int32) + 2 * go_r.astype(jnp.int32)
           + jnp.where(live, 0, 3))
    out = jax.lax.sort((key,) + tuple(movers[i] for i in range(nf)),
                       num_keys=1, is_stable=False)
    key_s = out[0]
    rows = jnp.stack(out[1:], axis=0)                    # (nf, M)
    n_stay = jnp.sum(key_s == 0)
    n_l = jnp.sum(key_s == 1)
    n_r = jnp.sum(key_s == 2)
    ar = jnp.arange(mig_cap, dtype=jnp.int32)

    def pack(start, count):
        mask = ar < jnp.minimum(count, mig_cap)
        take = jnp.clip(start + ar, 0, max_out - 1)
        buf = jnp.where(mask[None, :], rows[:, take], 0.0)
        # ship id + 1: ppermute zero-fills devices with no sender (the mesh
        # edges), and a raw 0.0 id would decode as a live phantom particle
        return buf.at[6].set(jnp.where(mask, buf[6] + 1.0, 0.0))

    buf_l = pack(n_stay, n_l)
    buf_r = pack(n_stay + n_l, n_r)
    lost = (jnp.maximum(n_l - mig_cap, 0)
            + jnp.maximum(n_r - mig_cap, 0)).astype(jnp.int32)
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i, i - 1) for i in range(1, n_dev)]
    rb = jax.lax.ppermute(buf_r, axis, fwd)              # from left nbr
    lb = jax.lax.ppermute(buf_l, axis, bwd)              # from right nbr
    arrived = jnp.concatenate([rb, lb], axis=1)          # (7, 2*mig_cap)
    arrived = arrived.at[6].set(arrived[6] - 1.0)        # decode; 0 -> dead
    stay = jdx < n_stay
    rows = rows.at[6].set(jnp.where(stay, rows[6], -1.0))
    merged = jnp.concatenate([rows, arrived], axis=1)
    return merged, merged[6] >= 0.0, lost


def step_planes(state: IncState, params: SimParams, geom: PlaneGeom,
                m_cap: int, x_origin=None, exchange=None,
                wall_params: SimParams = None, n_dev: int = 1,
                mig_cap: int = 0, axis: str = None) -> IncState:
    """One SPH step entirely in plane space (v3: flag-only mover emission).

    halo -> occupancy -> density sweep -> fused force+EOS+integrate+collide
    sweep, whose epilogue detects cell-leaving particles and emits a 0/1
    flag plane (post-step planes stay unblanked) -> extract movers from the
    new planes (compact_flagged: live tiles only) -> sort/route into arrival
    planes -> Pallas consolidate (movers excluded by flag, ghost blocks
    re-sanitized).  History (BASELINE.md): v1's standalone detect/compact
    dense passes measured 44.3 vs 42.1 full-rebuild @1.2M; v2's in-kernel
    flat-1024 staging networks cost ~11 ms of force-sweep epilogue and the
    XLA consolidate 18.1 ms @1.47M.

    Sharded mode (parallel/sharded.py): ``x_origin`` is the device's slab
    binning origin, ``exchange`` the cross-device ghost-lane fill,
    ``wall_params`` the global-domain walls, and slab-leaving movers ride
    ICI to the x neighbors via ``exchange_movers`` (their loss to
    ``mig_cap`` is counted into ``mig_overflow``, separately from the
    physics-capacity ``overflow``).

    Continuity tier (``state.rhop is not None``): the density sweep is
    SKIPPED — the EOS reads the carried rho plane, the force kernel
    emits next step's rho in the same pair loop (pallas_sph continuity;
    SimParams.cont_form: "sum" = exact in-sweep poly6 summation, lag 1,
    seeded once at age 0; "rate" = integrated drho/dt, re-synced every
    RESUM_EVERY steps), and movers carry rho as an 8th channel.  The
    seeding/resum sweep runs under one coarse lax.cond (the arrival-tier
    pattern — per-stage runtime branching measured slower).
    """
    from .pallas_sph import density_planes, accel_planes

    continuity = state.rhop is not None
    planes6 = pm.halo_x(state.fields6)
    if exchange is not None:
        planes6 = exchange(planes6, n_pos_fields=3)
    occ_q, occ_s = pm.occupancy_bounds(planes6, params, geom)
    if continuity:
        if params.cont_form in ("sum", "relax"):
            # these forms re-anchor at the in-sweep summation (fully /
            # geometrically), so drift is structurally bounded; only the
            # very first step needs a seeding sweep
            need = state.age == 0
        else:
            need = (state.age % RESUM_EVERY) == 0
        rho_p = jax.lax.cond(
            need,
            lambda _: density_planes(planes6[:3], occ_q, occ_s, params,
                                     geom),
            lambda _: state.rhop, None)
    else:
        rho_p = density_planes(planes6[:3], occ_q, occ_s, params, geom)
    rho_h = pm.halo_x(rho_p)
    if exchange is not None:
        rho_h = exchange(rho_h[None], n_pos_fields=0)[0]
    slab = None
    if x_origin is not None:
        width = jnp.float32(geom.nx * params.cell)
        x0 = jnp.asarray(x_origin, jnp.float32)
        slab = jnp.stack([x0, x0 + width])
    if continuity:
        new6, rho_new, flagp = accel_planes(
            planes6, rho_h, occ_q, occ_s, params, geom,
            fuse_integrate=True, emit_movers=True,
            wall_params=wall_params, slab=slab, continuity=True)
    else:
        new6, flagp = accel_planes(planes6, rho_h, occ_q, occ_s, params,
                                   geom, fuse_integrate=True,
                                   emit_movers=True,
                                   wall_params=wall_params, slab=slab)
        rho_new = None
    movers, m, staged_total = extract_movers(new6, state.idp, flagp, geom,
                                             m_cap, rhop=rho_new)
    live = None
    lost_ship = jnp.int32(0)
    if n_dev > 1:
        movers, live, lost_ship = exchange_movers(
            movers, m, jnp.asarray(x_origin, jnp.float32), width,
            mig_cap, n_dev, axis)
    arr, live_t, lost_dup = arrival_planes(movers, m, params, geom,
                                           x_origin, live=live)
    cons = consolidate(new6, state.idp, flagp, arr, live_t, geom,
                       rhop=rho_new)
    if continuity:
        fields6, idp, rho_c, lost_rank = cons
        age = state.age + 1
    else:
        fields6, idp, lost_rank = cons
        rho_c, age = None, None
    overflow = state.overflow + (staged_total - m) + lost_dup + lost_rank
    return IncState(fields6=fields6, idp=idp, overflow=overflow,
                    mig_overflow=state.mig_overflow + lost_ship,
                    rhop=rho_c, age=age)


# ---------------------------------------------------------------------------
# flat-state entry points (solver registry / run)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params", "n", "continuity"))
def _inc_convert_in(pos, vel, ids, overflow0, params: SimParams, n: int,
                    continuity: bool = False):
    geom = pm.geometry(params)
    state0 = to_planes(pos, vel, ids, params, geom, continuity=continuity)
    return state0._replace(overflow=state0.overflow + overflow0)


@functools.partial(jax.jit, static_argnames=("params", "n_steps", "n"))
def _inc_scan_chunk(state: IncState, params: SimParams, n_steps: int,
                    n: int) -> IncState:
    geom = pm.geometry(params)
    m_cap = mover_capacity(n)

    def body(s, _):
        return step_planes(s, params, geom, m_cap), None

    return jax.lax.scan(body, state, None, length=n_steps)[0]


@functools.partial(jax.jit, static_argnames=("params", "n"))
def _inc_convert_out(state: IncState, params: SimParams, n: int):
    geom = pm.geometry(params)
    vals, cnt = to_flat(state, params, geom, n)
    return vals, cnt, state.overflow


# Per-program particle-step budget: the axon TPU worker kills device
# programs running longer than ~60-90 s (a 2000-step scan @1M — ~90 s —
# reproducibly dies; 1000 steps — ~45 s — is fine; the chunked run is
# numerically identical).  2e8 particle-steps ≈ 10 s at the measured
# rates, a comfortable margin.  Chunks are chained async dispatches —
# no host sync between them, just separate device programs.
STEP_BUDGET_PER_PROGRAM = int(2e8)


def run_inc(state, params: SimParams, n_steps: int, chunk: int = None,
            continuity: bool = False):
    """models.State -> models.State after n_steps on the incremental path.

    One planes conversion per rollout; the scan is split into multiple
    device programs if it would exceed the worker's program-time budget.
    Slots lost to overflow (counted in ``state.overflow``) leave parked
    rows at the array tail (pos=bounds corner, vel=0, ids=-1).

    ``continuity``: carry density in the planes and skip the per-step
    summation sweep (see step_planes).
    """
    from ..models.state import State

    n = state.n
    if chunk is None:
        chunk = max(64, STEP_BUDGET_PER_PROGRAM // max(n, 1))
    s = _inc_convert_in(state.pos, state.vel, state.ids, state.overflow,
                        params, n, continuity=continuity)
    done = 0
    while done < n_steps:
        # at most two distinct k values per rollout -> two compiles
        k = min(chunk, n_steps - done)
        s = _inc_scan_chunk(s, params, k, n)
        done += k
    vals, cnt, overflow = _inc_convert_out(s, params, n)
    live = jnp.arange(vals.shape[1], dtype=jnp.int32) < cnt
    lo = jnp.asarray(params.bounds_min, jnp.float32)
    dim = params.dim
    pos = jnp.stack([jnp.where(live, vals[d], lo[d])
                     for d in range(dim)], axis=-1)[:n]
    vel = jnp.stack([jnp.where(live, vals[3 + d], 0.0)
                     for d in range(dim)], axis=-1)[:n]
    ids = jnp.where(live, vals[6].astype(jnp.int32), -1)[:n]
    if params.diagnostics:
        rho = jnp.where(live, vals[7], params.rest_density)[:n]
        pres = physics_eos(rho, params)
    else:
        rho = jnp.full((n,), params.rest_density, jnp.float32)
        pres = jnp.zeros((n,), jnp.float32)
    return State(pos=pos, vel=vel, rho=rho, pres=pres, ids=ids,
                 overflow=overflow)


def physics_eos(rho, params):
    from . import physics
    return physics.eos_pressure(
        jnp.maximum(rho, 1e-3 * params.rest_density), params)


@functools.partial(jax.jit, static_argnames=("params", "n_steps",
                                             "record_every", "n"))
def _inc_rollout_chunk(state: IncState, params: SimParams, n_steps: int,
                       record_every: int, n: int):
    geom = pm.geometry(params)
    m_cap = mover_capacity(n)

    def inner(s, _):
        return step_planes(s, params, geom, m_cap), None

    def outer(s, _):
        s = jax.lax.scan(inner, s, None, length=record_every)[0]
        vals, cnt = to_flat_lite(s, geom, n)
        return s, (vals, cnt)

    n_outer = n_steps // record_every
    return jax.lax.scan(outer, state, None, length=n_outer)


def rollout_inc(state, params: SimParams, n_steps: int,
                record_every: int = 1, continuity: bool = False):
    """models.State -> (final State, traj) with in-scan frame recording.

    The planes stay resident across the WHOLE rollout (one conversion per
    call, like run_inc); every ``record_every`` steps the scan emits a
    position frame via ``to_flat_lite`` — a 4-channel flagged compaction,
    NOT the per-step flat<->planes round trip the single-step registry
    facade would pay (VERDICT round 1, weak #3).  traj has shape
    (n_steps//record_every, N, dim); frame order is set-valued (particles
    are plane-ordered; align by the ids channel if needed — the ids ride
    in the recording and dropped rows park at bounds_min with id -1).
    """
    from ..models.state import State

    n = state.n
    n_frames = n_steps // record_every
    chunk_frames = max(1, STEP_BUDGET_PER_PROGRAM
                       // max(n * record_every, 1))
    s = _inc_convert_in(state.pos, state.vel, state.ids, state.overflow,
                        params, n, continuity=continuity)
    lo = jnp.asarray(params.bounds_min, jnp.float32)
    dim = params.dim
    frames = []
    done = 0
    while done < n_frames:
        k = min(chunk_frames, n_frames - done)
        s, (vals, cnts) = _inc_rollout_chunk(s, params, k * record_every,
                                             record_every, n)
        live = (jnp.arange(vals.shape[2], dtype=jnp.int32)[None, :]
                < cnts[:, None])
        f = jnp.stack([jnp.where(live, vals[:, d], lo[d])
                       for d in range(dim)], axis=-1)[:, :n]
        frames.append(f)
        done += k
    # leftover steps that don't fill a whole frame interval
    rem = n_steps - n_frames * record_every
    if rem:
        s = _inc_scan_chunk(s, params, rem, n)
    vals, cnt, overflow = _inc_convert_out(s, params, n)
    livef = jnp.arange(vals.shape[1], dtype=jnp.int32) < cnt
    pos = jnp.stack([jnp.where(livef, vals[d], lo[d])
                     for d in range(dim)], axis=-1)[:n]
    vel = jnp.stack([jnp.where(livef, vals[3 + d], 0.0)
                     for d in range(dim)], axis=-1)[:n]
    ids = jnp.where(livef, vals[6].astype(jnp.int32), -1)[:n]
    if params.diagnostics:
        rho = jnp.where(livef, vals[7], params.rest_density)[:n]
        pres = physics_eos(rho, params)
    else:
        rho = jnp.full((n,), params.rest_density, jnp.float32)
        pres = jnp.zeros((n,), jnp.float32)
    final = State(pos=pos, vel=vel, rho=rho, pres=pres, ids=ids,
                  overflow=overflow)
    traj = (jnp.concatenate(frames, axis=0) if frames
            else jnp.zeros((0, n, dim), jnp.float32))
    return final, traj
