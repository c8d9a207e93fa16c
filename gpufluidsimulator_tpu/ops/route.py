"""Monotone butterfly routing: sorted particles -> rank planes without
scatters (and, inversely, per-particle values out of planes without gathers).

Motivation (measured, BASELINE.md): XLA scatter costs ~5.7ns/update and
gather 10-23ns/element on this chip — the 6 plane scatters + 3 accel gathers
were ~64ms of the 99ms step @1M.  But after sorting particles by their
destination slot (rank-major: slot = rank*cells + cell), placement is a
MONOTONE EXPANSION: targets are strictly increasing, so shifts
s_i = target_i - i are non-negative and non-decreasing.  A classic
distribution network routes any monotone expansion CONFLICT-FREE with
MSB-first butterfly stages:

    for b = hi..0:  elements with bit b of remaining shift set move +2^b

(proof: after bits hi..b, position p_i = i + 2^b*floor(s_i/2^b); for i < j,
p_j - p_i >= j - i > 0 — positions stay distinct at every stage).  Each
stage is a vector roll + selects, so a tile of 8192 slots routes in 14
stages of pure VPU work in VMEM — ~50x cheaper than element-at-a-time
scatter.  The inverse network (LSB-first, moving left by the same bits)
un-places values for the extraction path (ops/route_extract).

Tiles are 8192 consecutive rank-major slots = one rank x 64 y-rows x 128
lanes, which is exactly 8 sweep-kernel blocks, so the placement kernel's
output blocks coincide with the sweep kernels' input blocks.  Prototype
validated in NumPy over 300 randomized trials (forward + inverse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import SimParams
from . import planes as pm
from .planes import LANES, PlaneGeom

TILE = 8192                 # slots per routing tile (64 sublane-rows x 128)
LOCAL = 16384               # local routing space (128 rows x 128 lanes)
ROWS = LOCAL // LANES       # 128
OUT_ROWS = TILE // LANES    # 64
PAD_ROWS = OUT_ROWS + 1     # 65 DMA rows cover any 8192-particle window
N_BITS = 14                 # shifts < LOCAL
SPACE_ROWS = OUT_ROWS + 8   # 72-row routing space for the tile kernels:
# every target is < 128 + 8192 = 8320 <= 65 rows (place: slot + one lift
# row; extract/compact: lane offset o < 128 plus an 8192 run), so 72 rows
# (sublane-aligned) hold any route.  The networks are compute-bound and
# every butterfly-stage op scales with the space, so 72 instead of the
# generic 128-row LOCAL is a ~1.8x kernel-cost cut (BASELINE.md).
STRIP_ROWS = SPACE_ROWS     # 72: rows per tile STRIP (extract/compact
# kernel outputs consumed by stitch).  Strips logically need only 65
# rows (a lane offset o < 128 plus an 8192-slot run = 8320 flat
# positions), but 65 is not a sublane multiple, so (.., 65, 128) arrays
# carry T(8,128) layout padding and the flat (rows, 128) view the stitch
# DMAs require forced XLA to materialize a RELAYOUT COPY of the whole
# strips buffer — 1.53 ms/step @1.2M evolved (round-5 profiler timeline,
# reshape.583; invisible to prefix-difference phase attribution).  At 72
# rows the flatten is a free bitcast; rows 65-71 are never read by the
# stitch (its window masks cap flat reads at 8320) and cost ~10% more
# strip DMA volume, ~0.1 ms — net ~-1.4 ms/step.
STITCH_W = 4                # strip tiles per stitch DMA descriptor: spans
# are consecutive tile indices, so one contiguous copy covers w tiles'
# 9-channel strips (~1.2 MB) — per-tile trips measured DMA-latency-bound
# at ~2 us against ~0.45 us of transfer (see _stitch_kernel).


def n_tiles(geom: PlaneGeom) -> int:
    assert geom.cells % TILE == 0, geom
    return geom.k * geom.cells // TILE


def pad_rows(n: int) -> int:
    """Rows of the padded (rows, 128) particle views the kernels DMA from."""
    return -(-(n + LOCAL) // LANES)


def _flat_pos(rows: int = ROWS):
    return (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))


def _flat_roll(x, d: int):
    """Roll a (rows, 128) tile by +d in flattened row-major order."""
    q, s = divmod(d, LANES)
    if s == 0:
        return pltpu.roll(x, q % x.shape[0], axis=0)
    a = pltpu.roll(x, s, axis=1)
    hi = pltpu.roll(a, q + 1, axis=0)
    lo = pltpu.roll(a, q, axis=0) if q else a
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < s, hi, lo)


def route_fwd(fields, shift, flag, rows: int = ROWS):
    """MSB-first monotone expansion in (rows, 128) local flat space.

    fields: list of f32 tiles; shift: i32 remaining shift; flag: f32 0/1.
    Returns (routed fields, routed flag).  (Runtime per-stage skipping via
    lax.cond was measured SLOWER than running all 14 stages — the scalar-core
    branch stalls the vector pipeline; see BASELINE.md optimization notes.)
    ``rows`` need not be a power of two; stage count covers the largest
    shift expressible in the space (every stage op scales with rows, so the
    72-row kernels run ~1.8x cheaper than the generic 128).
    """
    local = rows * LANES
    n_bits = (local - 1).bit_length()
    pos = _flat_pos(rows)
    for b in range(n_bits - 1, -1, -1):
        d = 1 << b
        move = (flag > 0.5) & (((shift >> b) & 1) == 1)
        movef = move.astype(jnp.float32)
        arrive = (_flat_roll(movef, d) > 0.5) & (pos >= d)
        fields = [jnp.where(arrive, _flat_roll(x, d),
                            jnp.where(move, 0.0, x)) for x in fields]
        shift = jnp.where(arrive, _flat_roll(shift, d) - d,
                          jnp.where(move, 0, shift))
        flag = jnp.where(arrive, 1.0, jnp.where(move, 0.0, flag))
    return fields, flag


def _placement_kernel(starts_ref, *refs, geom: PlaneGeom, n_fields: int,
                      n_pos: int, with_shift: bool = True,
                      flat_out: bool = False):
    """One routing tile: DMA the slot-sorted particle slice, butterfly-route
    it onto its slots, write the plane block (+ shift channel unless
    ``with_shift=False`` — stacks that are never un-placed, like the
    incremental path's arrival planes, skip it and save one routed channel
    plus 1/(F+1) of the stack's HBM traffic).  ``flat_out``: the
    skip-empty flat-tile layout (see place) — empty tiles write nothing
    (they share the dummy block)."""
    t = pl.program_id(0)
    start = starts_ref[t]
    m = starts_ref[t + 1] - start
    row0 = start // LANES
    o = start - row0 * LANES                          # in [0, 128)

    f_refs = refs[:n_fields]                          # (rows,128) f32 each
    slot_ref = refs[n_fields]                         # (rows,128) i32
    out_ref = refs[n_fields + 1]                      # (F+1,1,1,1,64,128)
    fscr = refs[n_fields + 2]                         # (F, ROWS, 128) f32
    sscr = refs[n_fields + 3]                         # (ROWS, 128) i32
    sems = refs[n_fields + 4]                         # DMA sems (F+1,)

    def write(i, val):
        if flat_out:
            out_ref[i, 0, :, :] = val
        else:
            out_ref[i, 0, 0, 0, :, :] = val

    @pl.when(m == 0)
    def _():
        # empty tile (most of the rank-plane space is): sentinel/zero fill,
        # no DMA, no routing — measured ~5% off the whole step @1M.  In
        # flat_out mode empty tiles all map to the dummy block: skip even
        # the fill, the consumer gates reads by tile liveness.
        if not flat_out:
            for i in range(n_fields):
                fill = pm.SENTINEL if i < n_pos else 0.0
                write(i, jnp.full((OUT_ROWS, LANES), fill, jnp.float32))
            if with_shift:
                write(n_fields, jnp.full((OUT_ROWS, LANES), -1.0,
                                         jnp.float32))

    @pl.when(m != 0)
    def _():
        def dma(i):
            if i < n_fields:
                return pltpu.make_async_copy(
                    f_refs[i].at[pl.ds(row0, PAD_ROWS), :],
                    fscr.at[i, pl.ds(0, PAD_ROWS), :], sems.at[i])
            return pltpu.make_async_copy(
                slot_ref.at[pl.ds(row0, PAD_ROWS), :],
                sscr.at[pl.ds(0, PAD_ROWS), :], sems.at[n_fields])

        for i in range(n_fields + 1):
            dma(i).start()
        for i in range(n_fields + 1):
            dma(i).wait()

        pos = _flat_pos(SPACE_ROWS)
        valid = (pos >= o) & (pos < o + m)
        tile_base = t * TILE
        # local target = (slot - tile_base) + 128; shift = target - position
        target = sscr[...] - tile_base + LANES
        shift = jnp.where(valid, target - pos, 0)
        flag = valid.astype(jnp.float32)

        fields = [fscr[i] for i in range(n_fields)]
        if with_shift:
            fields = fields + [pos.astype(jnp.float32)]
        routed, flag_r = route_fwd(fields, shift, flag, rows=SPACE_ROWS)
        filled = flag_r > 0.5
        for i in range(n_fields):
            fill = pm.SENTINEL if i < n_pos else 0.0
            val = jnp.where(filled, routed[i], fill)
            write(i, val[1:1 + OUT_ROWS, :])
        if with_shift:
            # shift channel: routed - original position; -1 where empty
            total_shift = jnp.where(
                filled, pos.astype(jnp.float32) - routed[n_fields], -1.0)
            write(n_fields, total_shift[1:1 + OUT_ROWS, :])


def tile_index_map(geom: PlaneGeom, lead_zeros: int = 1):
    """Routing-tile t -> plane block index (k, z, xo, y64)."""
    tpr = geom.cells // TILE
    y64 = geom.py // 64

    def imap(t, *_):
        k = t // tpr
        r = t % tpr
        zxo = r // y64
        y = r % y64
        z = zxo // geom.n_bx
        xo = zxo % geom.n_bx
        return (0,) * lead_zeros + (k, z, xo, y, 0)

    return imap


def place(fields_sorted, slot_sorted, starts, geom: PlaneGeom,
          n_pos: int = pm.N_POS_FIELDS, use_kernel=None,
          with_shift: bool = True, skip_empty: bool = False):
    """Route slot-sorted particles into rank-major planes.

    fields_sorted: F arrays (rows, 128) f32 (slot-sorted particle fields,
    padded; see pad_rows); slot_sorted: (rows, 128) int32 rank-major slot per
    particle (>= K*cells for dropped/inactive); starts: (n_tiles+1,) int32
    particle offsets per tile.  Returns an (F+1, K, pz, n_bx, py, 128) stack:
    F field planes + the routing-shift channel consumed by the inverse
    (omitted, giving an (F, ...) stack, when ``with_shift=False``).

    ``skip_empty``: return the FLAT-TILE form (F, n_tiles+1, 64, 128)
    instead (tile t = plane rows of (k, z, xo, y64) row-major), where empty
    tiles are neither filled nor copied — they all map to the trailing
    dummy tile and hold GARBAGE.  The consumer must gate every read by
    tile liveness (starts[t+1] > starts[t]); the incremental path's
    arrival stack does this via consolidate's occupancy bounds, turning
    the sentinel-fill of a ~2%-occupied stack from full-stack HBM
    traffic into live-tiles-only.
    """
    nf = len(fields_sorted)
    n_out = nf + 1 if with_shift else nf
    nt = n_tiles(geom)
    if skip_empty:
        def omap(t, starts_ref):
            live = starts_ref[t + 1] > starts_ref[t]
            return (0, jnp.where(live, t, nt), 0, 0)

        out_spec = pl.BlockSpec((n_out, 1, OUT_ROWS, LANES), omap,
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (n_out, nt + 1, OUT_ROWS, LANES), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (n_out, 1, 1, 1, OUT_ROWS, LANES), tile_index_map(geom),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (n_out, geom.k, geom.pz, geom.n_bx, geom.py, LANES),
            jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (nf + 1),
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((nf, SPACE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((SPACE_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((nf + 1,)),
        ],
    )
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if not use_kernel:
        out = _place_jnp(fields_sorted, slot_sorted, starts, geom, n_pos)
        out = out if with_shift else out[:nf]
        if skip_empty:
            # host form of the flat-tile layout (fully filled — fine, the
            # dummy-tile garbage contract is a kernel-path optimization)
            flat = out.reshape(n_out, nt, OUT_ROWS, LANES)
            return jnp.concatenate(
                [flat, jnp.zeros((n_out, 1, OUT_ROWS, LANES), flat.dtype)],
                axis=1)
        return out
    kernel = functools.partial(_placement_kernel, geom=geom, n_fields=nf,
                               n_pos=n_pos, with_shift=with_shift,
                               flat_out=skip_empty)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(starts, *fields_sorted, slot_sorted)


# ---------------------------------------------------------------------------
# inverse: planes -> per-particle values (replaces XLA gathers)
# ---------------------------------------------------------------------------

def route_bwd(fields, shift, flag, rows: int = ROWS):
    """Inverse of route_fwd: LSB-first, moving left by the set bits of the
    TOTAL shift (which stays attached to its element throughout)."""
    local = rows * LANES
    n_bits = (local - 1).bit_length()
    pos = _flat_pos(rows)
    for b in range(n_bits):
        d = 1 << b
        move = (flag > 0.5) & (((shift >> b) & 1) == 1)
        movef = move.astype(jnp.float32)
        back = local - d
        arrive = (_flat_roll(movef, back) > 0.5) & (pos < local - d)
        fields = [jnp.where(arrive, _flat_roll(x, back),
                            jnp.where(move, 0.0, x)) for x in fields]
        shift = jnp.where(arrive, _flat_roll(shift, back),
                          jnp.where(move, 0, shift))
        flag = jnp.where(arrive, 1.0, jnp.where(move, 0.0, flag))
    return fields, flag


def compact_tile(fields, flag, rows: int, offset=0):
    """Compact flagged elements of (rows, 128) tiles to the front, in flat
    row-major order, entirely in registers (for use INSIDE kernels on small
    spaces — the force kernel's mover staging uses rows=8).

    The LSB-first inverse network (route_bwd) tolerates gaps between flagged
    elements, so this is plain extraction: the element with exclusive
    flag-rank r lands at flat position ``offset + r`` (offset a runtime
    scalar in [0, 128); with offset > 0 the caller must lift its data past
    row 0 so every shift stays non-negative).  ``rows`` need not be a power
    of two — the roll space is cyclic over rows*128 and the stage count
    covers the largest possible shift.  Returns (routed fields, arrived
    flag as f32 0/1).
    """
    local = rows * LANES
    n_bits = (local - 1).bit_length()
    pos = _flat_pos(rows)
    flagi = flag.astype(jnp.int32)
    s = flagi
    d = 1
    while d < local:                       # inclusive prefix sum of flags
        s = s + jnp.where(pos >= d, _flat_roll(s, d), 0)
        d *= 2
    rank = s - flagi                       # exclusive rank = target position
    shift = jnp.where(flagi == 1, pos - rank - offset, 0)
    flagf = flagi.astype(jnp.float32)
    for b in range(n_bits):
        d = 1 << b
        move = (flagf > 0.5) & (((shift >> b) & 1) == 1)
        movef = move.astype(jnp.float32)
        back = local - d
        arrive = (_flat_roll(movef, back) > 0.5) & (pos < local - d)
        fields = [jnp.where(arrive, _flat_roll(x, back),
                            jnp.where(move, 0.0, x)) for x in fields]
        shift = jnp.where(arrive, _flat_roll(shift, back),
                          jnp.where(move, 0, shift))
        flagf = jnp.where(arrive, 1.0, jnp.where(move, 0.0, flagf))
    return fields, flagf


def compact_lanes(fields, flag, rows: int):
    """Compact each LANE's flagged elements toward row 0 (sublane axis).

    Level 1 of the two-level stage compaction: 128 independent per-lane
    butterflies run in lockstep as whole-tile ops with sublane-axis rolls
    only — log2(rows) stages instead of the flat space's log2(rows*128),
    after which every flagged element sits in rows [0, lane_count) of its
    own lane and the flat compaction (compact_tile) only has to touch the
    top ``B = max lane_count`` rows.  Per-lane shifts are monotone
    non-decreasing down a lane (shift_j - shift_i = (r_j - r_i) -
    (#flagged in (i, j]) >= 0), so the LSB-first inverse network is
    conflict-free exactly as in route_bwd.

    Returns (routed fields, routed flag, inclusive per-lane flag counts as
    the (1, 128) bottom prefix row — computed pre-route, so it is the
    per-lane total).
    """
    assert rows & (rows - 1) == 0, rows
    n_bits = rows.bit_length() - 1
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    flagi = flag.astype(jnp.int32)
    s = flagi
    d = 1
    while d < rows:                        # per-lane inclusive prefix sum
        s = s + jnp.where(row >= d, pltpu.roll(s, d, axis=0), 0)
        d *= 2
    counts = s[rows - 1:rows, :]
    shift = jnp.where(flagi == 1, row - (s - flagi), 0)
    flagf = flagi.astype(jnp.float32)
    for b in range(n_bits):
        d = 1 << b
        move = (flagf > 0.5) & (((shift >> b) & 1) == 1)
        movef = move.astype(jnp.float32)
        back = rows - d
        arrive = ((pltpu.roll(movef, back, axis=0) > 0.5)
                  & (row < rows - d))
        fields = [jnp.where(arrive, pltpu.roll(x, back, axis=0),
                            jnp.where(move, 0.0, x)) for x in fields]
        shift = jnp.where(arrive, pltpu.roll(shift, back, axis=0),
                          jnp.where(move, 0, shift))
        flagf = jnp.where(arrive, 1.0, jnp.where(move, 0.0, flagf))
    return fields, flagf, counts


def _extract_kernel(starts_ref, vals_ref, shifts_ref, out_ref,
                    *, n_ch: int):
    """Un-place one routing tile: values at slots -> the tile's slot-sorted
    particle run, landed at local positions [o, o+m)."""
    t = pl.program_id(0)
    m = starts_ref[t + 1] - starts_ref[t]

    @pl.when(m == 0)
    def _():
        # tile owns no particles; stitch never reads its strip, but keep the
        # output defined (the block is copied back from VMEM regardless)
        out_ref[0, :, :, :] = jnp.zeros((n_ch, STRIP_ROWS, LANES),
                                        jnp.float32)

    @pl.when(m != 0)
    def _():
        zero_row = jnp.zeros((1, LANES), jnp.float32)
        pad = SPACE_ROWS - 1 - OUT_ROWS

        sh = shifts_ref[0, 0, 0, :, :]                # (64, 128) f32
        shift = jnp.concatenate(
            [jnp.zeros((1, LANES), jnp.float32), sh,
             jnp.zeros((pad, LANES), jnp.float32)],
            axis=0).astype(jnp.int32)
        flag = jnp.concatenate(
            [jnp.zeros((1, LANES), jnp.float32),
             (sh >= 0).astype(jnp.float32),
             jnp.zeros((pad, LANES), jnp.float32)], axis=0)

        fields = []
        for c in range(n_ch):
            v = vals_ref[c, 0, 0, 0, :, :]
            fields.append(jnp.concatenate(
                [zero_row, v, jnp.zeros((pad, LANES), jnp.float32)], axis=0))

        routed, flag_b = route_bwd(fields, jnp.maximum(shift, 0), flag,
                                   rows=SPACE_ROWS)
        for c in range(n_ch):
            # rows 65-71 carry routing-space leftovers; the stitch never
            # reads past flat position 8320 (row 64), so they ride along
            out_ref[0, c, :, :] = routed[c][:STRIP_ROWS, :]


def extract(value_stack, shifts, geom: PlaneGeom, starts=None):
    """(C, K, pz, n_bx, py, 128) slot values + routing shifts ->
    (n_tiles, C, STRIP_ROWS, 128) per-tile slot-sorted particle runs, where
    tile t's run occupies flat positions [start_t % 128, start_t % 128 + m_t).

    ``starts`` (n_tiles+1,): per-tile particle offsets — empty tiles skip the
    inverse network entirely."""
    n_ch = value_stack.shape[0]
    nt = n_tiles(geom)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((n_ch, 1, 1, 1, OUT_ROWS, LANES),
                         tile_index_map(geom), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, OUT_ROWS, LANES),
                         tile_index_map(geom, lead_zeros=0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_ch, STRIP_ROWS, LANES),
            lambda t, *_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_extract_kernel, n_ch=n_ch)
    if starts is None:
        # no skip info: treat every tile as populated
        starts = jnp.arange(nt + 1, dtype=jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, n_ch, STRIP_ROWS, LANES),
                                       jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(starts, value_stack, shifts)


def _stitch_kernel(starts_ref, tfirst_ref, tlast_ref, strips_ref, out_ref,
                   scr, sem, *, n_ch: int, nt: int, w: int):
    """Assemble one 8192-particle output block from its spanning tile runs.

    Double-buffered at ``w``-tile granularity: ONE contiguous DMA covers
    all channels of ``w`` consecutive span tiles (the strips layout keeps
    a tile's channels adjacent, and spans are consecutive tile indices),
    and batch c+1's copy is issued before batch c is processed.  Per-TILE
    double buffering measured DMA-LATENCY-bound at ~2 us/trip against
    ~0.15 us of roll/select compute and ~0.45 us of transfer
    (scripts/bench_compact.py: the stitch was ~3.5 ms of the 7.5 ms
    compact_flagged total @3000 live tiles); batching trips w-fold is the
    fix.  The batch base clamps to nt - w, so end-of-span batches may
    re-visit tiles an earlier batch already processed — harmless, the
    accumulate is a select (jmask), not an add.  Non-contributing tiles
    need no branch: their jmask is all-false, so the select is a no-op.
    """
    b = pl.program_id(0)
    p0 = b * TILE
    t0 = tfirst_ref[b]
    # dynamic trip count: exactly the tile batches this block's particles
    # span (sparse high ranks can span many mostly-empty tiles)
    span = tlast_ref[b] - t0 + 1
    nw = (span + w - 1) // w
    accs = [jnp.zeros((OUT_ROWS, LANES), jnp.float32) for _ in range(n_ch)]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, LANES), 1))

    def base_of(c):
        return jnp.clip(t0 + c * w, 0, nt - w)

    def dma(c, buf):
        # strips_ref is 2D (nt*n_ch*STRIP_ROWS, 128): DMAs of slices whose
        # last two dims are (rows, 128) are the only reliably supported
        # form (a 4D source with a non-8-multiple middle dim faults the
        # TPU; STRIP_ROWS=72 also makes the caller's flatten a free
        # bitcast — see the constant's comment)
        return pltpu.make_async_copy(
            strips_ref.at[pl.ds(base_of(c) * (n_ch * STRIP_ROWS),
                                w * n_ch * STRIP_ROWS), :],
            scr.at[buf], sem.at[buf])

    dma(0, 0).start()

    def body(c, accs):
        buf = c % 2

        @pl.when(c + 1 < nw)
        def _():
            dma(c + 1, (c + 1) % 2).start()

        dma(c, buf).wait()
        tw = base_of(c)
        for wsub in range(w):
            t = tw + wsub                       # <= nt - 1
            s_t = starts_ref[t]
            e_t = starts_ref[t + 1]
            o_t = s_t % LANES
            # out flat j corresponds to strip flat (j + off); j + off <=
            # o_t + m_t - 1 < 8320, so the 72-row cyclic space never wraps
            # a live read
            off = o_t + (p0 - s_t)
            rot = (-off) % (SPACE_ROWS * LANES)
            lane_rot = rot % LANES
            row_rot = rot // LANES
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (SPACE_ROWS, LANES), 1)
            jmask = (pos >= jnp.maximum(s_t - p0, 0)) & (pos < e_t - p0)
            new = []
            for ch in range(n_ch):
                r0 = (wsub * n_ch + ch) * STRIP_ROWS
                x = scr[buf, r0:r0 + STRIP_ROWS, :]   # == SPACE_ROWS rows
                a = pltpu.roll(x, lane_rot, axis=1)
                hi = pltpu.roll(a, row_rot + 1, axis=0)
                lo = pltpu.roll(a, row_rot, axis=0)
                rotated = jnp.where(lane < lane_rot, hi, lo)[:OUT_ROWS, :]
                new.append(jnp.where(jmask, rotated, accs[ch]))
            accs = new
        return accs

    accs = jax.lax.fori_loop(0, nw, body, accs)
    for ch in range(n_ch):
        out_ref[ch, 0, :, :] = accs[ch]


def stitch(strips, starts, tfirst, tlast, n_blocks: int, geom: PlaneGeom):
    """(nt, C, STRIP_ROWS, 128) tile runs -> (C, n_blocks*64, 128) compact
    slot-sorted particle values.

    ``strips`` may carry MORE tiles than ``starts`` describes (the
    compact_flagged path pads a dummy batch, and tfirst can equal the real
    tile count for all-empty blocks), and the kernel's w-tile batching
    visits up to w-1 tiles past tlast — so ``starts`` is padded here to
    cover every visitable tile, repeating its last entry.  Padded tiles
    get s_t == e_t, which makes their jmask all-false (pure no-op selects);
    without the padding the kernel reads garbage SMEM past the prefetch
    array and can select dummy-tile strip data into the output (advisor
    round-2 high finding).
    """
    nt_, n_ch = strips.shape[0], strips.shape[1]
    assert strips.shape[2] == STRIP_ROWS, strips.shape
    w = STITCH_W if nt_ >= STITCH_W else 1
    # kernel reads starts_ref[t + 1] for t <= nt_ - 1 -> needs nt_ + 1 entries
    pad = nt_ + 1 - starts.shape[0]
    if pad > 0:
        starts = jnp.concatenate(
            [starts, jnp.broadcast_to(starts[-1:], (pad,))])
    # free bitcast: STRIP_ROWS is a sublane multiple (see the constant)
    strips = strips.reshape(nt_ * n_ch * STRIP_ROWS, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (n_ch, 1, OUT_ROWS, LANES), lambda b, *_: (0, 0, b, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w * n_ch * STRIP_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_stitch_kernel, n_ch=n_ch, nt=nt_, w=w)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ch, n_blocks, OUT_ROWS, LANES),
                                       jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(starts, tfirst, tlast, strips)
    return out.reshape(n_ch, n_blocks * TILE)


def extract_per_particle(value_stack, shifts, slot, starts,
                         geom: PlaneGeom, use_kernel=None):
    """Planes -> per-particle values in slot-sorted order, via the inverse
    network + ragged stitch (dynamic tile spans; sparse high ranks just loop
    over more, mostly-skipped, tiles).  Returns (N, C)."""
    n = slot.shape[0]
    n_ch = value_stack.shape[0]
    n_blocks = -(-n // TILE)

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if not use_kernel:
        # CPU backend: the XLA gather is fine on host; the kernels are pinned
        # by tests/test_route.py in interpret mode
        flat = value_stack.reshape(n_ch, -1)
        idx = jnp.minimum(slot, flat.shape[1] - 1)
        return jnp.stack([flat[c][idx] for c in range(n_ch)], axis=-1)

    tile_of = jnp.minimum(slot // TILE, n_tiles(geom) - 1)
    p0s = jnp.arange(n_blocks, dtype=jnp.int32) * TILE
    tfirst = tile_of[jnp.minimum(p0s, n - 1)]
    tlast = tile_of[jnp.minimum(p0s + TILE - 1, n - 1)]

    strips = extract(value_stack, shifts, geom, starts=starts)
    flat = stitch(strips, starts, tfirst, tlast, n_blocks, geom)
    return flat[:, :n].T


# ---------------------------------------------------------------------------
# batched-jnp reference implementations (CPU backend)
# ---------------------------------------------------------------------------
# The Pallas kernels interpret slowly on the CPU backend; these are the same
# routing networks as vectorized jnp over all tiles at once (they'd be
# HBM-bound on TPU — 14 stages x full slot space — but are fine on host).
# tests/test_route.py pins kernel-vs-jnp equivalence in interpret mode.

def _window_gather(flat, starts, fill):
    nt = starts.shape[0] - 1
    row0 = starts[:-1] // LANES
    idx = row0[:, None] * LANES + jnp.arange(PAD_ROWS * LANES)[None, :]
    w = flat[jnp.minimum(idx, flat.shape[0] - 1)]
    pad = jnp.full((nt, LOCAL - PAD_ROWS * LANES), fill, w.dtype)
    return jnp.concatenate([w, pad], axis=1)          # (nt, LOCAL)


def _route_fwd_jnp(fields, shift, flag):
    pos = jnp.arange(LOCAL)[None, :]
    for b in range(N_BITS - 1, -1, -1):
        d = 1 << b
        move = (flag > 0.5) & (((shift >> b) & 1) == 1)
        arrive = jnp.roll(move, d, axis=1) & (pos >= d)
        fields = [jnp.where(arrive, jnp.roll(x, d, axis=1),
                            jnp.where(move, 0.0, x)) for x in fields]
        shift = jnp.where(arrive, jnp.roll(shift, d, axis=1) - d,
                          jnp.where(move, 0, shift))
        flag = jnp.where(arrive, 1.0, jnp.where(move, 0.0, flag))
    return fields, flag


def _place_jnp(fields_sorted, slot_sorted, starts, geom: PlaneGeom,
               n_pos: int):
    nf = len(fields_sorted)
    nt = n_tiles(geom)
    o = starts[:-1] % LANES
    m = starts[1:] - starts[:-1]
    pos = jnp.arange(LOCAL)[None, :]
    valid = (pos >= o[:, None]) & (pos < (o + m)[:, None])

    slot_w = _window_gather(slot_sorted.reshape(-1), starts, 0)
    tile_base = jnp.arange(nt, dtype=jnp.int32)[:, None] * TILE
    target = slot_w - tile_base + LANES
    shift = jnp.where(valid, target - pos, 0)
    flag = valid.astype(jnp.float32)

    fields = [_window_gather(f.reshape(-1), starts, 0.0)
              for f in fields_sorted]
    posf = jnp.broadcast_to(pos.astype(jnp.float32), (nt, LOCAL))
    routed, flag_r = _route_fwd_jnp(fields + [posf], shift, flag)
    filled = flag_r > 0.5

    shape = (geom.k, geom.pz, geom.n_bx, geom.py, LANES)
    outs = []
    for i in range(nf):
        fill = pm.SENTINEL if i < n_pos else 0.0
        v = jnp.where(filled, routed[i], fill)[:, LANES:LANES + TILE]
        outs.append(v.reshape(shape))
    tot = jnp.where(filled, pos.astype(jnp.float32) - routed[nf], -1.0)
    outs.append(tot[:, LANES:LANES + TILE].reshape(shape))
    return jnp.stack(outs, axis=0)
