"""Slope-timed in-situ verdict for the MXU-first packed-pair force sweep
(ops/mxu_sweep.py) — VERDICT r4 #1: "a minimum honest prototype of the
force sweep (one config, @1.2M evolved) designed around MXU matmuls from
scratch ... with a slope-timed in-situ number, adopted or recorded as the
final measured negative".

Warms the production flow to the evolved operating point, then slope-times
  * the packed-pair sweep, both reduction variants (mxu dot_general /
    vpu deferred-elementwise), spb 4 and 8, and the mxu variant at
    DEFAULT matmul precision (the upper bound of what bf16-pass MXU
    reduction could buy if its precision were acceptable);
  * the production rank-planar force sweep (accel_planes, unfused) on the
    SAME state — the apples-to-apples baseline;
and accounts the padding: evaluated dense pairs vs range-covered
candidates vs the exact 27-cell candidate-pair ideal (the same
denominator as BASELINE.md's 17.6x rank-planar figure, computed exactly
here from the cid histogram).  Host table-build cost is timed separately
(all its primitives — sort, searchsorted, interval clipping — are XLA ops
the production binning path already amortizes).

Usage: python scripts/proto_mxu.py [N] [warm]   (default 1.2M, 2000)
Writes docs/proto_mxu.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    import jax
    import jax.numpy as jnp
    import numpy as np
    from gpufluidsimulator_tpu import scenes
    from gpufluidsimulator_tpu.models import solver
    from gpufluidsimulator_tpu.ops import grid, inc, mxu_sweep, pallas_sph
    from gpufluidsimulator_tpu.ops import planes as pm
    from gpufluidsimulator_tpu.utils.profiling import slope_time

    params, state = scenes.double_dam_break(n=n, dim=3)
    geom = pm.geometry(params)
    cachef = f"/tmp/proto_mxu_state_{n}_{warm}.npz"
    if os.path.exists(cachef):
        z = np.load(cachef)
        state = state._replace(
            pos=jnp.asarray(z["pos"]), vel=jnp.asarray(z["vel"]),
            rho=jnp.asarray(z["rho"]), pres=jnp.asarray(z["pres"]),
            ids=jnp.asarray(z["ids"]))
    else:
        state = solver.run(state, params, min(warm, 100), method="pallas")
        if warm > 100:
            state = solver.run(state, params, warm - 100,
                               method="pallas_inc")
        jax.block_until_ready(state.pos)
        np.savez(cachef, pos=np.asarray(state.pos),
                 vel=np.asarray(state.vel), rho=np.asarray(state.rho),
                 pres=np.asarray(state.pres), ids=np.asarray(state.ids))
    nn = state.pos.shape[0]
    print(f"evolved: n={nn} warm={warm}", flush=True)

    # ---- pack + descriptor (host build timed) ----------------------------
    f, ft, cids, order = mxu_sweep.pack(state.pos, state.vel, state.rho,
                                        state.pres, params)
    f, ft = jax.block_until_ready((f, ft))
    cids_np = np.asarray(cids)
    t0 = time.time()
    desc, mx = mxu_sweep.build_desc(cids_np, f.shape[0], params)
    t_build = time.time() - t0

    stats = mxu_sweep.table_stats(cids_np, f.shape[0], params)
    # exact 27-cell candidate-pair ideal from the cid histogram
    counts = np.bincount(cids_np, minlength=grid.num_padded_cells(params))
    st = grid.strides(params)
    offs = np.array([dx + dy * st[1] + dz * st[2]
                     for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                     for dx in (-1, 0, 1)])
    cand_ideal = int(sum(counts[cids_np + o].sum() for o in offs))
    stats["candidate_pair_ideal"] = cand_ideal
    stats["pad_eval_vs_ideal"] = stats["eval_pairs"] / cand_ideal
    stats["pad_covered_vs_ideal"] = stats["covered_pairs"] / cand_ideal
    stats["table_build_host_s"] = t_build
    print(json.dumps(stats), flush=True)

    # ---- sweep variants --------------------------------------------------
    results = {}

    desc_d = jax.device_put(jnp.asarray(desc))

    def time_sweep(tag, spb, variant, precision, skip_dead=True):
        def step(s):
            f_, ft_ = s
            out = mxu_sweep.sweep_packed(f_, ft_, desc_d, mx, params,
                                         spb=spb, variant=variant,
                                         precision=precision,
                                         skip_dead=skip_dead)
            return (f_, ft_ + 1e-30 * out)

        sec = slope_time(step, (f, ft))
        results[tag] = sec * 1e3
        print(f"{tag}: {sec*1e3:.3f} ms", flush=True)

    hi = jax.lax.Precision.HIGHEST
    df = jax.lax.Precision.DEFAULT
    time_sweep("vpu_spb4", 4, "vpu", hi)
    time_sweep("vpu_spb8", 8, "vpu", hi)
    time_sweep("vpu_spb4_noskip", 4, "vpu", hi, skip_dead=False)
    time_sweep("mxu_spb4", 4, "mxu", hi)
    time_sweep("mxu_spb4_defaultprec", 4, "mxu", df)

    # ---- baseline: production rank-planar force sweep, same state --------
    s0 = inc.to_planes(state.pos, state.vel, state.ids, params, geom)
    p6 = pm.halo_x(s0.fields6)
    occ_q, occ_s = pm.occupancy_bounds(p6, params, geom)
    rhop = pallas_sph.density_planes(p6[:3], occ_q, occ_s, params, geom)
    p6, rhop = jax.block_until_ready((p6, rhop))

    def base_step(s):
        p6_, rhop_ = s
        acc = pallas_sph.accel_planes(p6_, rhop_, occ_q, occ_s, params,
                                      geom)
        return (p6_ + 1e-30 * jnp.concatenate([acc, acc], 0), rhop_)

    sec = slope_time(base_step, (p6, rhop))
    results["rank_planar_accel_planes"] = sec * 1e3
    print(f"rank_planar_accel_planes: {sec*1e3:.3f} ms", flush=True)

    out = {"n": nn, "warm": warm, "stats": stats, "ms": results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "proto_mxu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
