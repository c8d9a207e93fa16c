"""Thin-sort binning candidate: 2-operand sorts + 1D permutation gathers.

MEASURED NEGATIVE (2026-08-17, @1.2M on v5e): 7 plain 1D permutation gathers
cost ~8.1 ms alone (~10-23 ns/element, confirming the route.py numbers; XLA
1D gather on this chip is element-at-a-time, not bandwidth-bound), which
exceeds the whole payload-carry cost of the two fat sorts.  The "thin 2.29 ms"
reading that motivated a production attempt was a measurement artifact:
slope_time used to pull only the FIRST carry leaf, and XLA's while-loop DCE
deleted the payload gather chain entirely (in the fat variant the payloads
are operands of the same sort instruction that produces the live key, so
they cannot be DCE'd — that asymmetry faked a 5x win).  slope_time now pulls
one element of every leaf.  Keep the fat multi-operand sorts.

In-situ confirmation: a production build_planes with thin sorts + 7 gathers
measured 134.6 ms/step @1.2M vs 42.1 ms for the fat-sort pipeline (the
strided pos[:, j][perm] gather forms are even slower than the microbenched
contiguous ones).  Reverted same day.

Usage: python scripts/bench_binning2.py [N] [dim]
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
from gpufluidsimulator_tpu.ops import planes as pm
from gpufluidsimulator_tpu.utils.profiling import slope_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    params, state = scenes.double_dam_break(n=n, dim=dim)
    geom = pm.geometry(params)
    pos, vel, ids = state.pos, state.vel, state.ids
    cid0 = pm.cell_linear_parts(pos, params, geom)
    print(f"N={state.n} cells={geom.cells} k={geom.k}", flush=True)

    d = params.dim
    cols = tuple(pos[:, j] for j in range(d)) \
        + tuple(vel[:, j] for j in range(d)) + (ids,)
    nn = state.n
    idx = jnp.arange(nn, dtype=jnp.int32)

    def churn(k):
        return (k * 1664525 + 1013904223) % jnp.int32(geom.cells)

    def rank_slot(cid_sorted):
        run_start = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.where(cid_sorted[1:] != cid_sorted[:-1], idx[1:], 0)])
        rank = idx - jax.lax.cummax(run_start)
        ok1 = (rank < geom.k) & (cid_sorted < geom.cells)
        return jnp.where(ok1, rank * geom.cells + cid_sorted,
                         geom.k * geom.cells)

    # --- variant 1: current production shape (fat sorts) -------------------
    def fat(s):
        out = jax.lax.sort((s[0],) + s[1:], num_keys=1, is_stable=False)
        slot1 = rank_slot(out[0])
        out2 = jax.lax.sort((slot1,) + out[1:], num_keys=1, is_stable=False)
        return (churn(out2[0] % jnp.int32(geom.cells)),) + out2[1:]

    # --- variant 2: thin sorts + 7 gathers ---------------------------------
    def thin(s):
        cid = s[0]
        cid_s, perm1 = jax.lax.sort((cid, idx), num_keys=1, is_stable=False)
        slot1 = rank_slot(cid_s)
        slot, perm = jax.lax.sort((slot1, perm1), num_keys=1,
                                  is_stable=False)
        outs = tuple(c[perm] for c in s[1:])
        return (churn(slot % jnp.int32(geom.cells)),) + outs

    # --- pieces, for attribution -------------------------------------------
    def sort_2op(s):
        cid_s, perm1 = jax.lax.sort((s[0], idx), num_keys=1, is_stable=False)
        return (churn(cid_s + perm1),) + s[1:]

    # gathers alone: apply a fixed realistic permutation (the actual binning
    # permutation of the scene) to the 7 fields
    cid_s0, perm10 = jax.lax.sort((cid0, idx), num_keys=1, is_stable=False)
    slot10 = rank_slot(cid_s0)
    _, perm0 = jax.lax.sort((slot10, perm10), num_keys=1, is_stable=False)
    perm0 = jax.device_put(perm0)

    def gathers7(s):
        outs = tuple(c[perm0] for c in s[1:])
        # fold outputs into the carried key so nothing is DCE'd
        k = s[0] + outs[-1]
        return (churn(k),) + outs

    s0 = (cid0,) + cols
    for name, f in [
        ("fat 2x8-op sorts (prod)", fat),
        ("thin 2x2-op sorts + 7 gathers", thin),
        ("single 2-op sort", sort_2op),
        ("7 1D permutation gathers", gathers7),
    ]:
        t = slope_time(f, s0, k1=2, k2=10, reps=3)
        print(f"{name:32s}: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
