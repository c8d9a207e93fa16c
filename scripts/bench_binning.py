"""Dissect the binning phase @N: sort #1, rank scan, sort #2, place inputs.

The profile_step "sorts+rank" phase was 13.2 ms @1.2M while generic 8-operand
sorts microbench at ~2.5-2.8 ms — this isolates where the rest goes, on real
scene data (rest-lattice dam break; cid distribution close enough to the
evolved flow for the data-independent sort network and the scans).

Usage: python scripts/bench_binning.py [N] [dim]
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
from scripts.bench_scan import hillis_2d


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

    def churn(k):
        # permute the key cheaply between iterations (stays in range)
        return (k * 1664525 + 1013904223) % jnp.int32(geom.cells)

    def mk_sort1(stable):
        def f(s):
            out = jax.lax.sort((s[0],) + s[1:], num_keys=1, is_stable=stable)
            return (churn(out[0]),) + out[1:]
        return f

    def rank_of(cid_sorted, nn, scan):
        idx = jnp.arange(nn, dtype=jnp.int32)
        run_start = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.where(cid_sorted[1:] != cid_sorted[:-1], idx[1:], 0)])
        if scan == "assoc":
            pref = jax.lax.associative_scan(jnp.maximum, run_start)
        elif scan == "cummax":
            pref = jax.lax.cummax(run_start)
        else:
            pref = hillis_2d(run_start, nn)
        return idx - pref

    def mk_scan(scan):
        def f(s):
            cid = s[0]
            rank = rank_of(cid, cid.shape[0], scan)
            return (churn(cid + (rank > geom.k)),) + s[1:]
        return f

    def mk_sort2(stable):
        """sort1 -> rank -> sort2, minus a separately-measured prefix."""
        def f(s):
            out = jax.lax.sort((s[0],) + s[1:], num_keys=1, is_stable=stable)
            cid_sorted = out[0]
            rank = rank_of(cid_sorted, cid_sorted.shape[0], "assoc")
            in_dom = cid_sorted < geom.cells
            ok1 = (rank < geom.k) & in_dom
            slot1 = jnp.where(ok1, rank * geom.cells + cid_sorted,
                              geom.k * geom.cells)
            out2 = jax.lax.sort((slot1,) + out[1:], num_keys=1,
                                is_stable=stable)
            return (churn(out2[0] % jnp.int32(geom.cells)),) + out2[1:]
        return f

    s0 = (cid0,) + cols
    for name, f in [
        ("sort1 stable", mk_sort1(True)),
        ("sort1 unstable", mk_sort1(False)),
        ("rank scan assoc", mk_scan("assoc")),
        ("rank scan cummax", mk_scan("cummax")),
        ("rank scan 2level", mk_scan("2level")),
        ("sort1+scan+sort2 stable", mk_sort2(True)),
        ("sort1+scan+sort2 unstable", mk_sort2(False)),
    ]:
        t = slope_time(f, s0, k1=2, k2=10, reps=3)
        print(f"{name:28s}: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
