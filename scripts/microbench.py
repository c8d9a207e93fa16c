"""Microbenchmarks for design decisions: sort operand scaling, and Mosaic
support for the strided-lane de-interleave (single-sort binning candidate).

Usage: python scripts/microbench.py [sort|shuffle]
"""

from __future__ import annotations

import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=20):
    f(*args)  # compile+warm
    jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def bench_sort():
    n = 1 << 20
    key = np.random.randint(0, 2_000_000, n).astype(np.int32)
    cols = [np.random.randn(n).astype(np.float32) for _ in range(7)]
    key = jnp.asarray(key)
    cols = [jnp.asarray(c) for c in cols]

    for stable in (True, False):
        for n_ops in (1, 2, 4, 8):
            @functools.partial(jax.jit, static_argnums=())
            def f(key, *cs, _s=stable):
                return jax.lax.sort((key,) + cs, num_keys=1, is_stable=_s)[0]
            args = (key,) + tuple(cols[:n_ops - 1])
            t = timeit(f, *args)
            print(f"sort {n_ops} operands @1M stable={int(stable)}: "
                  f"{t*1e3:6.2f} ms")

    # almost-sorted input (the temporal-coherence case)
    key_s = jnp.sort(key)
    @jax.jit
    def g(key, *cs):
        return jax.lax.sort((key,) + cs, num_keys=1, is_stable=True)[0]
    t = timeit(g, key_s, *cols)
    print(f"sort 8 operands, pre-sorted keys: {t*1e3:6.2f} ms")


def bench_shuffle():
    """De-interleave (64,128) cell-major tile -> 8 rank planes of (8,128).

    out[r][rc, lc] = x[rc*8 + lc//16, (lc%16)*8 + r]
    Tries: (a) jnp strided-slice + reshape inside a Pallas kernel,
           (b) matmul by permutation + minor reshape.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)
    want = np.empty((8, 8, 128), np.float32)
    for r in range(8):
        for rc in range(8):
            for lc in range(128):
                want[r, rc, lc] = x[rc * 8 + lc // 16, (lc % 16) * 8 + r]
    xj = jnp.asarray(x)

    def kern_a(x_ref, o_ref):
        x = x_ref[...]
        for r in range(8):
            # strided lane slice + minor reshape
            sl = jax.lax.slice(x, (0, r), (64, 121 + r), (1, 8))  # (64,16)
            o_ref[r, :, :] = sl.reshape(8, 128)

    def kern_b(x_ref, p_ref, o_ref):
        x = x_ref[...]
        p = p_ref[...]
        b = jax.lax.dot(x, p, precision=jax.lax.Precision.HIGHEST)
        for r in range(8):
            o_ref[r, :, :] = b[:, r * 16:(r + 1) * 16].reshape(8, 128)

    # permutation matrix: P[l, r*16+j] = 1 iff l == j*8+r
    P = np.zeros((128, 128), np.float32)
    for r in range(8):
        for j in range(16):
            P[j * 8 + r, r * 16 + j] = 1.0
    Pj = jnp.asarray(P)

    for name, fn in (
        ("a strided-slice", lambda: pl.pallas_call(
            kern_a,
            out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32),
        )(xj)),
        ("b matmul+reshape", lambda: pl.pallas_call(
            kern_b,
            out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32),
        )(xj, Pj)),
    ):
        try:
            out = np.asarray(jax.jit(fn)())
            ok = np.array_equal(out, want)
            t = timeit(jax.jit(fn))
            print(f"shuffle {name}: correct={ok}  {t*1e6:8.1f} us/tile-call")
        except Exception as e:
            print(f"shuffle {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("sort", "all"):
        bench_sort()
    if which in ("shuffle", "all"):
        bench_shuffle()
