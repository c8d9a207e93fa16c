"""Fast on-chip validation: pallas & pallas_inc vs the naive XLA path.

Small scenes so compiles stay quick; run after kernel changes before paying
for the full interpret-mode test tier.  Exits nonzero on mismatch.

Usage: python scripts/validate_tpu.py [steps]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpufluidsimulator_tpu.utils.cache import enable as _enable_cache
_enable_cache()

import numpy as np

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.models import solver


def check(dim, n, steps, method="pallas"):
    params, state = scenes.dam_break(n=n, dim=dim, jitter=0.15, seed=3)
    ref = solver.run(state, params, steps, method="naive")
    got = solver.run(state, params, steps, method=method)
    ro = np.argsort(np.asarray(ref.ids))
    go = np.argsort(np.asarray(got.ids))
    rp = np.asarray(ref.pos)[ro]
    gp = np.asarray(got.pos)[go]
    err = np.abs(gp - rp).max() / max(np.abs(rp).max(), 1e-9)
    ok = err < 2e-4 and int(got.overflow) == 0
    print(f"{method:11s} dim={dim} n={n} steps={steps}: rel_err={err:.2e} "
          f"overflow={int(got.overflow)} {'OK' if ok else 'FAIL'}",
          flush=True)
    return ok


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ok = True
    for dim, n in ((2, 2048), (3, 4096)):
        ok &= check(dim, n, steps, "pallas")
        ok &= check(dim, n, steps, "pallas_inc")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
