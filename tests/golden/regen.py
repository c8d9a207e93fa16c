"""Regenerate the committed golden frames (run from the repo root, CPU
backend — conftest's platform pin does not apply here, so force it):

    JAX_PLATFORMS=cpu python tests/golden/regen.py

Only regenerate when the physics or renderer changed INTENTIONALLY; commit
the .png (for humans) and .sha256 (what the tests assert) together.
"""

import hashlib
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))

import jax

jax.config.update("jax_platforms", "cpu")

from gpufluidsimulator_tpu import run, scenes            # noqa: E402
from gpufluidsimulator_tpu.ops import render             # noqa: E402

# name -> (scene fn, kwargs, steps, render kwargs)
GOLDENS = {
    "dam_break_2d_400": (scenes.dam_break, dict(n=1500, dim=2), 400, {}),
    "dam_break_3d_120": (scenes.dam_break, dict(n=1200, dim=3), 120,
                         dict(azimuth=30.0, elevation=20.0)),
    "double_dam_obstacles_2d_200": (scenes.double_dam_break,
                                    dict(n=1200, dim=2), 200, {}),
}


def main():
    for name, (fn, kw, steps, rkw) in GOLDENS.items():
        params, state = fn(**kw)
        st = run(state, params, steps, method="naive")
        img = render.tonemap(render.render_frame(st, params, width=256,
                                                 height=256, **rkw))
        sha = hashlib.sha256(img.tobytes()).hexdigest()
        render.write_png(os.path.join(_HERE, f"{name}.png"), img)
        with open(os.path.join(_HERE, f"{name}.sha256"), "w") as f:
            f.write(sha + "\n")
        print(f"{name}: {sha}")


if __name__ == "__main__":
    main()
