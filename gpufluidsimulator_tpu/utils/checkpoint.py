"""Checkpoint / resume.

Reference counterpart: none — the reference is a stateless demo (SURVEY.md
§5.4); the rebuild adds simple `.npz` snapshots because the state pytree is
just a handful of arrays.  Resume = load + continue the scan; this also
powers long-run trajectory-comparison tests.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import numpy as np

from ..models.params import SimParams
from ..models.state import State, make_state


def save(path: str, state: State, params: SimParams,
         step: int = 0) -> None:
    """Write state + params (+ step counter) to one .npz file."""
    meta = dataclasses.asdict(params)
    np.savez_compressed(
        path,
        pos=np.asarray(state.pos), vel=np.asarray(state.vel),
        rho=np.asarray(state.rho), pres=np.asarray(state.pres),
        ids=np.asarray(state.ids),
        overflow=np.asarray(state.overflow),
        step=np.asarray(step, np.int64),
        params_json=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8),
    )


def load(path: str) -> Tuple[State, SimParams, int]:
    """Load (state, params, step) from an .npz checkpoint."""
    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(bytes(z["params_json"]).decode())
        for key in ("gravity", "bounds_min", "bounds_max"):
            meta[key] = tuple(meta[key])
        meta["obstacles"] = tuple(
            (o[0], tuple(o[1]), o[2] if isinstance(o[2], (int, float))
             else tuple(o[2])) for o in meta["obstacles"])
        params = SimParams(**meta)
        state = State(
            pos=jnp.asarray(z["pos"]), vel=jnp.asarray(z["vel"]),
            rho=jnp.asarray(z["rho"]), pres=jnp.asarray(z["pres"]),
            ids=jnp.asarray(z["ids"]),
            overflow=jnp.asarray(z["overflow"]))
        return state, params, int(z["step"])


def rotate(directory: str, state: State, params: SimParams, step: int,
           keep: int = 3) -> str:
    """Write a step-stamped checkpoint and prune old ones (keep newest N)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step:09d}.npz")
    save(path, state, params, step)
    ckpts = sorted(f for f in os.listdir(directory)
                   if f.startswith("ckpt_") and f.endswith(".npz"))
    for old in ckpts[:-keep]:
        os.remove(os.path.join(directory, old))
    return path


def latest(directory: str):
    """Path of the newest checkpoint in a directory, or None."""
    if not os.path.isdir(directory):
        return None
    ckpts = sorted(f for f in os.listdir(directory)
                   if f.startswith("ckpt_") and f.endswith(".npz"))
    return os.path.join(directory, ckpts[-1]) if ckpts else None
