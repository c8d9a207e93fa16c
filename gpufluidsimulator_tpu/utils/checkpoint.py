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
        for key in ("gravity", "bounds_min", "bounds_max",
                    "cell_aniso"):
            meta[key] = tuple(meta.get(key, ()))
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


def _params_meta(params: SimParams) -> np.ndarray:
    return np.frombuffer(json.dumps(dataclasses.asdict(params)).encode(),
                         dtype=np.uint8)


def _params_from_meta(buf) -> SimParams:
    meta = json.loads(bytes(buf).decode())
    for key in ("gravity", "bounds_min", "bounds_max", "cell_aniso"):
        meta[key] = tuple(meta.get(key, ()))
    meta["obstacles"] = tuple(
        (o[0], tuple(o[1]), o[2] if isinstance(o[2], (int, float))
         else tuple(o[2])) for o in meta["obstacles"])
    return SimParams(**meta)


def save_sharded(path: str, sstate, params: SimParams, step: int = 0,
                 n_total: int = 0) -> None:
    """Snapshot a parallel.sharded.ShardedState WITHOUT a gather round-trip.

    The per-device slabs are written as the stacked (n_dev, N_cap, ...)
    arrays (np.asarray pulls each device's shard straight off the mesh —
    no id-sort, no repack), so a 4M-particle config-5 run checkpoints at
    HBM->host copy cost only.  Resume with load_sharded(path, mesh) on a
    mesh of the same device count.
    """
    np.savez_compressed(
        path,
        kind=np.asarray(1, np.int64),
        pos=np.asarray(sstate.pos), vel=np.asarray(sstate.vel),
        rho=np.asarray(sstate.rho), pres=np.asarray(sstate.pres),
        ids=np.asarray(sstate.ids),
        overflow=np.asarray(sstate.overflow),
        mig_overflow=np.asarray(sstate.mig_overflow),
        n_total=np.asarray(n_total, np.int64),
        step=np.asarray(step, np.int64),
        params_json=_params_meta(params))


def load_sharded(path: str, mesh):
    """Load (ShardedState, params, step, n_total) back onto a mesh.

    The mesh must have the same device count the checkpoint was written
    with (slabs are per-device state)."""
    import jax
    import jax.numpy as jnp
    from ..parallel.mesh import shard_leading
    from ..parallel.sharded import ShardedState

    with np.load(path) as z:
        params = _params_from_meta(z["params_json"])
        n_dev = z["pos"].shape[0]
        if mesh.devices.size != n_dev:
            raise ValueError(
                f"checkpoint has {n_dev} device slabs but mesh has "
                f"{mesh.devices.size} devices")
        sh = shard_leading(mesh)
        put = lambda a: jax.device_put(jnp.asarray(a), sh)
        sstate = ShardedState(
            pos=put(z["pos"]), vel=put(z["vel"]), rho=put(z["rho"]),
            pres=put(z["pres"]), ids=put(z["ids"]),
            overflow=put(z["overflow"]),
            mig_overflow=put(z["mig_overflow"]))
        return sstate, params, int(z["step"]), int(z["n_total"])


def save_planes(path: str, inc_state, params: SimParams,
                step: int = 0, n: int = 0) -> None:
    """Snapshot an ops.inc.IncState (the planes-resident carried state)
    directly — no planes->flat conversion, so long incremental rollouts can
    checkpoint mid-flight and resume bitwise (the flat round trip is
    id-order-preserving but costs two compactions + a rebuild).  The
    continuity tier's carried density/age (IncState.rhop/.age) ride along
    when present."""
    extra = {}
    if inc_state.rhop is not None:
        extra = dict(rhop=np.asarray(inc_state.rhop),
                     age=np.asarray(inc_state.age))
    np.savez_compressed(
        path,
        kind=np.asarray(2, np.int64),
        fields6=np.asarray(inc_state.fields6),
        idp=np.asarray(inc_state.idp),
        overflow=np.asarray(inc_state.overflow),
        mig_overflow=np.asarray(inc_state.mig_overflow),
        n=np.asarray(n, np.int64),
        step=np.asarray(step, np.int64),
        params_json=_params_meta(params), **extra)


def load_planes(path: str):
    """Load (IncState, params, step, n) from a planes checkpoint."""
    import jax.numpy as jnp
    from ..ops.inc import IncState

    with np.load(path) as z:
        params = _params_from_meta(z["params_json"])
        # mig_overflow absent in pre-round-3 checkpoints: default 0
        mig = (jnp.asarray(z["mig_overflow"]) if "mig_overflow" in z
               else jnp.int32(0))
        state = IncState(fields6=jnp.asarray(z["fields6"]),
                         idp=jnp.asarray(z["idp"]),
                         overflow=jnp.asarray(z["overflow"]),
                         mig_overflow=mig,
                         rhop=(jnp.asarray(z["rhop"]) if "rhop" in z
                               else None),
                         age=(jnp.asarray(z["age"]) if "age" in z
                              else None))
        return state, params, int(z["step"]), int(z["n"])


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
