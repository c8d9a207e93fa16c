"""Naive O(N^2) SPH density/pressure and force evaluation (config 1).

Reference counterpart: the CPU reference path ``updateCPU`` — "naive O(N^2)
neighbors, CPU/NumPy reference path" (BASELINE.json configs[0]; SURVEY.md §3.4).
Here it is a *device* path too: fully vectorised pairwise jnp, jittable, used
both as the config-1 solver at small N and as the correctness anchor for the
gridded and Pallas paths.

Physics (symmetric/momentum-conserving WCSPH form of the Muller-2003 /
NVIDIA-particles lineage, SURVEY.md §2):
  rho_i = m sum_j W_poly6(|x_ij|)                     (includes j = i)
  p_i   = EOS(rho_i)
  a_i   = sum_{j!=i} [ -m (p_i/rho_i^2 + p_j/rho_j^2) gradW_spiky(x_ij)
                       + mu m (v_j-v_i)/(rho_i rho_j) lapW_visc(|x_ij|) ] + g
The symmetric form makes pairwise momentum exchange exactly antisymmetric
(conservation is tested in tests/test_invariants.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.params import SimParams
from . import kernels, physics


def density_naive(pos, params: SimParams):
    """(N, d) positions -> (N,) density via all-pairs poly6."""
    diff = pos[:, None, :] - pos[None, :, :]          # (N, N, d)
    r2 = jnp.sum(diff * diff, axis=-1)                # (N, N)
    w = kernels.poly6(r2, params.h, params.dim)
    return params.particle_mass * jnp.sum(w, axis=1)


def accel_naive(pos, vel, rho, pres, params: SimParams):
    """All-pairs pressure-gradient + viscosity acceleration (plus gravity)."""
    m = params.particle_mass
    diff = pos[:, None, :] - pos[None, :, :]          # x_i - x_j
    r2 = jnp.sum(diff * diff, axis=-1)
    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    valid = (r2 < params.h * params.h) & (r2 > 1e-16)  # exclude self / overlap

    p_over_rho2 = pres / (rho * rho)                  # (N,)
    # pressure:  -m (p_i/rho_i^2 + p_j/rho_j^2) * g(r) * (x_i - x_j) / r
    g = kernels.spiky_grad_mag(r, params.h, params.dim)
    coef_p = jnp.where(valid, -m * (p_over_rho2[:, None]
                                    + p_over_rho2[None, :]) * g / r, 0.0)
    a_pres = jnp.sum(coef_p[..., None] * diff, axis=1)

    # viscosity:  mu m (v_j - v_i) / (rho_i rho_j) * lap(r)
    lap = kernels.visc_lap(r, params.h, params.dim)
    inv_rho = 1.0 / rho
    coef_v = jnp.where(
        valid,
        params.viscosity * m * inv_rho[:, None] * inv_rho[None, :] * lap, 0.0)
    dvel = vel[None, :, :] - vel[:, None, :]          # v_j - v_i
    a_visc = jnp.sum(coef_v[..., None] * dvel, axis=1)

    grav = jnp.asarray(params.gravity, pos.dtype)
    return a_pres + a_visc + grav


def step_naive(pos, vel, params: SimParams):
    """One full O(N^2) SPH step: density -> pressure -> forces -> integrate."""
    rho = density_naive(pos, params)
    pres = physics.eos_pressure(rho, params)
    acc = accel_naive(pos, vel, rho, pres, params)
    pos, vel = physics.integrate(pos, vel, acc, params)
    return pos, vel, rho, pres
