"""SPH smoothing kernels (poly6 / spiky / viscosity), 2D and 3D.

Reference counterpart: the device functions ``poly6W``, ``spikyGradW``,
``viscLapW`` used by the CUDA density/force kernels (SURVEY.md §2;
BASELINE.json north_star: "poly6/spiky density-pressure evaluation,
viscosity + pressure force accumulation").

These are pure jnp functions of (r^2 or r, h); all normalisation constants are
computed from static ``h`` so XLA constant-folds them.  They are shared by the
naive O(N^2) path, the gridded XLA path, the Pallas kernels, and the float64
NumPy oracle (which calls them with NumPy arrays — they are dispatch-agnostic).

Normalisations (unit integral over R^d):
  3D poly6:      315/(64 pi h^9) (h^2-r^2)^3
  2D poly6:        4/(pi h^8)    (h^2-r^2)^3
  3D spiky grad: -45/(pi h^6)    (h-r)^2  rhat
  2D spiky grad: -30/(pi h^5)    (h-r)^2  rhat
  3D visc lap:    45/(pi h^6)    (h-r)
  2D visc lap:    40/(pi h^5)    (h-r)
(The viscosity kernel is defined by its Laplacian, per Muller et al. 2003.)
"""

from __future__ import annotations

import math


def poly6_coef(h: float, dim: int) -> float:
    if dim == 3:
        return 315.0 / (64.0 * math.pi * h**9)
    return 4.0 / (math.pi * h**8)


def spiky_grad_coef(h: float, dim: int) -> float:
    if dim == 3:
        return -45.0 / (math.pi * h**6)
    return -30.0 / (math.pi * h**5)


def visc_lap_coef(h: float, dim: int) -> float:
    if dim == 3:
        return 45.0 / (math.pi * h**6)
    return 40.0 / (math.pi * h**5)


def poly6(r2, h: float, dim: int):
    """W_poly6 evaluated from squared distance (avoids a sqrt in the hot loop).

    Returns 0 outside the support r >= h.
    """
    import jax.numpy as jnp

    h2 = h * h
    d = jnp.maximum(h2 - r2, 0.0)
    return poly6_coef(h, dim) * d * d * d


def spiky_grad_mag(r, h: float, dim: int):
    """Magnitude factor g(r) such that grad W_spiky = g(r) * (x_i - x_j) / r.

    Negative (points from j toward i gives repulsion under positive pressure).
    Returns 0 outside the support.
    """
    import jax.numpy as jnp

    d = jnp.maximum(h - r, 0.0)
    return spiky_grad_coef(h, dim) * d * d


def visc_lap(r, h: float, dim: int):
    """Laplacian of the viscosity kernel; 0 outside the support."""
    import jax.numpy as jnp

    return visc_lap_coef(h, dim) * jnp.maximum(h - r, 0.0)
