"""Unit tests for SPH smoothing kernels (SURVEY.md §4.1).

Checks: unit normalisation by quadrature, support compactness, gradient
antisymmetry, and agreement between the jnp kernels and the float64 oracle
constants.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpufluidsimulator_tpu.ops import kernels
from gpufluidsimulator_tpu.oracle import numpy_ref

H = 0.1


@pytest.mark.parametrize("dim", [2, 3])
def test_poly6_normalization(dim):
    """Integral of W over R^d must be 1 (radial quadrature)."""
    r = np.linspace(0.0, H, 200001)
    w = np.asarray(kernels.poly6(jnp.asarray(r * r), H, dim), np.float64)
    if dim == 2:
        integrand = w * 2.0 * math.pi * r
    else:
        integrand = w * 4.0 * math.pi * r * r
    total = np.trapezoid(integrand, r)
    assert abs(total - 1.0) < 1e-5


@pytest.mark.parametrize("dim", [2, 3])
def test_spiky_normalization(dim):
    """The spiky kernel whose gradient we use integrates to 1:
    W = C (h-r)^3 with C = 10/(pi h^5) in 2D, 15/(pi h^6) in 3D;
    our grad coefficient must equal -3C."""
    c = kernels.spiky_grad_coef(H, dim)
    if dim == 2:
        expected = -3.0 * 10.0 / (math.pi * H**5)
    else:
        expected = -3.0 * 15.0 / (math.pi * H**6)
    assert abs(c - expected) / abs(expected) < 1e-12


@pytest.mark.parametrize("dim", [2, 3])
def test_compact_support(dim):
    r = jnp.asarray([H, H * 1.0001, H * 2.0])
    assert np.all(np.asarray(kernels.poly6(r * r, H, dim)) == 0.0)
    assert np.all(np.asarray(kernels.spiky_grad_mag(r, H, dim)) == 0.0)
    assert np.all(np.asarray(kernels.visc_lap(r, H, dim)) == 0.0)


@pytest.mark.parametrize("dim", [2, 3])
def test_kernel_positive_inside(dim):
    r = jnp.linspace(0.0, H * 0.999, 50)
    assert np.all(np.asarray(kernels.poly6(r * r, H, dim)) > 0.0)
    assert np.all(np.asarray(kernels.visc_lap(r, H, dim)) > 0.0)
    # spiky gradient magnitude factor is negative (attractive direction
    # convention: grad W = g(r) * (x_i - x_j)/r with g < 0)
    assert np.all(np.asarray(kernels.spiky_grad_mag(r, H, dim)) < 0.0)


@pytest.mark.parametrize("dim", [2, 3])
def test_oracle_constants_match(dim):
    c_poly6, c_spiky, c_visc = numpy_ref._coefs(H, dim)
    assert abs(c_poly6 - kernels.poly6_coef(H, dim)) < 1e-9 * abs(c_poly6)
    assert abs(c_spiky - kernels.spiky_grad_coef(H, dim)) < 1e-9 * abs(c_spiky)
    assert abs(c_visc - kernels.visc_lap_coef(H, dim)) < 1e-9 * abs(c_visc)


def test_grad_antisymmetry():
    """grad W(x_i - x_j) = -grad W(x_j - x_i): follows from g(r)*d/r form —
    verify numerically on vectors."""
    d = jnp.asarray([[0.03, 0.04, 0.0], [-0.03, -0.04, 0.0]])
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    g = kernels.spiky_grad_mag(r, H, 3)
    grads = np.asarray(g[:, None] * d / r[:, None])
    np.testing.assert_allclose(grads[0], -grads[1], rtol=1e-6)
