"""GP covariance kernels in JAX.

The reference uses sklearn's GaussianProcessRegressor with
``C(1.0) * Matern(length_scale=1.0, nu=1.5) + WhiteKernel(noise_level=0.1)``
for the SA-NSGA-II surrogates (sa_nsga_penalty.py:278) and ``Matern(nu=2.5)``
with ``normalize_y=True`` for MOBO (mobo_penalty.py:259-260). We implement
the same kernel family with log-parameterized hyperparameters so marginal-
likelihood optimization is unconstrained — and runs on device, vmapped over
restarts (surrogate/gp.py).

All kernels operate on (N, D) feature matrices and return (N, M) Gram
matrices. Hyperparameters are passed as a flat dict of scalars.
"""

from __future__ import annotations

import jax.numpy as jnp


def sqdist(xa: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distances, (N, M). Computed via the
    expansion trick so it is one matmul on the MXU."""
    na = jnp.sum(xa ** 2, axis=1)[:, None]
    nb = jnp.sum(xb ** 2, axis=1)[None, :]
    d2 = na + nb - 2.0 * (xa @ xb.T)
    return jnp.maximum(d2, 0.0)


def matern(xa, xb, length_scale, nu: float = 1.5):
    """Matern kernel for nu in {0.5, 1.5, 2.5} (the closed forms sklearn
    uses)."""
    d = jnp.sqrt(sqdist(xa, xb) + 1e-30) / length_scale
    if nu == 0.5:
        return jnp.exp(-d)
    if nu == 1.5:
        s = jnp.sqrt(3.0) * d
        return (1.0 + s) * jnp.exp(-s)
    if nu == 2.5:
        s = jnp.sqrt(5.0) * d
        return (1.0 + s + s ** 2 / 3.0) * jnp.exp(-s)
    raise ValueError(f"unsupported nu={nu}")


def rbf(xa, xb, length_scale):
    return jnp.exp(-0.5 * sqdist(xa, xb) / length_scale ** 2)


def scaled_matern_white(
    xa, xb, log_constant, log_length, log_noise, nu: float = 1.5, diag_noise: bool = True
):
    """C(c) * Matern(l, nu) [+ White(n) on the diagonal when xa is xb].

    Matches the reference surrogate kernel structure
    (sa_nsga_penalty.py:278). The white term only contributes to the Gram
    diagonal (sklearn semantics: WhiteKernel vanishes for cross-covariance).
    """
    c = jnp.exp(log_constant)
    l = jnp.exp(log_length)
    k = c * matern(xa, xb, l, nu)
    if diag_noise:
        n = jnp.exp(log_noise)
        k = k + n * jnp.eye(xa.shape[0], xb.shape[0])
    return k
