"""On-device Gaussian-process regression (Kriging).

Replaces sklearn's GaussianProcessRegressor (the reference's surrogate core,
sa_nsga_penalty.py:282-286 and mobo_penalty.py:259-260) with a JAX
implementation that runs fit and predict on the accelerator:

* Marginal-likelihood hyperparameter fitting via Cholesky NLL, optimized
  with Adam on log-hyperparameters. sklearn restarts L-BFGS-B serially
  (n_restarts_optimizer=10); here ALL restarts optimize in parallel under
  ``vmap`` — a population of GP fits is one device program, the same design
  move as the population CNN trainer.
* XLA-friendly shapes: training sets are padded to the next power of two and
  padded rows carry huge per-point noise (1e6), making them statistically
  inert while keeping one compiled program per size bucket across the whole
  search run (the archive grows every generation; without padding each
  update would recompile).
* Predictions return mean and (optionally) std including the white-noise
  term on the prior diagonal, matching sklearn's WhiteKernel.diag behavior.
* float32 conditioning: sklearn factorizes in float64 with alpha=1e-10; at
  float32 a noise-free smooth-kernel Gram needs jitter scaled to the kernel
  diagonal (1e-6 relative), and the final posterior factorization is done
  in float64 under ``jax.enable_x64`` for sklearn-grade interpolation.

Exact sklearn hyperparameter equality is not a goal (different optimizer);
the contract is ranking-equivalent surrogate behavior (SURVEY.md §7 "GP
numerical parity"), validated in tests against sklearn fits on the same data.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import matern

JITTER = 1e-10  # sklearn GaussianProcessRegressor default alpha
PAD_NOISE = 1e6  # virtual noise carried by padding rows


@dataclasses.dataclass(frozen=True)
class GPConfig:
    nu: float = 1.5
    # which hyperparameters exist (MOBO's bare Matern has no constant/noise)
    with_constant: bool = True
    with_noise: bool = True
    n_restarts: int = 10
    steps: int = 200
    lr: float = 0.08
    log_bounds: Tuple[float, float] = (float(np.log(1e-5)), float(np.log(1e5)))
    # Restart initials are drawn from this narrower practical band: Adam
    # (unlike sklearn's L-BFGS-B) moves O(lr*steps) in log-space, so seeding
    # across the full +-11.5 bound range would strand restarts in degenerate
    # basins. Best-so-far tracking along the trajectory guards overshoot.
    init_bounds: Tuple[float, float] = (float(np.log(1e-2)), float(np.log(1e2)))
    init_log_constant: float = 0.0  # C(1.0)
    init_log_length: float = 0.0  # Matern(length_scale=1.0)
    init_log_noise: float = float(np.log(0.1))  # WhiteKernel(0.1)

    def _static(self):
        return (
            self.nu, self.with_constant, self.with_noise,
            self.steps, self.lr, self.log_bounds,
        )


class GPState(NamedTuple):
    """Fitted posterior: kernel hyperparams + float64 Cholesky cache."""

    log_c: jnp.ndarray
    log_l: jnp.ndarray
    log_n: jnp.ndarray
    x: jnp.ndarray  # (Np, D) padded training inputs
    point_noise: jnp.ndarray  # (Np,) 0 for real rows, PAD_NOISE for padding
    chol: jnp.ndarray  # (Np, Np) lower Cholesky of K (float64)
    alpha: jnp.ndarray  # (Np,) K^-1 y (float64)
    y_mean: jnp.ndarray  # normalize_y shift
    y_std: jnp.ndarray  # normalize_y scale


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _kernel(x1, x2, log_c, log_l, nu):
    return jnp.exp(log_c) * matern(x1, x2, jnp.exp(log_l), nu)


def _gram(x, point_noise, log_c, log_l, log_n, nu, with_noise):
    k = _kernel(x, x, log_c, log_l, nu)
    diag = point_noise + JITTER
    if with_noise:
        diag = diag + jnp.exp(log_n)
    # relative jitter keeps float32 Cholesky finite for smooth kernels
    diag = diag + 1e-6 * jnp.mean(jnp.diagonal(k))
    return k + jnp.diag(diag)


def _nll(params, x, y, point_noise, nu, with_constant, with_noise):
    log_c = params["log_c"] if with_constant else jnp.zeros(())
    log_n = params["log_n"] if with_noise else jnp.full((), -jnp.inf)
    k = _gram(x, point_noise, log_c, params["log_l"], log_n, nu, with_noise)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    n = x.shape[0]
    nll = (
        0.5 * y @ alpha
        + jnp.sum(jnp.log(jnp.diagonal(chol)))
        + 0.5 * n * jnp.log(2 * jnp.pi)
    )
    return jnp.where(jnp.isfinite(nll), nll, 1e10)


def _fit_restarts_impl(
    x, y, point_noise, inits, nu, with_constant, with_noise, steps, lr, bounds
):
    import optax

    lo, hi = bounds
    nll_fn = partial(
        _nll, x=x, y=y, point_noise=point_noise, nu=nu,
        with_constant=with_constant, with_noise=with_noise,
    )
    opt = optax.adam(lr)

    def run_restart(params0):
        state0 = opt.init(params0)
        best0 = (params0, nll_fn(params0))

        def step(carry, _):
            params, opt_state, (best_p, best_l) = carry
            loss, grads = jax.value_and_grad(nll_fn)(params)
            better = loss < best_l
            best_p = jax.tree.map(
                lambda b, p: jnp.where(better, p, b), best_p, params
            )
            best_l = jnp.where(better, loss, best_l)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = jax.tree.map(lambda p: jnp.clip(p, lo, hi), params)
            return (params, opt_state, (best_p, best_l)), None

        (params, _, (best_p, best_l)), _ = jax.lax.scan(
            step, (params0, state0, best0), None, steps
        )
        final_l = nll_fn(params)
        better = final_l < best_l
        best_p = jax.tree.map(lambda b, p: jnp.where(better, p, b), best_p, params)
        return best_p, jnp.minimum(best_l, final_l)

    params_all, losses = jax.vmap(run_restart)(inits)
    best = jnp.argmin(losses)
    return jax.tree.map(lambda p: p[best], params_all)


_STATIC = ("nu", "with_constant", "with_noise", "steps", "lr", "bounds")
_fit_restarts = partial(jax.jit, static_argnames=_STATIC)(_fit_restarts_impl)


@partial(jax.jit, static_argnames=_STATIC)
def _fit_restarts_multi(
    x, ys, point_noise, inits, nu, with_constant, with_noise, steps, lr, bounds
):
    """All targets' multi-restart fits as ONE device program: vmap over the
    target axis of (ys, inits); x and the padding-noise vector are shared.
    The SurrogateManager fits 4 GPs per generation — batching them turns 4
    program launches into 1."""
    fit_one = partial(
        _fit_restarts_impl, nu=nu, with_constant=with_constant,
        with_noise=with_noise, steps=steps, lr=lr, bounds=bounds,
    )
    return jax.vmap(lambda y, ini: fit_one(x, y, point_noise, ini))(ys, inits)


def _scale_target(y, normalize_y: bool):
    y_raw = np.asarray(y, np.float32).reshape(-1)
    if normalize_y:
        y_mean = float(y_raw.mean())
        y_std = float(max(y_raw.std(), 1e-12))
    else:
        y_mean, y_std = 0.0, 1.0
    return (y_raw - y_mean) / y_std, y_mean, y_std


def _pad_training(x: np.ndarray, y_n: np.ndarray):
    """Pad to a power of two with inert (huge-noise) rows."""
    n, d = x.shape
    np_pad = _next_pow2(max(n, 1))
    x_p = np.zeros((np_pad, d), np.float32)
    x_p[:n] = x
    y_p = np.zeros((np_pad,), np.float32)
    y_p[:n] = y_n
    noise_p = np.full((np_pad,), PAD_NOISE, np.float32)
    noise_p[:n] = 0.0
    return x_p, y_p, noise_p


def _make_inits(cfg: GPConfig, key):
    ilo, ihi = cfg.init_bounds
    n_restarts = max(cfg.n_restarts, 1)
    rk = jax.random.split(key, 3)
    rand = {
        "log_c": jax.random.uniform(rk[0], (n_restarts,), minval=ilo, maxval=ihi),
        "log_l": jax.random.uniform(rk[1], (n_restarts,), minval=ilo, maxval=ihi),
        "log_n": jax.random.uniform(rk[2], (n_restarts,), minval=ilo, maxval=ihi),
    }
    first = {
        "log_c": jnp.asarray([cfg.init_log_constant], jnp.float32),
        "log_l": jnp.asarray([cfg.init_log_length], jnp.float32),
        "log_n": jnp.asarray([cfg.init_log_noise], jnp.float32),
    }
    return jax.tree.map(
        lambda f, r: jnp.concatenate([f, r.astype(jnp.float32)]), first, rand
    )


def _params_to_logs(params, cfg: GPConfig):
    log_c = float(params["log_c"]) if cfg.with_constant else 0.0
    log_n = float(params["log_n"]) if cfg.with_noise else float(np.log(JITTER))
    return log_c, float(params["log_l"]), log_n


def fit_gp(
    x: np.ndarray,
    y: np.ndarray,
    cfg: GPConfig = GPConfig(),
    key: Optional[jax.Array] = None,
    normalize_y: bool = False,
) -> GPState:
    """Fit kernel hyperparameters by parallel multi-restart NLL minimization
    and cache the float64 posterior Cholesky."""
    x = np.asarray(x, np.float32)
    y_n, y_mean, y_std = _scale_target(y, normalize_y)
    x_p, y_p, noise_p = _pad_training(x, y_n)

    if key is None:
        key = jax.random.key(0)
    inits = _make_inits(cfg, key)

    params = _fit_restarts(
        jnp.asarray(x_p), jnp.asarray(y_p), jnp.asarray(noise_p), inits,
        cfg.nu, cfg.with_constant, cfg.with_noise,
        cfg.steps, cfg.lr, cfg.log_bounds,
    )
    log_c, log_l, log_n = _params_to_logs(params, cfg)

    # Posterior factorization on host in float64: TPUs have no native f64,
    # and sklearn-grade interpolation of a noise-free smooth kernel needs it
    # (alpha=1e-10 jitter is below f32 resolution). The matrices are tiny
    # (archive <= a few hundred points), so the expensive part — the
    # multi-restart hyperparameter search above — is what runs on device.
    return _host_posterior(x, y_n, cfg, log_c, log_l, log_n, y_mean, y_std)


def _host_posterior(x, y_n, cfg, log_c, log_l, log_n, y_mean, y_std) -> GPState:
    from scipy.linalg import cho_solve

    n = x.shape[0]
    k = _np_kernel(x, x, log_c, log_l, cfg.nu)
    diag = np.full(n, JITTER)
    if cfg.with_noise:
        diag = diag + np.exp(log_n)
    k = k + np.diag(diag)
    chol = np.linalg.cholesky(k)
    alpha = cho_solve((chol, True), y_n.astype(np.float64))
    return GPState(
        log_c=log_c,
        log_l=log_l,
        log_n=log_n,
        x=x.astype(np.float64),
        point_noise=np.zeros(n),
        chol=chol,
        alpha=alpha,
        y_mean=y_mean,
        y_std=y_std,
    )


def fit_gp_multi(
    x: np.ndarray,
    ys,
    cfg: GPConfig = GPConfig(),
    keys=None,
    normalize_y: bool = False,
):
    """Fit one GP per target over a SHARED input matrix in one device
    program (vmapped over targets x restarts). Returns a list of GPStates —
    the SurrogateManager's 4-target refit becomes a single launch."""
    x = np.asarray(x, np.float32)
    ys = [np.asarray(y, np.float32).reshape(-1) for y in ys]
    if keys is None:
        keys = [jax.random.fold_in(jax.random.key(0), i) for i in range(len(ys))]

    scaled = [_scale_target(y, normalize_y) for y in ys]
    padded = [_pad_training(x, y_n) for (y_n, _, _) in scaled]
    x_p, _, noise_p = padded[0]
    y_stack = jnp.asarray(np.stack([p[1] for p in padded]))
    inits = jax.tree.map(
        lambda *leaves: jnp.stack(leaves),
        *[_make_inits(cfg, k) for k in keys],
    )

    params_all = _fit_restarts_multi(
        jnp.asarray(x_p), y_stack, jnp.asarray(noise_p), inits,
        cfg.nu, cfg.with_constant, cfg.with_noise,
        cfg.steps, cfg.lr, cfg.log_bounds,
    )
    states = []
    for t, (y_n, y_mean, y_std) in enumerate(scaled):
        params_t = jax.tree.map(lambda p: p[t], params_all)
        log_c, log_l, log_n = _params_to_logs(params_t, cfg)
        states.append(
            _host_posterior(x, y_n, cfg, log_c, log_l, log_n, y_mean, y_std)
        )
    return states


def _np_pdist(x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """(N, M) float64 pairwise Euclidean distances."""
    x1 = np.asarray(x1, np.float64)
    x2 = np.asarray(x2, np.float64)
    d2 = (
        (x1 ** 2).sum(1)[:, None]
        + (x2 ** 2).sum(1)[None, :]
        - 2.0 * x1 @ x2.T
    )
    return np.sqrt(np.maximum(d2, 0.0))


def _np_kernel_from_dist(dist: np.ndarray, log_c, log_l, nu) -> np.ndarray:
    d = dist / np.exp(log_l)
    if nu == 0.5:
        k = np.exp(-d)
    elif nu == 1.5:
        s = np.sqrt(3.0) * d
        k = (1.0 + s) * np.exp(-s)
    elif nu == 2.5:
        s = np.sqrt(5.0) * d
        k = (1.0 + s + s ** 2 / 3.0) * np.exp(-s)
    else:
        raise ValueError(f"unsupported nu={nu}")
    return np.exp(log_c) * k


def _np_kernel(x1: np.ndarray, x2: np.ndarray, log_c, log_l, nu) -> np.ndarray:
    """float64 host kernel, same closed forms as kernels.matern."""
    return _np_kernel_from_dist(_np_pdist(x1, x2), log_c, log_l, nu)


def predict_gp(
    state: GPState,
    xq: np.ndarray,
    cfg: GPConfig = GPConfig(),
    return_std: bool = False,
):
    """Posterior mean (and std) at query points; host float64."""
    from scipy.linalg import solve_triangular

    xq = np.asarray(xq, np.float64)
    ks = _np_kernel(state.x, xq, state.log_c, state.log_l, cfg.nu)  # (N, M)
    mean = ks.T @ state.alpha
    mean = mean * float(state.y_std) + float(state.y_mean)
    if not return_std:
        return mean
    v = solve_triangular(state.chol, ks, lower=True)
    prior_diag = np.exp(state.log_c) * np.ones(xq.shape[0])
    if cfg.with_noise:
        prior_diag = prior_diag + np.exp(state.log_n)
    var = prior_diag - (v ** 2).sum(axis=0)
    std = np.sqrt(np.maximum(var, 0.0)) * float(state.y_std)
    return mean, std


def predict_gps_shared_x(
    states, xq: np.ndarray, cfg: GPConfig = GPConfig()
) -> np.ndarray:
    """(M, n_models) posterior means for GPs fit on the SAME training inputs.

    The per-model kernel differs only through (log_c, log_l), so the
    candidate<->archive distance matrix — the dominant cost — is computed
    once and shared across models. Host float64 on purpose: TPUs have no
    native f64 and these are tiny (candidates x archive) matmuls, so a
    device launch would cost more than it saves; the heavy stage (the
    multi-restart NLL fits) is what runs on device (fit_gp_multi).
    """
    xq = np.asarray(xq, np.float64)
    x0 = np.asarray(states[0].x)
    dist = _np_pdist(x0, xq)  # (N, M), shared
    cols = []
    for st in states:
        if st.x.shape != x0.shape or not np.array_equal(st.x, x0):
            # different training sets: no sharing possible
            cols.append(predict_gp(st, xq, cfg))
            continue
        ks = _np_kernel_from_dist(dist, st.log_c, st.log_l, cfg.nu)
        cols.append(ks.T @ st.alpha * float(st.y_std) + float(st.y_mean))
    return np.stack(cols, axis=1)
