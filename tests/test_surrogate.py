"""GP surrogate tests: interpolation sanity, sklearn ranking parity, manager
contract (archive dedup, feature map, CV clamp)."""

import numpy as np
import pytest

from cmoop_audio_processing_tpu.core.config import Constraints
from cmoop_audio_processing_tpu.core.genome import all_genomes
from cmoop_audio_processing_tpu.core.records import make_individual
from cmoop_audio_processing_tpu.surrogate.acquisition import (
    penalized_acquisition,
    predict_gps,
    train_gps,
)
from cmoop_audio_processing_tpu.surrogate.gp import GPConfig, fit_gp, predict_gp
from cmoop_audio_processing_tpu.surrogate.manager import (
    SurrogateManager,
    encode_features,
)

FAST_GP = GPConfig(n_restarts=3, steps=100)


def test_gp_interpolates_noise_free():
    rng = np.random.default_rng(0)
    x = rng.random((20, 3))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    cfg = GPConfig(with_noise=False, n_restarts=3, steps=200)
    gp = fit_gp(x, y, cfg)
    mu = predict_gp(gp, x, cfg)
    np.testing.assert_allclose(mu, y, atol=5e-3)


def test_gp_std_zero_at_training_points_without_noise():
    rng = np.random.default_rng(1)
    x = rng.random((15, 2))
    y = x[:, 0] * 2 - x[:, 1]
    cfg = GPConfig(with_noise=False, n_restarts=3, steps=200)
    gp = fit_gp(x, y, cfg)
    _, sd = predict_gp(gp, x, cfg, return_std=True)
    assert np.all(sd < 0.05)
    # away from data, uncertainty grows
    far = np.array([[5.0, 5.0]])
    _, sd_far = predict_gp(gp, far, cfg, return_std=True)
    assert sd_far[0] > np.max(sd) + 0.01


def test_gp_ranking_parity_with_sklearn():
    """The contract is ranking behavior, not hyperparameter equality
    (SURVEY.md §7): on held-out points, our GP's predicted ordering must
    correlate strongly with sklearn's."""
    from scipy.stats import spearmanr
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import (
        ConstantKernel as C,
        Matern,
        WhiteKernel,
    )

    rng = np.random.default_rng(2)
    x = rng.random((40, 4)) * 2
    y = np.sin(2 * x[:, 0]) + 0.5 * x[:, 1] - 0.2 * x[:, 2] ** 2 + 0.05 * rng.standard_normal(40)
    xq = rng.random((30, 4)) * 2

    sk = GaussianProcessRegressor(
        kernel=C(1.0) * Matern(length_scale=1.0, nu=1.5) + WhiteKernel(0.1),
        n_restarts_optimizer=5,
    ).fit(x, y)
    sk_mu = sk.predict(xq)

    gp = fit_gp(x, y, GPConfig(n_restarts=5, steps=300))
    mu = predict_gp(gp, xq, GPConfig())

    rho = spearmanr(sk_mu, mu).statistic
    assert rho > 0.95, f"ranking diverged: spearman={rho}"
    # and means are close in absolute terms too
    assert np.max(np.abs(mu - sk_mu)) < 0.35


def test_encode_features_layout():
    g = {
        "filters": 32,
        "kernel_size": 5,
        "use_bn": True,
        "residual_blocks": 2,
        "fc_layers": 3,
        "use_dropout": False,
    }
    x = encode_features([g])
    # numeric passthrough then one-hot (False, True) per categorical
    np.testing.assert_array_equal(
        x[0], [32, 5, 2, 3, 0, 1, 1, 0]
    )


def _fake_results(genomes, acc_fn):
    cons = Constraints(0.9, 2.5, 0.09)
    out = []
    for g in genomes:
        acc = acc_fn(g)
        out.append(make_individual(g, acc, 1.0 + 0.01 * g["filters"], 0.05, cons))
    return out


def test_manager_update_predict_roundtrip():
    genomes = all_genomes()[::24][:10]
    acc_fn = lambda g: 0.8 + 0.001 * g["filters"] + 0.01 * g["residual_blocks"]
    results = _fake_results(genomes, acc_fn)
    mgr = SurrogateManager(FAST_GP)
    mgr.update(genomes, results)
    assert mgr.is_fitted and mgr.archive_size == 10

    preds = mgr.predict(genomes)
    # on its own training points the GP should be close
    true_negacc = np.array([-acc_fn(g) for g in genomes])
    assert np.max(np.abs(preds["neg_acc"] - true_negacc)) < 0.05

    structured = mgr.predict_and_structure(genomes)
    assert all(s["CV"] >= 0 for s in structured)
    assert structured[0]["objs"][1] == pytest.approx(preds["size"][0])


def test_manager_archive_dedup_keep_last():
    genomes = all_genomes()[:3]
    mgr = SurrogateManager(FAST_GP)
    r1 = _fake_results(genomes, lambda g: 0.8)
    mgr.update(genomes, r1)
    assert mgr.archive_size == 3
    # re-evaluate genome 0 with a different accuracy: archive stays 3,
    # newest value wins
    r2 = _fake_results(genomes[:1], lambda g: 0.95)
    mgr.update(genomes[:1], r2)
    assert mgr.archive_size == 3
    entry = [e for e in mgr.archive_items() if e["genome"] == genomes[0]][0]
    assert entry["neg_acc"] == pytest.approx(-0.95)


def test_manager_predict_before_fit_raises():
    mgr = SurrogateManager(FAST_GP)
    with pytest.raises(RuntimeError):
        mgr.predict(all_genomes()[:1])


def test_manager_state_roundtrip():
    genomes = all_genomes()[::30][:6]
    mgr = SurrogateManager(FAST_GP)
    mgr.update(genomes, _fake_results(genomes, lambda g: 0.85))
    state = mgr.state_dict()
    mgr2 = SurrogateManager(FAST_GP)
    mgr2.load_state_dict(state)
    p1 = mgr.predict(genomes)
    p2 = mgr2.predict(genomes)
    for t in p1:
        np.testing.assert_allclose(p1[t], p2[t], rtol=1e-5, atol=1e-6)


def test_mobo_gps_and_acquisition():
    rng = np.random.default_rng(3)
    x = rng.random((20, 6))
    y_objs = np.column_stack([
        -0.8 - 0.1 * x[:, 0],          # neg acc: better with x0
        0.5 + 2.0 * x[:, 0],           # size: worse with x0
        0.1 - 0.05 * x[:, 3],
    ])
    y_cv = np.maximum(0.0, 0.5 - x[:, 0])[:, None]  # infeasible at low x0
    obj_gps = train_gps(x, y_objs)
    cv_gp = train_gps(x, y_cv)[0]
    mu = predict_gps(obj_gps, x)
    assert mu.shape == (20, 3)
    np.testing.assert_allclose(mu[:, 1], y_objs[:, 1], atol=0.15)

    cands = rng.random((100, 6))
    acq = penalized_acquisition(cands, obj_gps, cv_gp, lam=10.0)
    assert acq.shape == (100,)
    best = cands[np.argmax(acq)]
    # with lam=10 the CV term (weight 10*0.5 at x0=0) dominates the size
    # gain, so the acquisition must prefer feasible (higher x0) candidates
    assert best[0] > 0.4


def test_fit_gp_multi_matches_sequential():
    """The batched multi-target fit is the same math as sequential fit_gp
    calls with the same keys (vmap only batches the program)."""
    import jax

    from cmoop_audio_processing_tpu.surrogate.gp import fit_gp, fit_gp_multi

    rng = np.random.default_rng(4)
    x = rng.random((18, 5))
    ys = [np.sin(2 * x[:, 0]), x[:, 1] ** 2, 0.5 * x[:, 2] - x[:, 3]]
    keys = [jax.random.fold_in(jax.random.key(9), i) for i in range(3)]
    cfg = GPConfig(n_restarts=3, steps=80)

    multi = fit_gp_multi(x, ys, cfg, keys)
    xq = rng.random((7, 5))
    for y, key, st in zip(ys, keys, multi):
        solo = fit_gp(x, y, cfg, key)
        np.testing.assert_allclose(
            predict_gp(st, xq, cfg), predict_gp(solo, xq, cfg),
            rtol=1e-4, atol=1e-5,
        )


def test_predict_gps_shared_x_matches_per_model_predict():
    """The shared-distance batched predict is numerically identical to
    per-model predict_gp (same float64 math, distance computed once)."""
    from cmoop_audio_processing_tpu.surrogate.acquisition import (
        MOBO_GP_CONFIG,
        train_gps,
    )
    from cmoop_audio_processing_tpu.surrogate.gp import (
        predict_gp,
        predict_gps_shared_x,
    )

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (24, 6))
    y = np.stack([x.sum(1), (x ** 2).sum(1), np.sin(x[:, 0] * 3)], axis=1)
    gps = train_gps(x, y, seed=0)
    xq = rng.uniform(0, 1, (50, 6))
    batched = predict_gps_shared_x(gps, xq, MOBO_GP_CONFIG)
    for d, gp in enumerate(gps):
        np.testing.assert_allclose(
            batched[:, d], predict_gp(gp, xq, MOBO_GP_CONFIG), rtol=1e-12)


def test_gp_ranking_parity_on_archive_shaped_data():
    """GP parity where it is notoriously flat (VERDICT r1 weak 6): the REAL
    archive feature layout — integer numerics + one-hot boolean columns
    (surrogate/manager.encode_features), near-duplicate rows (genomes
    differing by one gene), an accuracy-shaped target. Ranking on held-out
    genomes must track sklearn's."""
    from scipy.stats import spearmanr
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import (
        ConstantKernel as C,
        Matern,
        WhiteKernel,
    )

    from cmoop_audio_processing_tpu.core.genome import all_genomes
    from cmoop_audio_processing_tpu.engine.evaluator import FakeEvaluator
    from cmoop_audio_processing_tpu.surrogate.manager import encode_features

    rng = np.random.default_rng(5)
    genomes = all_genomes()
    # archive-like sample: 50 genomes incl. adjacent (near-duplicate) pairs
    idx = list(rng.choice(288, 40, replace=False)) + [0, 1, 2, 3, 288 - 1,
                                                      288 - 2, 10, 11, 12, 13]
    train_g = [genomes[i] for i in idx]
    held_g = [genomes[i] for i in rng.choice(288, 40, replace=False)]
    fe = FakeEvaluator()
    y = np.array([fe.fitness(g)[0] for g in train_g])
    y = -(y + 0.01 * rng.standard_normal(len(y)))  # neg_acc + eval noise

    x = encode_features(train_g)
    xq = encode_features(held_g)
    # the manager's target scaling + kernel family (manager._refit)
    mu_y, sd_y = y.mean(), max(y.std(), 1e-12)
    y_n = (y - mu_y) / sd_y

    sk = GaussianProcessRegressor(
        kernel=C(1.0) * Matern(length_scale=1.0, nu=1.5) + WhiteKernel(0.1),
        n_restarts_optimizer=5,
    ).fit(x, y_n)
    sk_mu = sk.predict(xq)

    gp = fit_gp(x, y_n, GPConfig(nu=1.5, n_restarts=10))
    mu = predict_gp(gp, xq, GPConfig(nu=1.5))

    rho = spearmanr(sk_mu, mu).statistic
    assert rho > 0.9, f"archive-shaped ranking diverged: spearman={rho}"
