"""Reporting, checkpoint and data-pipeline contract tests."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from cmoop_audio_processing_tpu.core.config import Constraints, DataConfig
from cmoop_audio_processing_tpu.core.genome import all_genomes
from cmoop_audio_processing_tpu.core.records import make_individual
from cmoop_audio_processing_tpu.core.rng import RunRng
from cmoop_audio_processing_tpu.data.loaders import load_hdf5, load_npy_dir, save_npy_dir
from cmoop_audio_processing_tpu.data.pipeline import (
    Standardizer,
    prepare_dataset,
    standardize_splits,
)
from cmoop_audio_processing_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from cmoop_audio_processing_tpu.utils.reporting import RunReporter, StageTimer

CONS = Constraints(0.9, 2.5, 0.09)


def _pop(n=5):
    return [
        make_individual(g, 0.9 + 0.001 * i, 1.0, 0.05, CONS)
        for i, g in enumerate(all_genomes()[:n])
    ]


def test_reporter_generation_schema(tmp_path):
    rep = RunReporter(str(tmp_path), "t")
    df = rep.record_generation(0, _pop())
    assert list(df.columns) == [
        "Generation", "Accuracy", "Size_MB", "FPR", "CV",
        "filters", "kernel_size", "use_bn", "residual_blocks", "fc_layers",
        "use_dropout",
    ]
    assert (df["Generation"] == 0).all()


def test_reporter_resume_restores_generations(tmp_path):
    """A reporter opened with resume=True reloads the generations a previous
    process flushed (via the combined CSV), and a re-recorded generation —
    the crash-between-flush-and-checkpoint case — supersedes its old rows
    and anything after them."""
    rep = RunReporter(str(tmp_path), "t")
    rep.record_generation(0, _pop(5))
    rep.record_generation(1, _pop(4))
    rep.record_generation(2, _pop(3))

    rep2 = RunReporter(str(tmp_path), "t", resume=True)
    assert [len(df) for df in rep2.gen_dfs] == [5, 4, 3]
    # checkpoint was at gen 0 -> the resumed loop re-runs gen 1
    df = rep2.record_generation(1, _pop(2))
    assert [len(d) for d in rep2.gen_dfs] == [5, 2]
    assert (df["Generation"] == 1).all()
    combined = pd.read_csv(tmp_path / "t" / "all_generations.csv")
    assert sorted(set(combined["Generation"])) == [0, 1]

    # a FRESH (non-resume) reporter into the same dir starts clean
    rep3 = RunReporter(str(tmp_path), "t")
    assert rep3.gen_dfs == []
    assert not os.path.exists(tmp_path / "t" / "all_generations.csv")


def test_reporter_periodic_and_final(tmp_path):
    rep = RunReporter(str(tmp_path), "t", periodic_every=2)
    assert rep.periodic_pareto(0, _pop()) is None  # gen 0: (0+1) % 2 != 0
    path = rep.periodic_pareto(1, _pop())
    assert path and os.path.exists(path) and "iteration_2" in path
    final = rep.final_pareto(_pop())
    assert os.path.exists(final)
    assert "CV" not in pd.read_csv(final).columns
    final_cv = rep.final_pareto(_pop(), include_cv=True, filename="with_cv.csv")
    assert "CV" in pd.read_csv(final_cv).columns


def test_reporter_all_generations_fallback(tmp_path):
    rep = RunReporter(str(tmp_path), "t")
    rep.record_generation(0, _pop())
    rep.record_generation(1, _pop())
    out = rep.all_generations()
    # either an xlsx (engine present) or a CSV sheet directory
    assert os.path.exists(out)
    if os.path.isdir(out):
        assert os.path.exists(os.path.join(out, "Gen_1.csv"))


def test_stage_timer_logs(tmp_path):
    rep = RunReporter(str(tmp_path), "t")
    with StageTimer(rep, "demo", gen=3):
        pass
    lines = open(os.path.join(rep.dir, "progress.jsonl")).read().splitlines()
    recs = [json.loads(l) for l in lines]
    assert any(r["event"] == "stage" and r["stage"] == "demo" for r in recs)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck.json")
    rng = RunRng(5)
    rng.host.random()
    state = {"algorithm": "nsga2", "generation": 2, "population": _pop(),
             "rng": rng.state_dict()}
    save_checkpoint(path, state)
    loaded = load_checkpoint(path)
    assert loaded["generation"] == 2
    rng2 = RunRng(0)
    rng2.load_state_dict(loaded["rng"])
    assert rng2.host.random() == rng.host.random()


def test_checkpoint_missing_returns_none(tmp_path):
    assert load_checkpoint(str(tmp_path / "nope.json")) is None


# --- data pipeline -----------------------------------------------------------

def test_standardizer_matches_sklearn():
    from sklearn.preprocessing import StandardScaler

    rng = np.random.default_rng(0)
    x = rng.random((20, 7, 5)).astype(np.float32) * 3 + 1
    ours = Standardizer().fit(x)
    sk = StandardScaler().fit(x.reshape(-1, 5))
    np.testing.assert_allclose(ours.mean_, sk.mean_, rtol=1e-6)
    np.testing.assert_allclose(ours.std_, np.sqrt(sk.var_), rtol=1e-6)
    np.testing.assert_allclose(
        ours.transform(x).reshape(-1, 5),
        sk.transform(x.reshape(-1, 5)),
        rtol=1e-4, atol=1e-5,
    )


def test_scaler_variants():
    rng = np.random.default_rng(1)
    data = {
        "x_train": rng.random((50, 4, 3)).astype(np.float32) * 2,
        "x_val": rng.random((20, 4, 3)).astype(np.float32) + 5,
        "x_test": rng.random((20, 4, 3)).astype(np.float32),
        "y_train": np.zeros(50, np.int32),
        "y_val": np.zeros(20, np.int32),
        "y_test": np.zeros(20, np.int32),
    }
    strict = standardize_splits(data, "train_only")
    # val standardized with TRAIN stats: mean shifted well away from 0
    assert abs(strict["x_val"].mean()) > 1.0
    leaky = standardize_splits(data, "leaky")
    # leaky variant re-fits per split: val mean ~ 0 (the reference bug,
    # nsga_penalty.py:111-137)
    assert abs(leaky["x_val"].mean()) < 1e-4


def test_npy_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    data = {
        "x_train": rng.random((10, 4, 3)).astype(np.float32),
        "x_val": rng.random((4, 4, 3)).astype(np.float32),
        "x_test": rng.random((4, 4, 3)).astype(np.float32),
        "y_train": rng.integers(0, 3, 10).astype(np.int32),
        "y_val": rng.integers(0, 3, 4).astype(np.int32),
        "y_test": rng.integers(0, 3, 4).astype(np.int32),
    }
    save_npy_dir(data, str(tmp_path))
    loaded = load_npy_dir(str(tmp_path))
    np.testing.assert_allclose(loaded["x_train"], data["x_train"])
    np.testing.assert_array_equal(loaded["y_val"], data["y_val"])


def test_hdf5_loader_stratified_split(tmp_path):
    import h5py

    rng = np.random.default_rng(3)
    n = 120
    x = rng.random((n, 6, 4)).astype(np.float32)
    y = np.repeat(np.arange(4), n // 4).astype(np.int32)
    path = str(tmp_path / "mel_spec.h5")
    with h5py.File(path, "w") as hf:
        hf["X_train"] = x
        hf["y_train"] = y
        hf["classes"] = np.array([b"a", b"b", b"c", b"d"])
    data = load_hdf5(path)
    # 50/25/25 split
    assert len(data["x_train"]) == 60
    assert len(data["x_val"]) == 30
    assert len(data["x_test"]) == 30
    # stratification: class counts balanced to within rounding per split
    for split in ("y_train", "y_val", "y_test"):
        counts = np.bincount(data[split], minlength=4)
        assert counts.max() - counts.min() <= 1, (split, counts)
    assert data["classes"] == ["a", "b", "c", "d"]


def test_prepare_dataset_synthetic_shapes():
    cfg = DataConfig(synthetic_train=64, synthetic_eval=32, time_steps=20,
                     features=10, num_classes=5)
    data = prepare_dataset(cfg)
    assert data["x_train"].shape == (64, 20, 10, 1)
    assert data["x_val"].shape == (32, 20, 10, 1)
    assert data["y_train"].dtype == np.int32
    # standardized per feature over train
    flat = data["x_train"].reshape(-1, 10)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=1e-4)


def test_synthetic_learnable_classes():
    """Classes must be separable enough that a linear probe beats chance by a
    wide margin — otherwise search results carry no signal."""
    from sklearn.linear_model import LogisticRegression

    cfg = DataConfig(synthetic_train=400, synthetic_eval=200)
    data = prepare_dataset(cfg)
    xt = data["x_train"].reshape(len(data["x_train"]), -1)
    xv = data["x_val"].reshape(len(data["x_val"]), -1)
    clf = LogisticRegression(max_iter=300).fit(xt, data["y_train"])
    acc = (clf.predict(xv) == data["y_val"]).mean()
    assert acc > 0.5  # chance = 0.1
