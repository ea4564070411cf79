"""Train, persist and reload a single selected architecture.

The reference workflow ends at a Pareto front CSV: every trained Keras model
is discarded (`clear_session` per candidate, sa_nsga_penalty.py:211-212),
and the user is left to re-train the chosen genome by hand for deployment.
This module closes that gap TPU-natively: train ONE genome with the exact
search-time training semantics (same genome-keyed init, same Adam/early-stop
/restore-best program — engine/trainer.py), then save the weights in a
plain-npz format that reloads without pickle.

On-disk layout (one directory):
    model.npz   flattened params + BN state (keys are '/'-joined tree paths,
                params under 'p/', state under 's/')
    meta.json   genome, num_classes, template, metrics, train settings

The saved model reproduces the search's reported fitness exactly: `predict`
runs the same masked supernet forward (eval mode) the evaluator scored with.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..core.genome import Genome, validate
from ..models.genome_arch import model_size_mb
from ..models.supernet import BucketSpec, apply_model, stack_flags


def train_single(
    genome: Genome,
    data: Dict[str, np.ndarray],
    cfg: TrainConfig,
    seed: int = 0,
) -> Tuple[Dict, Dict, Dict]:
    """Train one genome exactly as the search evaluator would (same init
    keys, shuffle/dropout streams, early stopping and restore-best), but
    keep the trained parameters. Returns (params, state, metrics) with the
    leading pop axis (of size 1) stripped."""
    from .evaluator import PopulationEvaluator

    validate(genome)
    ev = PopulationEvaluator(data, cfg)
    spec = ev._bucket_spec(
        int(genome["filters"]), int(genome["kernel_size"]),
        int(genome["residual_blocks"]),
    )
    out, carry = ev._run_single_with_params(spec, genome, seed)
    eval_params = (
        carry["best_params"] if cfg.restore_best_weights else carry["params"]
    )
    eval_state = (
        carry["best_state"] if cfg.restore_best_weights else carry["state"]
    )
    strip = lambda t: jax.tree.map(lambda a: np.asarray(a)[0], t)  # noqa: E731
    acc_key = "acc_eval" if cfg.accuracy_from == "best" else "acc_last"
    metrics = {
        "accuracy": float(np.asarray(out[acc_key])[0]),
        "size_mb": model_size_mb(genome, cfg.num_classes, cfg.template),
        "fpr": float(np.asarray(out["fpr"])[0]),
        "val_loss": float(np.asarray(out["val_loss"])[0]),
        "epochs_ran": int(np.asarray(out["epochs_ran"])[0]),
    }
    return strip(eval_params), strip(eval_state), metrics


def _flatten(tree: Dict, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(p.key for p in path)
        flat[f"{prefix}/{key}"] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray], prefix: str) -> Dict:
    tree: Dict = {}
    for key, arr in flat.items():
        if not key.startswith(prefix + "/"):
            continue
        node = tree
        parts = key[len(prefix) + 1 :].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def save_model(
    out_dir: str,
    genome: Genome,
    cfg: TrainConfig,
    params: Dict,
    state: Dict,
    metrics: Dict,
    seed: int,
    input_hw=None,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, "model.npz"),
        **_flatten(params, "p"),
        **_flatten(state, "s"),
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "genome": dict(genome),
                "num_classes": cfg.num_classes,
                "template": cfg.template,
                "compute_dtype": cfg.compute_dtype,
                "dropout_rate": cfg.dropout_rate,
                "seed": seed,
                "metrics": metrics,
                # (H, W) of the feature map — the Keras/TFLite realization
                # needs a concrete input signature (models/keras_export.py)
                "input_hw": list(input_hw) if input_hw is not None else None,
            },
            f,
            indent=2,
        )


def load_model(model_dir: str):
    """Returns (genome, spec, params, state, meta); the first four feed
    ``predict`` directly, ``meta`` is the saved meta.json dict (template,
    metrics, seed, ...)."""
    with open(os.path.join(model_dir, "meta.json")) as f:
        meta = json.load(f)
    genome = meta["genome"]
    spec = BucketSpec(
        template=meta["template"],
        filters=int(genome["filters"]),
        kernel=int(genome["kernel_size"]),
        num_classes=int(meta["num_classes"]),
        dropout_rate=float(meta.get("dropout_rate", 0.3)),
        compute_dtype=meta.get("compute_dtype", "float32"),
        max_blocks=int(genome["residual_blocks"]),
    )
    flat = dict(np.load(os.path.join(model_dir, "model.npz")))
    return genome, spec, _unflatten(flat, "p"), _unflatten(flat, "s"), meta


def predict(spec: BucketSpec, genome: Genome, params, state, x) -> np.ndarray:
    """Eval-mode logits for a batch (the exact forward the search scored)."""
    flags = jax.tree.map(lambda a: a[0], stack_flags([genome]))
    logits, _ = apply_model(
        spec, params, state, flags, jnp.asarray(x), train=False
    )
    return np.asarray(logits)
