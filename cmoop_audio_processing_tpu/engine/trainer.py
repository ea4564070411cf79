"""Vmapped population trainer: one XLA program trains, early-stops and
scores a whole (padded) population of candidate CNNs.

Reference behavior being reproduced per individual
(sa_nsga_penalty.py:205-229; nsga_penalty.py:368-395):

    compile(adam, sparse_categorical_crossentropy)
    fit(X_train, y_train, validation_data=(X_val, y_val),
        epochs=300, batch_size=64,
        callbacks=[EarlyStopping(monitor='val_loss', patience=5,
                                 restore_best_weights=?)])
    -> validation accuracy, macro FPR from argmax predictions

TPU-native shape:

* The epoch loop is a device-side ``lax.while_loop`` that exits when every
  model has early-stopped (or at the epoch cap); each epoch is a ``lax.scan``
  over shuffled mini-batches with a ``vmap``'d value_and_grad + Adam update.
* Early stopping is per-model masking: stopped lanes keep their parameters,
  optimizer and BN state frozen (updates selected away), so the program stays
  a single static-shape computation.
* ``restore_best_weights`` keeps a best-params snapshot per model (selected
  on val-loss improvement), doubling parameter memory only.
* The val pass, the argmax predictions, the confusion matrix (computed as
  one-hot^T @ one-hot — an MXU matmul) and macro-FPR all run on device; the
  host receives one small fitness array per population.

Keras-faithful details: Adam(lr=1e-3, eps=1e-7) ["adam" compile default],
per-epoch reshuffling, strict-improvement early stopping with patience
counted in consecutive non-improving epochs, BN momentum 0.99 / eps 1e-3,
inverted dropout.

Deviation (documented): Keras trains each model with its own shuffle order
and a smaller final partial batch; here all models in a bucket share the
shuffle order and padded batches use weighted-mean losses. Fitness is
distributionally equivalent (SURVEY.md §7 "RNG discipline").
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.supernet import BucketSpec, apply_model


@dataclasses.dataclass(frozen=True)
class TrainSettings:
    epochs: int = 300
    batch_size: int = 64
    patience: int = 5
    learning_rate: float = 1e-3
    adam_eps: float = 1e-7  # keras Adam default epsilon
    restore_best_weights: bool = True
    eval_batch_size: int = 256
    # Population execution strategy:
    #   "grouped" — one grouped-conv network evaluates the whole population
    #     (models/grouped.py): the MXU sees pop*filters output channels, the
    #     right choice for TinyML-sized candidates.
    #   "vmap" — classic vmapped per-model program; kept as the semantic
    #     reference and for population sizes where grouping overflows VMEM.
    parallel_impl: str = "grouped"
    # Epochs per run_chunk call before the evaluator may compact
    # early-stopped lanes into a smaller program; 0 = one-shot (no
    # compaction). Should comfortably exceed patience so stopping
    # decisions stabilize between compactions. Off by default: at the
    # reference's pop-per-bucket sizes (<=4) the savings cancel against
    # per-chunk sync overhead; enable for big buckets / long budgets.
    compaction_chunk: int = 0
    # Estimated-seconds cap per one-shot launch; over-budget buckets run
    # chunked (exact same results). 0 disables. See TrainConfig for the
    # remote-worker motivation.
    launch_seconds_budget: float = 20.0


def pad_dataset(x: np.ndarray, y: np.ndarray, batch_size: int):
    """Pad (x, y) to a multiple of batch_size; returns (x, y, w) with w=0 on
    padding rows."""
    n = x.shape[0]
    n_pad = (-n) % batch_size
    w = np.ones(n, np.float32)
    if n_pad:
        x = np.concatenate([x, np.zeros((n_pad,) + x.shape[1:], x.dtype)])
        y = np.concatenate([y, np.zeros((n_pad,), y.dtype)])
        w = np.concatenate([w, np.zeros(n_pad, np.float32)])
    return x, y, w


def macro_fpr(y_true, y_pred, w, num_classes: int):
    """Macro-averaged FPR from a weighted confusion matrix
    (reference: nsga_penalty.py:351-364). Computed as a matmul so it lands on
    the MXU under vmap."""
    t = jax.nn.one_hot(y_true, num_classes, dtype=jnp.float32) * w[:, None]
    p = jax.nn.one_hot(y_pred, num_classes, dtype=jnp.float32)
    cm = t.T @ p
    total = cm.sum()
    col = cm.sum(axis=0)
    row = cm.sum(axis=1)
    diag = jnp.diagonal(cm)
    fp = col - diag
    tn = total - (row + col - diag)
    denom = fp + tn
    fpr_i = jnp.where(denom > 0, fp / jnp.maximum(denom, 1.0), 0.0)
    return jnp.mean(fpr_i)


def _tree_where(mask, a, b):
    """Per-model selection over stacked pytrees; mask shape (P,)."""
    def sel(x, y):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


def gather_lanes(carry: Dict, lane_idx: np.ndarray) -> Dict:
    """Compact a training carry to the given lanes (all leaves carry a
    leading pop axis except the scalar epoch counter)."""
    idx = jnp.asarray(lane_idx)

    def take(x):
        if getattr(x, "ndim", 0) == 0:
            return x
        return jnp.take(x, idx, axis=0)

    return jax.tree.map(take, carry)


@dataclasses.dataclass(frozen=True)
class PopulationTrainer:
    """Compiled population-training programs for one bucket.

    ``run_full`` is the one-shot path: population init + the whole epoch
    while_loop + final metrics fused into ONE program, so a bucket costs a
    single launch (the per-launch dispatch latency through a remote-TPU
    tunnel is ~0.2 s — with 2-6 buckets per generation the old
    init/run/finalize chain was the measured bottleneck, PERF.md).
    ``init_carry``/``run_chunk``/``finalize`` expose chunked execution so
    the evaluator can compact early-stopped lanes out of the program between
    chunks (engine/evaluator.py) — without compaction the lockstep
    while_loop runs every lane until the SLOWEST model stops. ``train`` is
    the params-in one-shot convenience used by trainer-level tests and the
    dryrun entry.
    """

    train: "callable"
    run_full: "callable"
    init_carry: "callable"
    run_chunk: "callable"
    finalize: "callable"


def make_population_trainer(
    spec: BucketSpec,
    settings: TrainSettings,
    num_classes: int,
):
    """Build the jittable population training function for one bucket.

    Returned fn signature:
        fn(params, state, flags, xtr, ytr, wtr, xval, yval, wval, key)
          -> dict of per-model arrays:
             acc_eval, acc_last, fpr, val_loss, best_val_loss, epochs_ran
    ``params``/``state`` are stacked pytrees (leading pop axis), ``flags``
    stacked flag arrays, datasets are shared across the population and must
    be pre-padded to batch multiples (``pad_dataset``).
    """
    opt = optax.adam(settings.learning_rate, eps=settings.adam_eps)
    grouped = settings.parallel_impl == "grouped"
    if grouped:
        from ..models.grouped import apply_population

    def pop_loss(params, state, flags, xb, yb, wb, dkey):
        """Summed per-model weighted CE. Parameters are disjoint across
        models, so grad(sum) is each model's own gradient — one backward
        pass serves the whole population."""
        if grouped:
            logits, new_state = apply_population(
                spec, params, state, flags, xb, train=True, dropout_key=dkey
            )
        else:
            P = flags["n_blocks"].shape[0]
            # per-lane dropout keys are folded from the genome-identity uid,
            # NOT the lane position: training randomness is then invariant
            # to bucketing, padding, and lane compaction
            uids = flags.get("uid")
            if uids is None:
                uids = jnp.arange(P, dtype=jnp.uint32)
            dkeys = jax.vmap(lambda u: jax.random.fold_in(dkey, u))(uids)
            logits, new_state = jax.vmap(
                lambda p, s, f, k: apply_model(
                    spec, p, s, f, xb, train=True, dropout_key=k
                ),
                in_axes=(0, 0, 0, 0),
            )(params, state, flags, dkeys)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.broadcast_to(yb, logits.shape[:-1])
        )  # (P, B)
        wsum = jnp.maximum(wb.sum(), 1.0)
        per_model = (ce * wb).sum(axis=1) / wsum
        return per_model.sum(), new_state

    grad_fn = jax.value_and_grad(pop_loss, has_aux=True)

    def pop_eval(params, state, flags, xb):
        """(P, B, C) eval-mode logits for the whole population."""
        if grouped:
            logits, _ = apply_population(spec, params, state, flags, xb, train=False)
            return logits
        return jax.vmap(
            lambda p, s, f: apply_model(spec, p, s, f, xb, train=False)[0]
        )(params, state, flags)

    def evaluate(params, state, flags, xval, yval, wval):
        """Scan the val set in eval-mode batches; returns per-model
        (loss, acc, fpr). xval shape (n_batches, B, ...)."""
        def body(carry, batch):
            xb, yb, wb = batch
            logits = pop_eval(params, state, flags, xb)  # (P, B, C)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.broadcast_to(yb, logits.shape[:-1])
            )
            preds = jnp.argmax(logits, axis=-1)
            correct = (preds == yb).astype(jnp.float32) * wb
            loss_sum, correct_sum, w_sum, cms = carry
            t = jax.nn.one_hot(yb, num_classes, dtype=jnp.float32) * wb[:, None]
            pm = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
            cm = jnp.einsum("bc,pbk->pck", t, pm)
            return (
                loss_sum + (ce * wb).sum(axis=1),
                correct_sum + correct.sum(axis=1),
                w_sum + wb.sum(),
                cms + cm,
            ), None

        P = flags["n_blocks"].shape[0]
        init = (
            jnp.zeros((P,)),
            jnp.zeros((P,)),
            jnp.zeros(()),
            jnp.zeros((P, num_classes, num_classes)),
        )
        (loss_sum, correct_sum, w_sum, cms), _ = jax.lax.scan(
            body, init, (xval, yval, wval)
        )
        loss = loss_sum / w_sum
        acc = correct_sum / w_sum
        # macro FPR from the accumulated confusion matrices
        total = cms.sum(axis=(1, 2))
        col = cms.sum(axis=1)
        row = cms.sum(axis=2)
        diag = jnp.diagonal(cms, axis1=1, axis2=2)
        fp = col - diag
        tn = total[:, None] - (row + col - diag)
        denom = fp + tn
        fpr = jnp.where(denom > 0, fp / jnp.maximum(denom, 1.0), 0.0).mean(axis=1)
        return loss, acc, fpr

    def _val_batches(xval, yval, wval):
        EB = settings.eval_batch_size
        n_vb = xval.shape[0] // EB
        return (
            xval.reshape((n_vb, EB) + xval.shape[1:]),
            yval.reshape((n_vb, EB)),
            wval.reshape((n_vb, EB)),
        )

    def init_carry(params, state, flags):
        """Initial training state; ``flags`` live inside the carry so lane
        compaction gathers everything in one place."""
        P = flags["n_blocks"].shape[0]
        return {
            "params": params,
            "state": state,
            "opt_state": jax.vmap(opt.init)(params),
            "flags": flags,
            "best_params": params,
            "best_state": state,
            "best_val_loss": jnp.full((P,), jnp.inf),
            "wait": jnp.zeros((P,), jnp.int32),
            "stopped": jnp.zeros((P,), bool),
            "last_val_acc": jnp.zeros((P,)),
            "last_val_loss": jnp.full((P,), jnp.inf),
            "epochs_ran": jnp.zeros((P,), jnp.int32),
            "epoch": jnp.zeros((), jnp.int32),
        }

    def run_chunk(carry, xtr, ytr, wtr, xval, yval, wval, key, epoch_end):
        """Advance training until every lane stopped, the per-model epoch cap
        is reached, or the (dynamic) ``epoch_end`` chunk boundary — the hook
        the evaluator uses to compact away early-stopped lanes between
        chunks. RNG is keyed by the global epoch index, so chunked and
        one-shot executions follow identical shuffle/dropout streams."""
        n_train = xtr.shape[0]
        B = settings.batch_size
        n_batches = n_train // B
        xval_b, yval_b, wval_b = _val_batches(xval, yval, wval)

        def train_epoch(params, state, opt_state, flags, stopped, epoch_key):
            perm = jax.random.permutation(epoch_key, n_train).reshape(
                n_batches, B
            )

            def batch_step(carry, idx):
                params, state, opt_state = carry
                xb = xtr[idx]
                yb = ytr[idx]
                wb = wtr[idx]
                dkey = jax.random.fold_in(epoch_key, idx[0])
                (loss, new_state), grads = grad_fn(
                    params, state, flags, xb, yb, wb, dkey
                )
                updates, new_opt = jax.vmap(opt.update)(
                    grads, opt_state, params
                )
                new_params = jax.vmap(optax.apply_updates)(params, updates)
                # freeze stopped lanes
                active = ~stopped
                params = _tree_where(active, new_params, params)
                state = _tree_where(active, new_state, state)
                opt_state = _tree_where(active, new_opt, opt_state)
                return (params, state, opt_state), loss

            (params, state, opt_state), _ = jax.lax.scan(
                batch_step, (params, state, opt_state), perm
            )
            return params, state, opt_state

        def cond(carry):
            # the epoch cap arrives ONLY via the dynamic epoch_end operand:
            # baking settings.epochs in as a literal would make every epoch
            # budget a distinct compiled program
            epoch, stopped = carry["epoch"], carry["stopped"]
            return (epoch < epoch_end) & ~jnp.all(stopped)

        def body(carry):
            epoch = carry["epoch"]
            flags = carry["flags"]
            epoch_key = jax.random.fold_in(key, epoch)
            params, state, opt_state = train_epoch(
                carry["params"],
                carry["state"],
                carry["opt_state"],
                flags,
                carry["stopped"],
                epoch_key,
            )
            val_loss, val_acc, _ = evaluate(
                params, state, flags, xval_b, yval_b, wval_b
            )
            stopped = carry["stopped"]
            active = ~stopped
            improved = val_loss < carry["best_val_loss"]
            take_best = active & improved
            best_val_loss = jnp.where(
                take_best, val_loss, carry["best_val_loss"]
            )
            best_params = _tree_where(take_best, params, carry["best_params"])
            best_state = _tree_where(take_best, state, carry["best_state"])
            wait = jnp.where(
                active, jnp.where(improved, 0, carry["wait"] + 1), carry["wait"]
            )
            newly_stopped = active & (wait >= settings.patience)
            # metrics at each model's final executed epoch (keras history[-1])
            last_val_acc = jnp.where(active, val_acc, carry["last_val_acc"])
            last_val_loss = jnp.where(active, val_loss, carry["last_val_loss"])
            epochs_ran = jnp.where(active, epoch + 1, carry["epochs_ran"])
            return {
                "params": params,
                "state": state,
                "opt_state": opt_state,
                "flags": flags,
                "best_params": best_params,
                "best_state": best_state,
                "best_val_loss": best_val_loss,
                "wait": wait,
                "stopped": stopped | newly_stopped,
                "last_val_acc": last_val_acc,
                "last_val_loss": last_val_loss,
                "epochs_ran": epochs_ran,
                "epoch": epoch + 1,
            }

        return jax.lax.while_loop(cond, body, carry)

    def finalize(carry, xval, yval, wval):
        """Final metrics for every lane of a carry: restore-best selection,
        model.evaluate accuracy, macro FPR."""
        xval_b, yval_b, wval_b = _val_batches(xval, yval, wval)
        if settings.restore_best_weights:
            eval_params, eval_state = carry["best_params"], carry["best_state"]
        else:
            eval_params, eval_state = carry["params"], carry["state"]
        val_loss, val_acc, fpr = evaluate(
            eval_params, eval_state, carry["flags"], xval_b, yval_b, wval_b
        )
        return {
            "acc_eval": val_acc,  # model.evaluate(X_val) accuracy
            "acc_last": carry["last_val_acc"],  # history['val_accuracy'][-1]
            "fpr": fpr,
            "val_loss": val_loss,
            "best_val_loss": carry["best_val_loss"],
            "epochs_ran": carry["epochs_ran"],
        }

    def train_fn(params, state, flags, xtr, ytr, wtr, xval, yval, wval, key):
        """One-shot convenience: full run to the epoch cap, then metrics."""
        carry = init_carry(params, state, flags)
        carry = run_chunk(
            carry, xtr, ytr, wtr, xval, yval, wval, key,
            jnp.asarray(settings.epochs, jnp.int32),
        )
        return finalize(carry, xval, yval, wval)

    def run_full(
        flags, xtr, ytr, wtr, xval, yval, wval, base_key, key, epoch_end
    ):
        """Fused one-shot bucket program: genome-keyed population init +
        carry init + the epoch while_loop + restore-best final metrics, all
        in ONE launch. ``epoch_end`` stays a dynamic operand (one compiled
        program serves every epoch budget); no carry buffers ever cross the
        host boundary, so there is nothing to donate or transfer."""
        from ..models.supernet import init_population_in_program

        params, state = init_population_in_program(base_key, flags, spec)
        carry = init_carry(params, state, flags)
        carry = run_chunk(
            carry, xtr, ytr, wtr, xval, yval, wval, key, epoch_end
        )
        return finalize(carry, xval, yval, wval)

    return PopulationTrainer(
        train=train_fn,
        run_full=run_full,
        init_carry=init_carry,
        run_chunk=run_chunk,
        finalize=finalize,
    )
