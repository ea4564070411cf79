"""Population forward pass as ONE grouped convolution program.

``vmap(apply_model)`` gives XLA a batch of independent small convs: the MXU's
output-channel dimension stays at the model's own width (e.g. 16), wasting
most of the 128-wide systolic array on TinyML-sized candidates. This module
evaluates the whole population as a single network instead:

* conv: activations carry channels (pop * C); weights reshape from the
  stacked (pop, k, k, C, F) layout to (k, k, C, pop * F) and run as ONE
  ``lax.conv_general_dilated(feature_group_count=pop)`` — the MXU sees
  pop*F output channels (e.g. 16 models x 16 filters = 256 lanes busy).
* batchnorm: per merged channel == per-model per-channel, so batch stats
  are exactly the per-model stats.
* pooling / GAP / residual adds: channel-wise ops, unchanged semantics.
* FC: (B, pop, D) x (pop, D, U) batched matmuls (``einsum bpd,pdu->bpu``) —
  FC widths (512..64) already fill MXU tiles.

Parameters stay in the SAME stacked pytree layout as models/supernet.py
(leading pop axis on every leaf), so init, Adam, early-stopping lane masks
and checkpointing are untouched; only the forward changes. The per-model
loss sums over the population — parameters are disjoint across models, so
the gradient of the sum IS each model's own gradient.

Numerical contract: identical (up to matmul reassociation) to
vmap(apply_model); asserted in tests/test_grouped.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .supernet import BN_EPS, BN_MOMENTUM, FC_WIDTHS, BucketSpec


def _conv_grouped(x, w, b, pop, stride=1, dtype=jnp.float32):
    """x: (B, H, W, pop*Cin); w: (pop, k, k, Cin, Cout); b: (pop, Cout).
    One grouped conv; returns (B, H', W', pop*Cout)."""
    p, k, _, cin, cout = w.shape
    assert p == pop
    wg = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(k, k, cin, pop * cout)
    y = lax.conv_general_dilated(
        x.astype(dtype),
        wg.astype(dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=pop,
    )
    # activations stay in the compute dtype (the step is HBM-bandwidth
    # bound on activation traffic; see models/supernet._conv2d)
    return y + b.reshape(pop * cout).astype(dtype)


def _maxpool2(x):
    # init must be a NUMPY scalar literal: a jnp array init defeats the
    # reduce_window max-pool autodiff pattern match
    return lax.reduce_window(
        x, np.asarray(-np.inf, x.dtype), lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "SAME",
    )


def _bn_grouped(x, p, st, use_bn, pop, train):
    """x: (B, H, W, pop*C); p/st leaves: (pop, C); use_bn: (pop,)."""
    dtype = x.dtype
    c = p["gamma"].shape[1]
    gamma = p["gamma"].reshape(pop * c)
    beta = p["beta"].reshape(pop * c)
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        new_state = {
            "mean": (BN_MOMENTUM * st["mean"].reshape(-1) + (1 - BN_MOMENTUM) * mean).reshape(pop, c),
            "var": (BN_MOMENTUM * st["var"].reshape(-1) + (1 - BN_MOMENTUM) * var).reshape(pop, c),
        }
    else:
        mean = st["mean"].reshape(pop * c)
        var = st["var"].reshape(pop * c)
        new_state = st
    scale = (lax.rsqrt(var + BN_EPS) * gamma).astype(dtype)
    shift = (beta - mean * lax.rsqrt(var + BN_EPS) * gamma).astype(dtype)
    xn = x * scale + shift
    mask = jnp.repeat(use_bn, c)  # (pop*C,) lane-wise select per model
    return jnp.where(mask, xn, x), new_state


def _dropout_grouped(x, rate, use_dropout, train, lane_keys):
    """x: (B, pop, U); use_dropout: (pop,); lane_keys: (pop,) per-lane keys.

    Draws each lane's (B, U) mask from its own key — the SAME stream
    ``supernet._dropout`` consumes under vmap, so grouped and vmapped
    training are bitwise-identical even with dropout active."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.vmap(
        lambda k: jax.random.bernoulli(k, keep, (x.shape[0], x.shape[2]))
    )(lane_keys).astype(x.dtype) / keep
    mask = jnp.transpose(mask, (1, 0, 2))  # (pop, B, U) -> (B, pop, U)
    return jnp.where(use_dropout[None, :, None], x * mask, x)


def apply_population(
    spec: BucketSpec,
    params: Dict,
    state: Dict,
    flags: Dict,
    x: jnp.ndarray,
    *,
    train: bool,
    dropout_key=None,
):
    """Stacked-population forward: params/state as produced by
    ``supernet.init_population`` (leading pop axis), x shared (B, H, W, 1).
    Returns (logits (pop, B, classes), new_bn_state) — the same contract as
    ``vmap(apply_model)``."""
    pop = flags["n_blocks"].shape[0]
    dtype = jnp.dtype(spec.compute_dtype)
    use_bn = flags["use_bn"]
    new_state: Dict = {}
    b_sz = x.shape[0]

    # broadcast the shared input into pop groups: (B, H, W, pop*1)
    h = jnp.tile(x, (1, 1, 1, pop))

    def conv(h, pname, stride=1):
        cp = params[pname] if isinstance(pname, str) else pname
        return _conv_grouped(h, cp["w"], cp["b"], pop, stride, dtype)

    h = conv(h, "stem1")
    if spec.template == "A":
        h, new_state["stem1_bn"] = _bn_grouped(
            h, params["stem1_bn"], state["stem1_bn"], use_bn, pop, train
        )
        h = jax.nn.relu(h)
        h = conv(h, "stem2")
        h, new_state["stem2_bn"] = _bn_grouped(
            h, params["stem2_bn"], state["stem2_bn"], use_bn, pop, train
        )
        h = jax.nn.relu(h)
    else:
        h = jax.nn.relu(h)
        h, new_state["stem1_bn"] = _bn_grouped(
            h, params["stem1_bn"], state["stem1_bn"], use_bn, pop, train
        )
    h = _maxpool2(h)

    exits = []
    for i in range(spec.max_blocks):
        blk = params[f"block{i}"]
        skip = _conv_grouped(h, blk["skip"]["w"], blk["skip"]["b"], pop, 2, dtype)
        if spec.template == "A":
            y = _conv_grouped(h, blk["conv1"]["w"], blk["conv1"]["b"], pop, 1, dtype)
            y, new_state[f"block{i}_conv1_bn"] = _bn_grouped(
                y, blk["conv1_bn"], state[f"block{i}_conv1_bn"], use_bn, pop, train
            )
            y = jax.nn.relu(y)
            y = _conv_grouped(y, blk["conv2"]["w"], blk["conv2"]["b"], pop, 1, dtype)
            y, new_state[f"block{i}_conv2_bn"] = _bn_grouped(
                y, blk["conv2_bn"], state[f"block{i}_conv2_bn"], use_bn, pop, train
            )
        else:
            y = _conv_grouped(h, blk["conv1"]["w"], blk["conv1"]["b"], pop, 1, dtype)
            y = jax.nn.relu(y)
            y, new_state[f"block{i}_conv1_bn"] = _bn_grouped(
                y, blk["conv1_bn"], state[f"block{i}_conv1_bn"], use_bn, pop, train
            )
        y = _maxpool2(y)
        h = jax.nn.relu(y + skip)
        c_out = spec.block_channels[i][1]
        # GAP accumulates in f32; the FC head is tiny and stays f32
        gap = jnp.mean(h.astype(jnp.float32), axis=(1, 2)).reshape(b_sz, pop, c_out)
        exits.append(gap)

    # multi-exit GAP, zero-padded to the widest width, per-model select
    gap_w = spec.gap_width
    gap = jnp.zeros((b_sz, pop, gap_w), jnp.float32)
    for i, e in enumerate(exits):
        padded = jnp.pad(e, ((0, 0), (0, 0), (0, gap_w - e.shape[2])))
        sel = (flags["n_blocks"] == i + 1)[None, :, None]
        gap = jnp.where(sel, padded, gap)

    entry = flags["fc_entry"]
    use_do = flags["use_dropout"]
    if dropout_key is None:
        dropout_key = jax.random.key(0)
    # per-lane streams keyed by genome uid (falls back to lane position).
    # Contract: matches the trainer's vmap path, which folds
    # fold_in(step_key, uid) per lane BEFORE apply_model (trainer.pop_loss);
    # apply_model itself then does split(lane_key, 4). Callers comparing
    # grouped vs vmap(apply_model) directly must perform the same per-lane
    # fold (see tests/test_grouped.py::test_grouped_equals_vmap_forward_with_dropout).
    uids = flags.get("uid")
    if uids is None:
        uids = jnp.arange(pop, dtype=jnp.uint32)
    lane_keys = jax.vmap(lambda u: jax.random.fold_in(dropout_key, u))(uids)
    lane_layer_keys = jax.vmap(lambda k: jax.random.split(k, 4))(lane_keys)
    act = jnp.zeros((b_sz, pop, FC_WIDTHS[0]), jnp.float32)
    for li, units in enumerate(FC_WIDTHS, start=1):
        layer = params["fc"][f"fc{li}"]
        from_gap = jnp.einsum(
            "bpd,pdu->bpu", gap, layer["wg"], preferred_element_type=jnp.float32
        )
        sel = (entry == li)[None, :, None]
        if li == 1:
            z = jnp.where(sel, from_gap, 0.0) + layer["b"][None]
        else:
            from_prev = jnp.einsum(
                "bpd,pdu->bpu", act, layer["wp"],
                preferred_element_type=jnp.float32,
            )
            z = jnp.where(sel, from_gap, from_prev) + layer["b"][None]
        act = jax.nn.relu(z)
        act = _dropout_grouped(
            act, spec.dropout_rate, use_do, train, lane_layer_keys[:, li - 1]
        )

    logits = (
        jnp.einsum(
            "bpd,pdc->bpc", act, params["out"]["w"],
            preferred_element_type=jnp.float32,
        )
        + params["out"]["b"][None]
    )
    # (B, pop, classes) -> (pop, B, classes): the vmap(apply_model) contract
    return jnp.transpose(logits, (1, 0, 2)), new_state
