"""Masked supernet: one compiled program per (filters, kernel) bucket serves
every genome in that bucket.

The reference builds a fresh Keras graph per candidate and trains serially
(reference: nsga_penalty.py:225-334 template A; sa_nsga_penalty.py:137-177
template B; one `model.fit` per individual). On TPU that wastes the chip: the
XLA-native design compiles ONE program per shape bucket and `vmap`s whole
populations through it. Genes that change tensor shapes quadratically
(``filters``, ``kernel_size``) select the bucket; the remaining genes become
cheap per-individual flags inside the program:

* ``residual_blocks`` — the program executes the bucket's ``max_blocks``
  (the deepest genome actually present — engine/evaluator.py specializes
  this per launch, so a shallow bucket skips the unused blocks entirely);
  a multi-exit GlobalAveragePool reads after block ``n_blocks`` and
  zero-pads the result to the bucket's widest GAP width. Zero-padded lanes
  feed zero-initialized FC rows, so they contribute nothing and receive no
  gradient.
* ``fc_layers`` — the FC stacks are suffixes of [512, 256, 128, 64]
  (nsga_penalty.py:311-316), so a genome with n_fc layers *enters* the fixed
  4-layer chain at layer ``5 - n_fc``; the entry layer reads the GAP vector
  through its own weight matrix, later layers read the previous activation.
* ``use_bn`` / ``use_dropout`` — lane-wise ``jnp.where`` selects between the
  normalized/raw (masked/unmasked) activations.

All flag genes are traced per-individual scalars, so a single jit covers any
mix of the 48 genomes per bucket. Parameter layout, initialization (Glorot
uniform, zero bias — Keras defaults) and BatchNormalization semantics
(momentum 0.99, eps 1e-3, moving stats for eval — Keras defaults) follow the
reference's Keras models so training dynamics are faithful.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.genome import Genome

FC_WIDTHS = (512, 256, 128, 64)  # fixed chain; genomes enter at 5 - n_fc
BN_MOMENTUM = 0.99  # keras BatchNormalization defaults
BN_EPS = 1e-3


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Static shape information for one compiled bucket.

    ``max_blocks`` specializes the program to the deepest genome actually
    present in the bucket (engine/evaluator.py sets it per launch): a bucket
    whose members all have <= 2 residual blocks skips building/executing
    block 3 entirely instead of masking it away. Per-genome PRNG streams
    are prefix-stable across ``max_blocks`` (see ``_init_params_traced``),
    and skipped blocks/GAP rows are exact zeros in the masked design, so a
    genome's training is invariant (up to matmul-tiling ulps) to the
    specialization level."""

    template: str  # "A" | "B"
    filters: int
    kernel: int
    num_classes: int
    dropout_rate: float = 0.3
    compute_dtype: str = "float32"
    max_blocks: int = 3

    @property
    def gap_width(self) -> int:
        return self.filters * 2 ** self.max_blocks

    @property
    def block_channels(self) -> Tuple[Tuple[int, int], ...]:
        f = self.filters
        return tuple(
            (f * 2 ** i, f * 2 ** (i + 1)) for i in range(self.max_blocks)
        )


FLAG_NAMES = ("n_blocks", "fc_entry", "use_bn", "use_dropout", "uid")


def flags_from_genome(genome: Genome) -> Dict[str, np.ndarray]:
    """Per-individual dynamic flags (everything not in the bucket key).

    ``uid`` is a genome-identity hash used to key the per-lane dropout
    stream: a model's training randomness is then a function of (run seed,
    genome) alone — invariant to its position in the population, the bucket's
    padded size, and lane compaction (engine/evaluator.py)."""
    import zlib

    from ..core.genome import genome_key

    return {
        "n_blocks": np.int32(genome["residual_blocks"]),
        "fc_entry": np.int32(5 - genome["fc_layers"]),
        "use_bn": np.bool_(genome["use_bn"]),
        "use_dropout": np.bool_(genome["use_dropout"]),
        "uid": np.uint32(zlib.crc32(str(genome_key(genome)).encode())),
    }


# ---------------------------------------------------------------------------
# Initialization (Keras defaults: glorot_uniform kernels, zero biases,
# BN gamma=1 beta=0, moving_mean=0 moving_var=1)
# ---------------------------------------------------------------------------

def _glorot(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _conv_init(key, k, c_in, c_out):
    fan_in, fan_out = k * k * c_in, k * k * c_out
    return {
        "w": _glorot(key, (k, k, c_in, c_out), fan_in, fan_out),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def _bn_init(c):
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
    }


def _bn_state_init(c):
    return {
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_params(key, spec: BucketSpec, genome: Genome):
    """Parameters + BN state for ONE genome in this bucket. The genome's
    concrete flag genes shape the *initialization* (active FC entry rows get
    correct-fan-in Glorot; unused slots are zeros) while tensor shapes depend
    only on the bucket."""
    f, k = spec.filters, spec.kernel
    n_blocks = int(genome["residual_blocks"])
    n_fc = int(genome["fc_layers"])
    entry = 5 - n_fc
    keys = iter(jax.random.split(key, 32))

    params: Dict = {}
    state: Dict = {}

    params["stem1"] = _conv_init(next(keys), k, 1, f)
    params["stem1_bn"] = _bn_init(f)
    state["stem1_bn"] = _bn_state_init(f)
    if spec.template == "A":
        params["stem2"] = _conv_init(next(keys), k, f, f)
        params["stem2_bn"] = _bn_init(f)
        state["stem2_bn"] = _bn_state_init(f)

    for i in range(3):
        # always CONSUME this block's key slots, even past max_blocks: the
        # per-genome PRNG stream must be identical at every specialization
        # level so a genome's init is invariant to its bucket's max_blocks
        k_skip, k_conv1 = next(keys), next(keys)
        k_conv2 = next(keys) if spec.template == "A" else None
        if i >= spec.max_blocks:
            continue
        c_in, c_out = spec.block_channels[i]
        blk: Dict = {
            "skip": _conv_init(k_skip, 1, c_in, c_out),
            "conv1": _conv_init(k_conv1, k, c_in, c_out),
            "conv1_bn": _bn_init(c_out),
        }
        state[f"block{i}_conv1_bn"] = _bn_state_init(c_out)
        if spec.template == "A":
            blk["conv2"] = _conv_init(k_conv2, k, c_out, c_out)
            blk["conv2_bn"] = _bn_init(c_out)
            state[f"block{i}_conv2_bn"] = _bn_state_init(c_out)
        params[f"block{i}"] = blk

    gap_w = spec.gap_width
    active_gap = f * 2 ** n_blocks  # actual GAP width for this genome
    fc: Dict = {}
    for li, units in enumerate(FC_WIDTHS, start=1):
        layer: Dict = {"b": jnp.zeros((units,), jnp.float32)}
        # gap-input weights: only the entry layer uses them; init active rows
        # with the genome's true fan-in, zero elsewhere.
        wg = jnp.zeros((gap_w, units), jnp.float32)
        if li == entry:
            sub = _glorot(next(keys), (active_gap, units), active_gap, units)
            wg = wg.at[:active_gap].set(sub)
        layer["wg"] = wg
        if li > 1:
            prev = FC_WIDTHS[li - 2]
            if li > entry:
                layer["wp"] = _glorot(next(keys), (prev, units), prev, units)
            else:
                layer["wp"] = jnp.zeros((prev, units), jnp.float32)
        fc[f"fc{li}"] = layer
    params["fc"] = fc
    params["out"] = {
        "w": _glorot(next(keys), (FC_WIDTHS[-1], spec.num_classes), FC_WIDTHS[-1], spec.num_classes),
        "b": jnp.zeros((spec.num_classes,), jnp.float32),
    }
    return params, state


# ---------------------------------------------------------------------------
# Forward pass (single model; vmap over the population outside)
# ---------------------------------------------------------------------------

def _conv2d(x, p, stride=1, dtype=jnp.float32):
    # Mixed precision: parameters live in f32; activations, conv inputs and
    # conv outputs stay in the compute dtype end-to-end (bfloat16 on TPU —
    # the MXU accumulates in f32 internally). The training step is
    # HBM-bandwidth-bound on activation traffic for these TinyML model
    # sizes, so keeping activations 16-bit is the dominant perf lever.
    # preferred_element_type=f32 is avoided deliberately: its conv transpose
    # rule produces mismatched cotangent dtypes under autodiff in this JAX
    # version.
    y = lax.conv_general_dilated(
        x.astype(dtype),
        p["w"].astype(dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(dtype)


def _maxpool2(x):
    # init must be a NUMPY scalar literal: a jnp array init defeats the
    # reduce_window max-pool autodiff pattern match
    return lax.reduce_window(
        x, np.asarray(-np.inf, x.dtype), lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "SAME",
    )


def _bn_apply(x, p, st, use_bn, train):
    """Masked BatchNormalization: returns (maybe-normalized x, new state).
    Batch statistics and running stats are f32 regardless of activation
    dtype; normalization happens in the activation dtype."""
    dtype = x.dtype
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        new_state = {
            "mean": BN_MOMENTUM * st["mean"] + (1 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * st["var"] + (1 - BN_MOMENTUM) * var,
        }
    else:
        mean, var = st["mean"], st["var"]
        new_state = st
    scale = (lax.rsqrt(var + BN_EPS) * p["gamma"]).astype(dtype)
    shift = (p["beta"] - mean * lax.rsqrt(var + BN_EPS) * p["gamma"]).astype(dtype)
    xn = x * scale + shift
    return jnp.where(use_bn, xn, x), new_state


def _dropout(x, rate, use_dropout, train, key):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape).astype(x.dtype) / keep
    return jnp.where(use_dropout, x * mask, x)


def apply_model(
    spec: BucketSpec,
    params: Dict,
    state: Dict,
    flags: Dict,
    x: jnp.ndarray,
    *,
    train: bool,
    dropout_key=None,
):
    """Forward pass for one model. ``flags`` holds traced per-individual
    scalars (n_blocks, fc_entry, use_bn, use_dropout). Returns (logits,
    new_bn_state). Softmax is fused into the loss downstream."""
    dtype = jnp.dtype(spec.compute_dtype)
    use_bn = flags["use_bn"]
    new_state: Dict = {}

    h = _conv2d(x, params["stem1"], dtype=dtype)
    if spec.template == "A":
        # Template A: conv -> BN? -> ReLU, twice (nsga_penalty.py:255-263)
        h, new_state["stem1_bn"] = _bn_apply(h, params["stem1_bn"], state["stem1_bn"], use_bn, train)
        h = jax.nn.relu(h)
        h = _conv2d(h, params["stem2"], dtype=dtype)
        h, new_state["stem2_bn"] = _bn_apply(h, params["stem2_bn"], state["stem2_bn"], use_bn, train)
        h = jax.nn.relu(h)
    else:
        # Template B: conv(relu) -> BN? (sa_nsga_penalty.py:151-152)
        h = jax.nn.relu(h)
        h, new_state["stem1_bn"] = _bn_apply(h, params["stem1_bn"], state["stem1_bn"], use_bn, train)
    h = _maxpool2(h)

    exits = []
    for i in range(spec.max_blocks):
        blk = params[f"block{i}"]
        skip = _conv2d(h, blk["skip"], stride=2, dtype=dtype)
        if spec.template == "A":
            # conv -> BN? -> ReLU -> conv -> BN? -> pool -> add -> ReLU
            y = _conv2d(h, blk["conv1"], dtype=dtype)
            y, new_state[f"block{i}_conv1_bn"] = _bn_apply(
                y, blk["conv1_bn"], state[f"block{i}_conv1_bn"], use_bn, train
            )
            y = jax.nn.relu(y)
            y = _conv2d(y, blk["conv2"], dtype=dtype)
            y, new_state[f"block{i}_conv2_bn"] = _bn_apply(
                y, blk["conv2_bn"], state[f"block{i}_conv2_bn"], use_bn, train
            )
        else:
            # conv(relu) -> BN? -> pool -> add -> ReLU
            y = _conv2d(h, blk["conv1"], dtype=dtype)
            y = jax.nn.relu(y)
            y, new_state[f"block{i}_conv1_bn"] = _bn_apply(
                y, blk["conv1_bn"], state[f"block{i}_conv1_bn"], use_bn, train
            )
        y = _maxpool2(y)
        h = jax.nn.relu(y + skip)
        # GAP accumulates in f32; the FC head is tiny and stays f32
        exits.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))

    # Multi-exit GAP, zero-padded to the widest width
    gap_w = spec.gap_width
    gap = jnp.zeros((x.shape[0], gap_w), jnp.float32)
    for i, e in enumerate(exits):
        padded = jnp.pad(e, ((0, 0), (0, gap_w - e.shape[1])))
        gap = jnp.where(flags["n_blocks"] == i + 1, padded, gap)

    # FC chain entered at layer `fc_entry`
    entry = flags["fc_entry"]
    use_do = flags["use_dropout"]
    if dropout_key is None:
        dropout_key = jax.random.key(0)
    dkeys = jax.random.split(dropout_key, 4)
    act = jnp.zeros((x.shape[0], FC_WIDTHS[0]), jnp.float32)
    for li, units in enumerate(FC_WIDTHS, start=1):
        layer = params["fc"][f"fc{li}"]
        from_gap = gap @ layer["wg"]
        if li == 1:
            z = jnp.where(entry == li, from_gap, 0.0) + layer["b"]
        else:
            z = jnp.where(entry == li, from_gap, act @ layer["wp"]) + layer["b"]
        act = jax.nn.relu(z)
        act = _dropout(act, spec.dropout_rate, use_do, train, dkeys[li - 1])

    logits = act @ params["out"]["w"] + params["out"]["b"]
    return logits, new_state


def _init_params_traced(key, n_blocks, fc_entry, spec: BucketSpec):
    """init_params with the flag genes as TRACED scalars, so one compiled
    program initializes any genome of the bucket.

    Same layer structure and Keras-default distributions as ``init_params``
    (Glorot-uniform kernels with the genome's true fan-in on the FC entry
    layer, zeros elsewhere); the PRNG stream differs (keys are folded per
    layer slot instead of drawn from a sequential iterator, which cannot be
    traced when the entry layer is dynamic). Each genome remains a
    deterministic function of (key, flags).
    """
    f, k = spec.filters, spec.kernel
    kid = iter(range(100))  # static per-layer fold constants

    def nk():
        return jax.random.fold_in(key, next(kid))

    params: Dict = {}
    state: Dict = {}
    params["stem1"] = _conv_init(nk(), k, 1, f)
    params["stem1_bn"] = _bn_init(f)
    state["stem1_bn"] = _bn_state_init(f)
    if spec.template == "A":
        params["stem2"] = _conv_init(nk(), k, f, f)
        params["stem2_bn"] = _bn_init(f)
        state["stem2_bn"] = _bn_state_init(f)

    for i in range(3):
        # always CONSUME this block's fold ids, even past max_blocks: the
        # per-genome PRNG stream must be identical at every specialization
        # level so a genome's init is invariant to its bucket's max_blocks
        k_skip, k_conv1 = nk(), nk()
        k_conv2 = nk() if spec.template == "A" else None
        if i >= spec.max_blocks:
            continue
        c_in, c_out = spec.block_channels[i]
        blk: Dict = {
            "skip": _conv_init(k_skip, 1, c_in, c_out),
            "conv1": _conv_init(k_conv1, k, c_in, c_out),
            "conv1_bn": _bn_init(c_out),
        }
        state[f"block{i}_conv1_bn"] = _bn_state_init(c_out)
        if spec.template == "A":
            blk["conv2"] = _conv_init(k_conv2, k, c_out, c_out)
            blk["conv2_bn"] = _bn_init(c_out)
            state[f"block{i}_conv2_bn"] = _bn_state_init(c_out)
        params[f"block{i}"] = blk

    gap_w = spec.gap_width
    active_gap = f * jnp.left_shift(1, n_blocks)  # f * 2**n_blocks, traced
    fc: Dict = {}
    for li, units in enumerate(FC_WIDTHS, start=1):
        layer: Dict = {"b": jnp.zeros((units,), jnp.float32)}
        # entry layer: Glorot with the genome's true (dynamic) fan-in on the
        # active rows, zeros elsewhere and on non-entry layers. The draw is
        # always at the CANONICAL full width (f*8, the max_blocks=3 GAP) and
        # sliced, so active rows see identical values at every
        # specialization level (a (gap_w, units) draw would not be a prefix
        # of the (f*8, units) draw).
        limit = jnp.sqrt(6.0 / (active_gap.astype(jnp.float32) + units))
        u = jax.random.uniform(nk(), (f * 8, units), jnp.float32, -1.0, 1.0)[
            :gap_w
        ]
        row_active = (jnp.arange(gap_w) < active_gap)[:, None]
        layer["wg"] = jnp.where(
            (li == fc_entry) & row_active, u * limit, 0.0
        )
        if li > 1:
            prev = FC_WIDTHS[li - 2]
            wp = _glorot(nk(), (prev, units), prev, units)
            layer["wp"] = jnp.where(li > fc_entry, wp, 0.0)
        fc[f"fc{li}"] = layer
    params["fc"] = fc
    params["out"] = {
        "w": _glorot(nk(), (FC_WIDTHS[-1], spec.num_classes), FC_WIDTHS[-1],
                     spec.num_classes),
        "b": jnp.zeros((spec.num_classes,), jnp.float32),
    }
    return params, state


@partial(jax.jit, static_argnames=("spec",))
def _init_population_device_jit(keys, n_blocks, fc_entry, spec: BucketSpec):
    return jax.vmap(lambda k_, nb, fe: _init_params_traced(k_, nb, fe, spec))(
        keys, n_blocks, fc_entry
    )


def init_population_device(keys, n_blocks, fc_entry, spec: BucketSpec):
    """Whole-population init as ONE device program (keys/flags stacked with a
    leading pop axis). The unjitted per-genome init costs ~0.7 s of
    host<->device ping-pong per bucket through a remote-TPU tunnel; this is
    a single launch.

    A genome deeper than ``spec.max_blocks`` would silently select an
    all-zero GAP exit (its block never executes), so over-deep populations
    are rejected loudly here when the flags are concrete (traced callers
    keep the raw jit path and must guarantee the contract themselves)."""
    if not isinstance(n_blocks, jax.core.Tracer):
        nb = np.asarray(n_blocks)
        if nb.size and int(nb.max()) > spec.max_blocks:
            raise ValueError(
                f"population has a {int(nb.max())}-block genome but the "
                f"bucket is specialized to max_blocks={spec.max_blocks}"
            )
    return _init_population_device_jit(keys, n_blocks, fc_entry, spec)


def init_population_in_program(base_key, flags: Dict, spec: BucketSpec):
    """Population init as a traceable SUB-function, for fusing into a larger
    program (engine/trainer.py ``run_full`` builds init + the whole training
    loop + final metrics into ONE launch — the per-launch dispatch latency
    through a remote-TPU tunnel makes every extra program ~0.2 s).

    Per-genome keys are folded from the genome-identity ``uid`` flag (crc32
    of the canonical genome key, ``flags_from_genome``), so a genome's
    parameters depend only on (base_key, genome) — bitwise identical to the
    standalone ``init_population_device`` path, which folds the same uid
    values host-side (engine/evaluator.py)."""
    keys = jax.vmap(lambda u: jax.random.fold_in(base_key, u))(flags["uid"])
    return jax.vmap(lambda k_, nb, fe: _init_params_traced(k_, nb, fe, spec))(
        keys, flags["n_blocks"], flags["fc_entry"]
    )


def stack_flags(genomes) -> Dict[str, jnp.ndarray]:
    """Stacked per-lane flag arrays for a (padded) population — the single
    source of truth for the flag layout (FLAG_NAMES)."""
    per = [flags_from_genome(g) for g in genomes]
    return {
        name: jnp.asarray(np.stack([f[name] for f in per]))
        for name in FLAG_NAMES
    }


def init_population_keys(keys, spec: BucketSpec, genomes):
    """init_population with one explicit PRNG key per genome."""
    all_params, all_states = [], []
    for k_i, g in zip(keys, genomes):
        p, s = init_params(k_i, spec, g)
        all_params.append(p)
        all_states.append(s)
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    return stack(all_params), stack(all_states), stack_flags(genomes)


def init_population(key, spec: BucketSpec, genomes):
    """Init a whole (padded) population: stacked params/state pytrees with a
    leading pop axis, plus stacked flag arrays."""
    return init_population_keys(jax.random.split(key, len(genomes)), spec, genomes)
