"""Supernet correctness: masking invariances and exact equivalence against a
direct (mask-free) re-implementation of the reference architectures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmoop_audio_processing_tpu.models.supernet import (
    BucketSpec,
    apply_model,
    flags_from_genome,
    init_params,
)


def mk_genome(f=16, k=3, bn=True, nb=2, nfc=2, do=False):
    return {
        "filters": f,
        "kernel_size": k,
        "use_bn": bn,
        "residual_blocks": nb,
        "fc_layers": nfc,
        "use_dropout": do,
    }


def fwd(spec, params, state, genome, x, train=False):
    flags = {k: jnp.asarray(v) for k, v in flags_from_genome(genome).items()}
    logits, new_state = apply_model(
        spec, params, state, flags, x, train=train, dropout_key=jax.random.key(0)
    )
    return np.asarray(logits), new_state


# ---------------------------------------------------------------------------
# Direct reference implementation (no masking): builds exactly the genome's
# architecture from the supernet's parameter slices.
# ---------------------------------------------------------------------------

def direct_model(spec, params, state, genome, x):
    from jax import lax

    def conv(x, p, stride=1):
        y = lax.conv_general_dilated(
            x, p["w"], (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + p["b"]

    def pool(x):
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
        )

    def bn(x, p, st):
        return (x - st["mean"]) * jax.lax.rsqrt(st["var"] + 1e-3) * p["gamma"] + p["beta"]

    use_bn = genome["use_bn"]
    h = conv(x, params["stem1"])
    if spec.template == "A":
        if use_bn:
            h = bn(h, params["stem1_bn"], state["stem1_bn"])
        h = jax.nn.relu(h)
        h = conv(h, params["stem2"])
        if use_bn:
            h = bn(h, params["stem2_bn"], state["stem2_bn"])
        h = jax.nn.relu(h)
    else:
        h = jax.nn.relu(h)
        if use_bn:
            h = bn(h, params["stem1_bn"], state["stem1_bn"])
    h = pool(h)

    for i in range(genome["residual_blocks"]):
        blk = params[f"block{i}"]
        skip = conv(h, blk["skip"], stride=2)
        if spec.template == "A":
            y = conv(h, blk["conv1"])
            if use_bn:
                y = bn(y, blk["conv1_bn"], state[f"block{i}_conv1_bn"])
            y = jax.nn.relu(y)
            y = conv(y, blk["conv2"])
            if use_bn:
                y = bn(y, blk["conv2_bn"], state[f"block{i}_conv2_bn"])
        else:
            y = conv(h, blk["conv1"])
            y = jax.nn.relu(y)
            if use_bn:
                y = bn(y, blk["conv1_bn"], state[f"block{i}_conv1_bn"])
        y = pool(y)
        h = jax.nn.relu(y + skip)

    gap = jnp.mean(h, axis=(1, 2))  # true (unpadded) GAP width
    entry = 5 - genome["fc_layers"]
    act = None
    for li in range(entry, 5):
        layer = params["fc"][f"fc{li}"]
        if li == entry:
            z = gap @ layer["wg"][: gap.shape[1]] + layer["b"]
        else:
            z = act @ layer["wp"] + layer["b"]
        act = jax.nn.relu(z)
    return np.asarray(act @ params["out"]["w"] + params["out"]["b"])


GENOMES = [
    mk_genome(16, 3, True, 3, 4, False),   # full config
    mk_genome(16, 3, False, 1, 1, False),  # smallest
    mk_genome(16, 3, True, 2, 3, False),
    mk_genome(16, 3, False, 3, 2, False),
    mk_genome(16, 5, True, 1, 4, False),
]


@pytest.mark.parametrize("template", ["A", "B"])
@pytest.mark.parametrize("gi", range(len(GENOMES)))
def test_supernet_equals_direct_model(template, gi):
    g = GENOMES[gi]
    spec = BucketSpec(template=template, filters=g["filters"], kernel=g["kernel_size"], num_classes=7)
    params, state = init_params(jax.random.key(gi), spec, g)
    x = jax.random.normal(jax.random.key(100 + gi), (5, 20, 9, 1))
    got, _ = fwd(spec, params, state, g, x, train=False)
    want = direct_model(spec, params, state, g, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_unused_block_params_do_not_affect_output():
    g = mk_genome(nb=1, nfc=1)
    spec = BucketSpec("A", 16, 3, 7)
    params, state = init_params(jax.random.key(0), spec, g)
    x = jax.random.normal(jax.random.key(1), (4, 20, 9, 1))
    base, _ = fwd(spec, params, state, g, x)
    # scramble blocks 1-2 and fc1-3: output must not change (n_blocks=1 exits
    # after block 0; n_fc=1 enters at fc4)
    scrambled = jax.tree.map(lambda a: a, params)
    for name in ("block1", "block2"):
        scrambled[name] = jax.tree.map(
            lambda a: a + 3.0, scrambled[name]
        )
    for name in ("fc1", "fc2", "fc3"):
        scrambled["fc"][name] = jax.tree.map(
            lambda a: a + 2.0, scrambled["fc"][name]
        )
    got, _ = fwd(spec, scrambled, state, g, x)
    np.testing.assert_allclose(got, base, rtol=1e-6)


def test_bn_disabled_ignores_bn_params():
    g = mk_genome(bn=False)
    spec = BucketSpec("A", 16, 3, 7)
    params, state = init_params(jax.random.key(0), spec, g)
    x = jax.random.normal(jax.random.key(1), (4, 20, 9, 1))
    base, _ = fwd(spec, params, state, g, x)
    scrambled = {k: v for k, v in params.items()}
    for k in list(scrambled):
        if k.endswith("_bn"):
            scrambled[k] = jax.tree.map(lambda a: a * 5 + 1, scrambled[k])
    got, _ = fwd(spec, scrambled, state, g, x)
    np.testing.assert_allclose(got, base, rtol=1e-6)


def test_dropout_train_vs_eval():
    g = mk_genome(do=True)
    spec = BucketSpec("A", 16, 3, 7, dropout_rate=0.5)
    params, state = init_params(jax.random.key(0), spec, g)
    x = jax.random.normal(jax.random.key(1), (4, 20, 9, 1))
    eval1, _ = fwd(spec, params, state, g, x, train=False)
    eval2, _ = fwd(spec, params, state, g, x, train=False)
    np.testing.assert_allclose(eval1, eval2)  # eval is deterministic
    flags = {k: jnp.asarray(v) for k, v in flags_from_genome(g).items()}
    t1, _ = apply_model(spec, params, state, flags, x, train=True, dropout_key=jax.random.key(7))
    t2, _ = apply_model(spec, params, state, flags, x, train=True, dropout_key=jax.random.key(8))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))  # dropout active


def test_bn_state_updates_in_train_mode():
    g = mk_genome(bn=True)
    spec = BucketSpec("A", 16, 3, 7)
    params, state = init_params(jax.random.key(0), spec, g)
    x = jax.random.normal(jax.random.key(1), (8, 20, 9, 1)) * 3 + 1
    flags = {k: jnp.asarray(v) for k, v in flags_from_genome(g).items()}
    _, new_state = apply_model(spec, params, state, flags, x, train=True, dropout_key=jax.random.key(0))
    # moving mean moved toward the batch mean (momentum 0.99)
    assert not np.allclose(
        np.asarray(new_state["stem1_bn"]["mean"]),
        np.asarray(state["stem1_bn"]["mean"]),
    )
    _, eval_state = apply_model(spec, params, state, flags, x, train=False)
    # eval mode leaves state untouched
    np.testing.assert_allclose(
        np.asarray(eval_state["stem1_bn"]["mean"]),
        np.asarray(state["stem1_bn"]["mean"]),
    )


def test_vmap_population_matches_individual():
    from cmoop_audio_processing_tpu.models.supernet import init_population

    spec = BucketSpec("A", 16, 3, 7)
    genomes = GENOMES[:4]
    params, state, flags = init_population(jax.random.key(5), spec, genomes)
    x = jax.random.normal(jax.random.key(6), (3, 20, 9, 1))
    vlogits = jax.vmap(
        lambda p, s, f: apply_model(spec, p, s, f, x, train=False)[0]
    )(params, state, flags)
    for i, g in enumerate(genomes):
        p_i = jax.tree.map(lambda a: a[i], params)
        s_i = jax.tree.map(lambda a: a[i], state)
        solo, _ = fwd(spec, p_i, s_i, g, x)
        np.testing.assert_allclose(np.asarray(vlogits)[i], solo, rtol=2e-5, atol=2e-5)


def test_init_population_device_structure_and_masking():
    """The one-launch device init matches init_params' structure and masking
    semantics: identical pytree, zero rows outside the active GAP slice,
    Glorot-scale entry rows, zero wp below the entry layer, determinism."""
    from cmoop_audio_processing_tpu.models.supernet import (
        flags_from_genome,
        init_population_device,
        init_params,
    )

    spec = BucketSpec("A", 16, 3, 7)
    genomes = GENOMES[:4]
    keys = jnp.stack([jax.random.key(i) for i in range(4)])
    nb = jnp.asarray([g["residual_blocks"] for g in genomes], jnp.int32)
    fe = jnp.asarray([5 - g["fc_layers"] for g in genomes], jnp.int32)
    params, state = init_population_device(keys, nb, fe, spec)

    ref_p, ref_s = init_params(jax.random.key(0), spec, genomes[0])
    assert jax.tree.structure(jax.tree.map(lambda a: a[0], params)) == \
        jax.tree.structure(ref_p)
    assert jax.tree.structure(jax.tree.map(lambda a: a[0], state)) == \
        jax.tree.structure(ref_s)

    for i, g in enumerate(genomes):
        entry = 5 - g["fc_layers"]
        active_gap = g["filters"] * 2 ** g["residual_blocks"]
        for li, units in enumerate((512, 256, 128, 64), start=1):
            wg = np.asarray(params["fc"][f"fc{li}"]["wg"][i])
            if li == entry:
                assert np.abs(wg[:active_gap]).max() > 0
                np.testing.assert_array_equal(wg[active_gap:], 0.0)
                limit = np.sqrt(6.0 / (active_gap + units))
                assert np.abs(wg).max() <= limit + 1e-6
            else:
                np.testing.assert_array_equal(wg, 0.0)
            if li > 1:
                wp = np.asarray(params["fc"][f"fc{li}"]["wp"][i])
                if li > entry:
                    assert np.abs(wp).max() > 0
                else:
                    np.testing.assert_array_equal(wp, 0.0)

    # deterministic: same keys + flags -> bitwise identical population
    params2, _ = init_population_device(keys, nb, fe, spec)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params2)


@pytest.mark.parametrize("template", ["A", "B"])
def test_max_blocks_specialization_is_invisible(template):
    """A bucket specialized to its deepest genome (BucketSpec.max_blocks)
    must produce the SAME models as the full 3-block program: init streams
    are prefix-stable (key slots for skipped blocks still consumed; FC gap
    weights drawn at canonical width and sliced) and the masked design makes
    skipped blocks exact zeros — so logits match bitwise in f32."""
    from cmoop_audio_processing_tpu.models.grouped import apply_population
    from cmoop_audio_processing_tpu.models.supernet import (
        init_population_device,
        stack_flags,
    )

    genomes = [mk_genome(nb=2, nfc=2), mk_genome(nb=1, nfc=4, bn=False)]
    flags = stack_flags(genomes)
    keys = jnp.stack([jax.random.key(7), jax.random.key(9)])
    s3 = BucketSpec(template, 16, 3, 7, compute_dtype="float32")
    s2 = BucketSpec(template, 16, 3, 7, compute_dtype="float32", max_blocks=2)
    p3, st3 = init_population_device(keys, flags["n_blocks"], flags["fc_entry"], s3)
    p2, st2 = init_population_device(keys, flags["n_blocks"], flags["fc_entry"], s2)

    # init prefix-stability: all shared conv/bn leaves identical; FC gap
    # weights are the first gap_width rows of the canonical draw
    assert "block2" not in p2 and "block2" in p3
    for name in [k for k in p2 if k not in ("fc",)]:
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            p3[name], p2[name],
        )
    for li in range(1, 5):
        np.testing.assert_array_equal(
            np.asarray(p2["fc"][f"fc{li}"]["wg"]),
            np.asarray(p3["fc"][f"fc{li}"]["wg"])[:, : s2.gap_width, :],
        )

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 16, 8, 1)), jnp.float32
    )
    lv3 = jax.vmap(
        lambda p, s, f: apply_model(s3, p, s, f, x, train=False)[0]
    )(p3, st3, flags)
    lv2 = jax.vmap(
        lambda p, s, f: apply_model(s2, p, s, f, x, train=False)[0]
    )(p2, st2, flags)
    np.testing.assert_array_equal(np.asarray(lv2), np.asarray(lv3))

    # grouped-conv path honors the specialization too
    lg2, _ = apply_population(s2, p2, st2, flags, x, train=False)
    np.testing.assert_allclose(
        np.asarray(lg2), np.asarray(lv2), rtol=2e-5, atol=2e-5
    )
