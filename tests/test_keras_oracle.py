"""Independent oracle: execute the REFERENCE's own Keras ``build_model``
(extracted from /root/reference at test runtime — never copied into this
repo) for every genome x template and hold our analytic architecture
accounting (models/genome_arch.py) to it.

This replaces the four hardcoded "validated off-line" constants of round 1
with the real thing: Keras ``count_params()`` is the size objective's ground
truth (nsga_penalty.py:337-344), and the per-layer weight shapes pin the
structure our masked supernet's active slices must realize.

Skipped when tensorflow or the reference checkout is unavailable.
"""

import ast
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF_DIR = "/root/reference"
NUM_CLASSES = 10
INPUT_HW = (44, 13)  # the reference's GSC-v2 MFCC map (SURVEY.md §3.1)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not present"
)


def _extract_build_model(path: str):
    """Pull the reference's ``build_model`` out of a script that has
    side-effecting top-level code (data loading, the search itself), exec
    only the function def, and supply the module globals it closes over."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "build_model"
    )
    from tensorflow.keras import Model, layers

    ns = {
        "layers": layers,
        "Model": Model,
        # build_model reads X_train only for the input shape
        "X_train": np.zeros((1,) + INPUT_HW, np.float32),
        "CLASSES": NUM_CLASSES,
    }
    exec(compile(ast.Module([fn], type_ignores=[]), path, "exec"), ns)
    return ns["build_model"]


@pytest.fixture(scope="module")
def builders():
    return {
        "A": _extract_build_model(os.path.join(REF_DIR, "nsga_penalty.py")),
        "B": _extract_build_model(os.path.join(REF_DIR, "sa_nsga_penalty.py")),
    }


def _expected_weight_shapes(g, template):
    """Per-layer weight shapes the genome's concrete architecture must have,
    derived from the same layer walk the supernet's active slices follow
    (models/supernet.py init_params with flag genes applied)."""
    from cmoop_audio_processing_tpu.core.genome import FC_CONFIGS

    f, k = g["filters"], g["kernel_size"]
    bn = g["use_bn"]
    shapes = []

    def conv(k_, cin, cout):
        shapes.append((k_, k_, cin, cout))
        shapes.append((cout,))

    def bn_layer(c):
        shapes.extend([(c,)] * 4)  # gamma, beta, moving_mean, moving_var

    conv(k, 1, f)
    if bn:
        bn_layer(f)
    if template == "A":
        conv(k, f, f)
        if bn:
            bn_layer(f)
    c = f
    for _ in range(g["residual_blocks"]):
        c2 = 2 * c
        conv(1, c, c2)  # skip projection
        conv(k, c, c2)
        if bn:
            bn_layer(c2)
        if template == "A":
            conv(k, c2, c2)
            if bn:
                bn_layer(c2)
        c = c2
    d = c
    for units in FC_CONFIGS[g["fc_layers"]]:
        shapes.append((d, units))
        shapes.append((units,))
        d = units
    shapes.append((d, NUM_CLASSES))
    shapes.append((NUM_CLASSES,))
    return sorted(shapes)


@pytest.mark.parametrize("template", ["A", "B"])
def test_count_params_matches_keras_all_288(builders, template):
    """Analytic count_params == the reference model's count_params for the
    ENTIRE 288-genome space, and size_mb matches to float equality."""
    from cmoop_audio_processing_tpu.core.genome import all_genomes
    from cmoop_audio_processing_tpu.models.genome_arch import (
        count_params,
        model_size_mb,
    )

    mismatches = []
    for g in all_genomes():
        model = builders[template](g)
        keras_n = int(model.count_params())
        ours = count_params(g, NUM_CLASSES, template)
        if keras_n != ours:
            mismatches.append((g, keras_n, ours))
        else:
            assert model_size_mb(g, NUM_CLASSES, template) == keras_n * 4 / 2**20
        tf.keras.backend.clear_session()
    assert not mismatches, f"{len(mismatches)} genomes disagree: {mismatches[:3]}"


@pytest.mark.parametrize("template", ["A", "B"])
def test_per_layer_shapes_match_keras(builders, template):
    """Per-layer weight-shape multiset agreement on a diverse genome slice
    (every gene takes both/all values across the slice)."""
    from cmoop_audio_processing_tpu.core.genome import all_genomes

    genomes = all_genomes()
    sample = [genomes[i * 37 % len(genomes)] for i in range(16)]
    for g in sample:
        model = builders[template](g)
        keras_shapes = sorted(
            tuple(int(d) for d in w.shape) for w in model.weights
        )
        assert keras_shapes == _expected_weight_shapes(g, template), g
        tf.keras.backend.clear_session()


def test_init_sa_nsga_local_unpack_defect():
    """Pin the reference defect documented in PARITY.md 'Known deviations':
    init_sa_nsga_local.py:105-106 unpacks the genome from
    sorted(HPARAM_SPACE.keys()), assigning filters <- fc_layers (1-4 conv
    filters) and num_fc <- filters (16/32/64, never a key of fc_configs, so
    the FC stack is silently dropped at :124). Executing the reference's own
    build_model proves the crippled architecture is the reference's
    behavior — the corrected template-B mapping used by the
    `init_sa_nsga_local` preset here is a deliberate divergence."""
    from cmoop_audio_processing_tpu.core.genome import HPARAM_SPACE

    path = os.path.join(REF_DIR, "ablation_study", "init_sa_nsga_local.py")
    with open(path) as fh:
        tree = ast.parse(fh.read())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "build_model"
    )
    from tensorflow.keras import Model, layers

    ns = {
        "layers": layers,
        "Model": Model,
        "X_train": np.zeros((1,) + INPUT_HW, np.float32),
        "CLASSES": NUM_CLASSES,
        # the same 6-gene space; build_model reads it only for sorted keys
        "HPARAM_SPACE": dict(HPARAM_SPACE),
    }
    exec(compile(ast.Module([fn], type_ignores=[]), path, "exec"), ns)

    g = {"filters": 64, "kernel_size": 3, "use_bn": False,
         "residual_blocks": 1, "fc_layers": 2, "use_dropout": False}
    model = ns["build_model"](g)

    convs = [l for l in model.layers if isinstance(l, layers.Conv2D)]
    denses = [l for l in model.layers if isinstance(l, layers.Dense)]
    # stem got the fc_layers gene (2 filters), not filters (64)
    assert convs[0].filters == g["fc_layers"]
    # the entire FC stack vanished: only the softmax head remains
    assert len(denses) == 1 and denses[0].units == NUM_CLASSES
    tf.keras.backend.clear_session()
