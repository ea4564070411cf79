"""Exhaustive preset <-> reference-script constants parity.

SURVEY.md §5 ('Config/flag system'): the reference duplicates hand-edited
module constants per script, with deliberate drift between scripts
(MIN_ACCURACY 0.9 vs 0.75, MAX_FPR 0.1 vs 0.09, INFILL_PERCENT 0.2 vs
0.334, ...). Each preset here must reproduce its script's exact constants.
This test AST-extracts every module-level ``UPPER_NAME = <literal>`` from
all 12 scripts and machine-checks the full table (the round-2 review only
spot-checked it), including the inverse direction: a constraint constant
ABSENT from a bi-objective script (they delete the dropped one, e.g.
acc_size_nsga_1.py has no MAX_FPR) must map to ``None`` in the preset.

Also pins that every script compiles with the Keras-default Adam
(optimizer='adam' — the LEARNING_RATE=0.0001 constants are dead code in
every script), so the engine's 1e-3 default is the faithful choice.
"""

import ast
import os
import re

import pytest

from cmoop_audio_processing_tpu.core.config import get_preset
from cmoop_audio_processing_tpu.core.genome import HPARAM_SPACE

REF_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not present"
)

SCRIPTS = {
    "nsga_penalty": "nsga_penalty.py",
    "sa_nsga_penalty": "sa_nsga_penalty.py",
    "mobo_penalty": "mobo_penalty.py",
    "sa_nsga_local": "ablation_study/sa_nsga_local.py",
    "sa_nsga_init": "ablation_study/sa_nsga_init.py",
    "init_sa_nsga_local": "ablation_study/init_sa_nsga_local.py",
    "psi_init_sa_nsga": "ablation_study/psi_init_sa_nsga.py",
    "psi_sa_nsga_local": "ablation_study/psi_sa_nsga_local.py",
    "psi_mobo_2": "ablation_study/psi_mobo_2.py",
    "acc_size_nsga_1": "ablation_study/acc_size_nsga_1.py",
    "acc_fpr_nsga_1": "ablation_study/acc_fpr_nsga_1.py",
    "size_fpr_nsga_1": "ablation_study/size_fpr_nsga_1.py",
}

EA_PRESETS = [n for n in SCRIPTS if "mobo" not in n]
MOBO_PRESETS = [n for n in SCRIPTS if "mobo" in n]


def _constants(script: str):
    with open(os.path.join(REF_DIR, SCRIPTS[script])) as fh:
        tree = ast.parse(fh.read())
    out = {}
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and node.targets[0].id.isupper()
        ):
            try:
                out[node.targets[0].id] = ast.literal_eval(node.value)
            except ValueError:
                pass  # non-literal (path expressions etc.)
    return out


def _check(consts, mapping):
    """mapping: constant name (or (alias, alias)) -> actual preset value.
    Asserts equality for every constant the script defines."""
    for names, actual in mapping:
        if isinstance(names, str):
            names = (names,)
        present = [n for n in names if n in consts]
        if present:
            expected = consts[present[0]]
            assert actual == pytest.approx(expected), (
                f"{present[0]}: preset has {actual!r}, script has {expected!r}"
            )


@pytest.mark.parametrize("name", EA_PRESETS)
def test_ea_preset_constants(name):
    consts = _constants(name)
    cfg = get_preset(name)
    s, t = cfg.search, cfg.train
    _check(consts, [
        ("POP_SIZE", s.pop_size),
        ("MAX_GEN", s.max_gen),
        ("CROSSOVER_PROB", s.crossover_prob),
        ("MUTATION_PROB", s.mutation_prob),
        ("EPSILON", s.epsilon),
        ("INFILL_PERCENT", s.infill_percent),
        ("MIN_ACCURACY", s.constraints.min_accuracy),
        ("MAX_MODEL_SIZE", s.constraints.max_model_size_mb),
        ("MAX_FPR", s.constraints.max_fpr),
        (("LAMBDA_INITIAL", "LAMBDA_START"), s.penalty.lambda_initial),
        (("LAMBDA_FINAL", "LAMBDA_END"), s.penalty.lambda_final),
        ("EPOCHS", t.epochs),
        ("BATCH_SIZE", t.batch_size),
        ("PATIENCE", t.patience),
        ("CLASSES", t.num_classes),
    ])
    # inverse direction: a deleted constraint constant = disabled constraint
    for cname, val in [
        ("MIN_ACCURACY", s.constraints.min_accuracy),
        ("MAX_MODEL_SIZE", s.constraints.max_model_size_mb),
        ("MAX_FPR", s.constraints.max_fpr),
    ]:
        if cname not in consts:
            assert val is None, (
                f"{name} drops {cname} but the preset still enforces {val}"
            )
    if "INFILL_PERCENT" not in consts:
        assert s.infill_percent is None, name


@pytest.mark.parametrize("name", MOBO_PRESETS)
def test_mobo_preset_constants(name):
    consts = _constants(name)
    cfg = get_preset(name)
    m, t = cfg.mobo, cfg.train
    _check(consts, [
        ("INITIAL_SAMPLES", m.initial_samples),
        ("MAX_ITERATIONS", m.max_iterations),
        ("CANDIDATE_BATCH", m.candidate_batch),
        ("MIN_ACCURACY", m.constraints.min_accuracy),
        ("MAX_MODEL_SIZE", m.constraints.max_model_size_mb),
        ("MAX_FPR", m.constraints.max_fpr),
        (("LAMBDA_INITIAL", "LAMBDA_START"), m.penalty.lambda_initial),
        (("LAMBDA_FINAL", "LAMBDA_END"), m.penalty.lambda_final),
        ("EPOCHS", t.epochs),
        ("BATCH_SIZE", t.batch_size),
        ("PATIENCE", t.patience),
        ("CLASSES", t.num_classes),
    ])


@pytest.mark.parametrize("name", sorted(SCRIPTS))
def test_search_space_options_match(name):
    """Wherever a script declares the 6 gene-option lists (either as six
    *_OPTIONS constants or an HPARAM_SPACE dict literal), they must equal
    this package's HPARAM_SPACE exactly."""
    consts = _constants(name)
    option_names = {
        "filters": "FILTER_OPTIONS",
        "kernel_size": "KERNEL_SIZE_OPTIONS",
        "use_bn": "USE_BN_OPTIONS",
        "residual_blocks": "RESIDUAL_BLOCK_OPTIONS",
        "fc_layers": "FC_LAYER_OPTIONS",
        "use_dropout": "USE_DROPOUT_OPTIONS",
    }
    if "HPARAM_SPACE" in consts:
        assert {k: list(v) for k, v in consts["HPARAM_SPACE"].items()} == {
            k: list(v) for k, v in HPARAM_SPACE.items()
        }
    for gene, cname in option_names.items():
        if cname in consts:
            assert list(consts[cname]) == list(HPARAM_SPACE[gene]), gene


@pytest.mark.parametrize("name", sorted(SCRIPTS))
def test_preset_data_shapes(name):
    """Each preset's synthetic-fallback data geometry matches its script's
    dataset: sa_nsga_penalty.py consumes mel_spec.h5 — 11 classes of 5-s
    clips at 40 mels (sa_nsga_penalty.py:38-102), i.e. 501x40 maps at the
     16 kHz / hop-160 / centered framing the frontend reproduces; every
    other script consumes the KWS_10_log_mel_3000 npy dirs (44x13 MFCC-ish
    maps, 10 classes — nsga_penalty.py:157-173)."""
    cfg = get_preset(name)
    d = cfg.data
    if name == "sa_nsga_penalty":
        assert (d.num_classes, d.time_steps, d.features) == (11, 501, 40)
        assert cfg.train.num_classes == 11
    else:
        assert (d.num_classes, d.time_steps, d.features) == (10, 44, 13)
        assert cfg.train.num_classes == 10


@pytest.mark.parametrize("name", sorted(SCRIPTS))
def test_reference_uses_keras_default_adam(name):
    """Every script compiles with optimizer='adam' (string form => Keras
    default lr 1e-3); no script passes its LEARNING_RATE constant to the
    optimizer, so that constant is dead code and the engine's 1e-3 is the
    faithful learning rate."""
    src = open(os.path.join(REF_DIR, SCRIPTS[name])).read()
    assert re.search(r"optimizer\s*=\s*['\"]adam['\"]", src), name
    assert "Adam(" not in src, f"{name} constructs an explicit Adam"
    cfg = get_preset(name)
    assert cfg.train.learning_rate == pytest.approx(1e-3)
