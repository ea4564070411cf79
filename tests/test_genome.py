"""Genome codec and search-space tests (SURVEY.md §4 unit tier)."""

import random

import numpy as np
import pytest

from cmoop_audio_processing_tpu.core import genome as G
from cmoop_audio_processing_tpu.models import genome_arch as arch


def test_space_size():
    genomes = G.all_genomes()
    assert len(genomes) == 288 == G.SPACE_SIZE
    keys = {G.genome_key(g) for g in genomes}
    assert len(keys) == 288


def test_index_roundtrip():
    for g in G.all_genomes():
        assert G.from_indices(G.to_indices(g)) == g


def test_vector_roundtrip_exact():
    # The MOBO codec contract (mobo_penalty.py:305-338): encode then decode is
    # the identity on all 288 genomes.
    for g in G.all_genomes():
        v = G.to_vector(g)
        assert np.all(v >= 0) and np.all(v <= 1)
        assert G.from_vector(v) == g


def test_vector_decode_rounding():
    # Decoding arbitrary [0,1] vectors rounds to the nearest option index.
    g = G.from_vector([0.49, 0.49, 0.51, 0.76, 0.34, 1.0])
    # filters: round(0.49*2)=1 -> 32; kernel: round(0.49)=0 -> 3;
    # use_bn: round(0.51)=1 -> False; res: round(0.76*2)=2 -> 3;
    # fc: round(0.34*3)=1 -> 2; dropout: round(1.0)=1 -> False
    assert g == {
        "filters": 32,
        "kernel_size": 3,
        "use_bn": False,
        "residual_blocks": 3,
        "fc_layers": 2,
        "use_dropout": False,
    }


def test_random_genome_valid():
    rng = random.Random(0)
    for _ in range(50):
        G.validate(G.random_genome(rng))


def test_perturb_single_gene():
    rng = random.Random(3)
    base = {
        "filters": 32,
        "kernel_size": 3,
        "use_bn": True,
        "residual_blocks": 2,
        "fc_layers": 2,
        "use_dropout": False,
    }
    for _ in range(100):
        p = G.perturb(base, rng)
        diff = [k for k in G.GENE_ORDER if p[k] != base[k]]
        # perturb always changes exactly one gene (sa_nsga_local.py:353-363
        # excludes the current value for non-boolean genes).
        assert len(diff) == 1
        G.validate(p)


# --- Analytic parameter count -------------------------------------------------
# Keras count_params ground truth for template A, computed once with the
# reference's build_model on a (44, 13, 1) input, 10 classes. The analytic
# formula must reproduce Keras exactly (BASELINE size objective parity).

KERAS_TRUTH_A = {
    # (filters, kernel, use_bn, res_blocks, fc_layers): count_params
    # (validated against an independently constructed torch module counting
    # weights + BN buffers, which matches Keras count_params semantics)
    (16, 3, True, 1, 1): 20058,
    (64, 5, False, 3, 4): 13617034,
    (32, 3, False, 2, 2): 322282,
    (16, 5, True, 3, 3): 901402,
}


def manual_count_A(f, k, bn, nb, nfc, classes=10):
    """Independent re-derivation of the Keras parameter count for template A,
    written layer-by-layer (conv k*k*cin*cout + cout; BN 4c incl. moving
    stats; dense in*out + out)."""
    t = 0
    t += k * k * 1 * f + f
    if bn:
        t += 4 * f
    t += k * k * f * f + f
    if bn:
        t += 4 * f
    c = f
    for _ in range(nb):
        t += 1 * 1 * c * (2 * c) + 2 * c
        t += k * k * c * (2 * c) + 2 * c
        if bn:
            t += 4 * 2 * c
        t += k * k * (2 * c) * (2 * c) + 2 * c
        if bn:
            t += 4 * 2 * c
        c *= 2
    d = c
    for units in {1: [64], 2: [128, 64], 3: [256, 128, 64], 4: [512, 256, 128, 64]}[nfc]:
        t += d * units + units
        d = units
    t += d * classes + classes
    return t


@pytest.mark.parametrize("key,expected", sorted(KERAS_TRUTH_A.items()))
def test_param_count_template_a_keras_truth(key, expected):
    f, k, bn, nb, nfc = key
    g = {
        "filters": f,
        "kernel_size": k,
        "use_bn": bn,
        "residual_blocks": nb,
        "fc_layers": nfc,
        "use_dropout": False,
    }
    assert manual_count_A(f, k, bn, nb, nfc) == expected
    assert arch.count_params(g, 10, arch.TEMPLATE_A) == expected


def test_param_count_all_288_matches_manual():
    for g in G.all_genomes():
        expected = manual_count_A(
            g["filters"], g["kernel_size"], g["use_bn"],
            g["residual_blocks"], g["fc_layers"],
        )
        assert arch.count_params(g, 10, arch.TEMPLATE_A) == expected


def test_template_b_fewer_params():
    # Template B has one stem conv and one conv per block, so it is always
    # strictly smaller than template A for the same genome.
    for g in G.all_genomes()[::17]:
        a = arch.count_params(g, 10, arch.TEMPLATE_A)
        b = arch.count_params(g, 10, arch.TEMPLATE_B)
        assert b < a


def test_size_mb():
    g = {
        "filters": 16,
        "kernel_size": 3,
        "use_bn": True,
        "residual_blocks": 1,
        "fc_layers": 1,
        "use_dropout": True,
    }
    assert arch.model_size_mb(g, 10) == pytest.approx(20058 * 4 / 1024 ** 2)


def test_count_fwd_flops_hand_value_and_structure():
    """FLOPs accounting (padded 2*MAC convention — what the MXU executes):
    hand-computed value for a minimal genome, plus structural properties."""
    from cmoop_audio_processing_tpu.models.genome_arch import count_fwd_flops

    g = {"filters": 16, "kernel_size": 3, "use_bn": False,
         "residual_blocks": 1, "fc_layers": 1, "use_dropout": False}
    hw = (44, 13)
    # stem conv: 2*3*3*1*16*44*13
    stem = 2 * 9 * 1 * 16 * 44 * 13
    # stem pool -> (22, 7); block: skip 1x1 s2 at (11, 4), conv 3x3 at (22, 7)
    skip = 2 * 1 * 16 * 32 * 11 * 4
    conv = 2 * 9 * 16 * 32 * 22 * 7
    fc = 2 * 32 * 64 + 2 * 64 * 10  # GAP(32) -> Dense(64) -> Dense(10)
    assert count_fwd_flops(g, hw, 10, "B") == stem + skip + conv + fc

    # template A adds the second stem conv + second block conv
    a = count_fwd_flops(g, hw, 10, "A")
    assert a == (stem + 2 * 9 * 16 * 16 * 44 * 13 + skip + conv
                 + 2 * 9 * 32 * 32 * 22 * 7 + fc)

    # monotone in every compute-affecting gene
    for gene, hi in [("filters", 64), ("kernel_size", 5),
                     ("residual_blocks", 3), ("fc_layers", 4)]:
        big = dict(g, **{gene: hi})
        assert count_fwd_flops(big, hw, 10, "B") > count_fwd_flops(g, hw, 10, "B")
