"""PSI stage-1 merge tool tests."""

import pandas as pd
import pytest

from cmoop_audio_processing_tpu.cli.psi_merge import main as merge_main, merge
from cmoop_audio_processing_tpu.core.genome import GENE_ORDER, all_genomes


def _front(genomes, acc):
    return pd.DataFrame(
        [
            {"Accuracy": acc, "Size_MB": 1.0, "FPR": 0.05,
             **{k: g[k] for k in GENE_ORDER}}
            for g in genomes
        ]
    )


def test_merge_concat_and_dedup(tmp_path):
    gs = all_genomes()
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    _front(gs[:3], 0.91).to_csv(a, index=False)
    _front(gs[1:4], 0.93).to_csv(b, index=False)  # overlaps gs[1:3]
    df = merge([str(a), str(b)])
    assert len(df) == 6
    df2 = merge([str(a), str(b)], dedup=True)
    assert len(df2) == 4
    # keep='first': overlapping genomes keep the first file's accuracy
    assert df2.iloc[1]["Accuracy"] == 0.91
    df3 = merge([str(a), str(b)], dedup=True, limit=2)
    assert len(df3) == 2


def test_merge_interleave_balances_fronts(tmp_path):
    gs = all_genomes()
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    c = tmp_path / "c.csv"
    _front(gs[:4], 0.91).to_csv(a, index=False)
    _front(gs[10:14], 0.92).to_csv(b, index=False)
    _front(gs[20:24], 0.93).to_csv(c, index=False)
    df = merge([str(a), str(b), str(c)], limit=6, interleave=True)
    # round-robin: limit=6 keeps TWO rows from EACH front, not 4+2+0
    assert list(df["Accuracy"]) == [0.91, 0.92, 0.93, 0.91, 0.92, 0.93]


def test_merge_skips_empty_fronts(tmp_path):
    gs = all_genomes()
    a = tmp_path / "a.csv"
    empty = tmp_path / "empty.csv"
    zero_rows = tmp_path / "zero.csv"
    _front(gs[:3], 0.91).to_csv(a, index=False)
    # an infeasible stage-1 run writes a columnless file ...
    pd.DataFrame([]).to_csv(empty, index=False)
    # ... or a header-only one
    _front([], 0.9).reindex(columns=["Accuracy", "Size_MB", "FPR", *GENE_ORDER]
                            ).to_csv(zero_rows, index=False)
    df = merge([str(empty), str(a), str(zero_rows)])
    assert len(df) == 3
    with pytest.raises(ValueError, match="no non-empty"):
        merge([str(empty), str(zero_rows)])


def test_merge_missing_column_rejected(tmp_path):
    bad = tmp_path / "bad.csv"
    pd.DataFrame({"Accuracy": [0.9]}).to_csv(bad, index=False)
    with pytest.raises(ValueError, match="missing columns"):
        merge([str(bad)])


def test_merge_cli_roundtrip_into_psi_init(tmp_path):
    from cmoop_audio_processing_tpu.algorithms.initializers import psi_init
    from cmoop_audio_processing_tpu.core.config import Constraints

    gs = all_genomes()[::40][:5]
    a = tmp_path / "a.csv"
    _front(gs, 0.92).to_csv(a, index=False)
    out = tmp_path / "Final.csv"
    assert merge_main([str(a), "--out", str(out)]) == 0
    pop = psi_init(str(out), Constraints(0.9, 2.5, 0.09))
    assert len(pop) == 5
    assert all(p["CV"] == 0 for p in pop)
