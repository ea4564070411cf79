"""CLI integration tests (fake evaluator; file-level contracts)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from cmoop_audio_processing_tpu.cli.compare import main as compare_main
from cmoop_audio_processing_tpu.cli.extract_features import main as extract_main
from cmoop_audio_processing_tpu.cli.main import (
    build_parser,
    config_from_args,
    main as cli_main,
)


def test_preset_override_flow():
    args = build_parser().parse_args(
        ["--preset", "sa_nsga_penalty", "--seed", "7", "--max-gen", "4",
         "--pop-size", "6", "--source", "synthetic"]
    )
    cfg = config_from_args(args)
    assert cfg.search.seed == 7
    assert cfg.search.max_gen == 4
    assert cfg.search.pop_size == 6
    assert cfg.search.infill_percent == 0.2  # preserved from preset
    assert cfg.train.template == "B"
    assert cfg.train.launch_seconds_budget == 20.0  # preset default kept
    args2 = build_parser().parse_args(
        ["--preset", "sa_nsga_penalty", "--launch-budget", "8"]
    )
    assert config_from_args(args2).train.launch_seconds_budget == 8.0
    args3 = build_parser().parse_args(
        ["--preset", "sa_nsga_penalty", "--launch-budget", "0"]
    )
    assert config_from_args(args3).train.launch_seconds_budget == 0.0


def test_cli_fake_run_and_resume(tmp_path, capsys):
    argv = ["--fake-eval", "--max-gen", "3", "--pop-size", "6",
            "--out", str(tmp_path), "--seed", "2"]
    assert cli_main(argv, preset="acc_fpr_nsga_1") == 0
    run_dir = tmp_path / "acc_fpr_nsga_1"
    assert (run_dir / "final_pareto.csv").exists()
    assert (run_dir / "checkpoint.json").exists()
    ck = json.loads((run_dir / "checkpoint.json").read_text())
    assert ck["generation"] == 2
    from cmoop_audio_processing_tpu.utils.xlsx import read_xlsx, sheet_names

    wb = str(run_dir / "all_generations.xlsx")
    assert sheet_names(wb) == ["Gen_0", "Gen_1", "Gen_2"]
    # resume with a longer horizon continues from gen 3
    assert cli_main(argv[:2] + ["5"] + argv[3:] + ["--resume"],
                    preset="acc_fpr_nsga_1") == 0
    ck2 = json.loads((run_dir / "checkpoint.json").read_text())
    assert ck2["generation"] == 4
    # pre-resume generations survive in the workbook (a resumed run used to
    # rewrite it with only the post-resume sheets, renumbered from Gen_0)
    assert sheet_names(wb) == [f"Gen_{i}" for i in range(5)]
    rows_gen1 = read_xlsx(wb, "Gen_1")
    assert len(rows_gen1) == 6 and set(rows_gen1["Generation"]) == {1}
    combined = pd.read_csv(run_dir / "all_generations.csv")
    assert sorted(set(combined["Generation"])) == [0, 1, 2, 3, 4]


def test_cli_resume_of_completed_run_keeps_artifacts(tmp_path):
    """--resume on an already-finished run (checkpoint at the last
    generation, loop body skipped) must re-emit the SAME artifacts, not
    clobber the workbook with an empty sheet."""
    from cmoop_audio_processing_tpu.utils.xlsx import read_xlsx, sheet_names

    argv = ["--fake-eval", "--max-gen", "3", "--pop-size", "6",
            "--out", str(tmp_path), "--seed", "2"]
    assert cli_main(argv, preset="acc_size_nsga_1") == 0
    run_dir = tmp_path / "acc_size_nsga_1"
    wb = str(run_dir / "all_generations.xlsx")
    before = {s: read_xlsx(wb, s) for s in sheet_names(wb)}
    assert any(len(df) for df in before.values())  # non-trivial workbook
    final_before = (run_dir / "final_pareto.csv").read_bytes()
    assert cli_main(argv + ["--resume"], preset="acc_size_nsga_1") == 0
    assert sheet_names(wb) == list(before)
    for s, df in before.items():
        pd.testing.assert_frame_equal(read_xlsx(wb, s), df)
    assert (run_dir / "final_pareto.csv").read_bytes() == final_before
    # the suffixed reference-name alias follows the canonical file
    alias = str(run_dir / "all_generations_2_obj.xlsx")
    assert sheet_names(alias) == list(before)


def test_cli_mobo_preset(tmp_path):
    argv = ["--fake-eval", "--max-gen", "2", "--out", str(tmp_path),
            "--seed", "3"]
    assert cli_main(argv, preset="mobo_penalty") == 0
    assert (tmp_path / "mobo_penalty" / "mobo_pareto.csv").exists()


def test_compare_cli(tmp_path, capsys):
    for name in ("a", "b"):
        rng = np.random.default_rng(hash(name) % 100)
        pd.DataFrame(
            {
                "Accuracy": 0.9 + 0.05 * rng.random(5),
                "Size_MB": 0.5 + rng.random(5),
                "FPR": 0.05 * rng.random(5),
            }
        ).to_csv(tmp_path / f"{name}.csv", index=False)
    out = tmp_path / "report.json"
    rc = compare_main(
        [
            "--front", f"A={tmp_path/'a.csv'}",
            "--front", f"B={tmp_path/'b.csv'}",
            "--out", str(out),
        ]
    )
    assert rc == 0
    rep = json.loads(out.read_text())
    assert set(rep["hypervolume"]) == {"A", "B"}
    text = capsys.readouterr().out
    assert "Hypervolume (A):" in text
    assert "Coverage (C-Metric):" in text


def test_compare_cli_rank_emits_reference_xlsx(tmp_path, capsys):
    """--rank writes the notebook's literal artifact (ranked_<name>.xlsx,
    Tchebycheff s_rank.ipynb output_file) alongside the CSV, as a real
    workbook readable by the stdlib reader."""
    from cmoop_audio_processing_tpu.utils.xlsx import read_xlsx

    pd.DataFrame(
        {"Accuracy": [0.95, 0.91], "Size_MB": [1.0, 0.4], "FPR": [0.02, 0.05]}
    ).to_csv(tmp_path / "m.csv", index=False)
    rc = compare_main(
        ["--front", f"MOBO={tmp_path/'m.csv'}",
         "--out", str(tmp_path / "rep.json"), "--rank"]
    )
    assert rc == 0
    ranked = read_xlsx(str(tmp_path / "ranked_MOBO.xlsx"), "Sheet1")
    assert list(ranked["Rank"]) == sorted(ranked["Rank"])
    csv_ranked = pd.read_csv(tmp_path / "ranked_MOBO.csv")
    assert ranked["Tchebycheff Score"].tolist() == pytest.approx(
        csv_ranked["Tchebycheff Score"].tolist()
    )


def test_cli_emits_reference_literal_artifact_names(tmp_path):
    """Each script names its final artifacts with its own suffix
    (final_pareto_2_obj.csv acc_size_nsga_1.py:555, all_generations_2_obj
    .xlsx :528, ...); the CLI emits those literal names alongside the
    canonical ones."""
    import filecmp

    from cmoop_audio_processing_tpu.cli.main import main as cli_main

    rc = cli_main(
        ["--preset", "acc_size_nsga_1", "--fake-eval", "--max-gen", "3",
         "--pop-size", "6", "--out", str(tmp_path)]
    )
    assert rc == 0
    d = tmp_path / "acc_size_nsga_1"
    assert (d / "final_pareto.csv").exists()
    assert filecmp.cmp(d / "final_pareto.csv", d / "final_pareto_2_obj.csv")
    assert filecmp.cmp(
        d / "all_generations.xlsx", d / "all_generations_2_obj.xlsx"
    )


def test_extract_features_cli(tmp_path):
    from cmoop_audio_processing_tpu.frontend.audio_io import save_wav

    rng = np.random.default_rng(0)
    for cls in ("yes", "no"):
        d = tmp_path / "wavs" / cls
        d.mkdir(parents=True)
        for i in range(6):
            freq = 300 if cls == "yes" else 900
            t = np.arange(8000) / 16000
            y = 0.4 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(8000)
            save_wav(str(d / f"{i}.wav"), y.astype(np.float32), 16000)

    out = tmp_path / "npy"
    rc = extract_main(
        ["--wav-dir", str(tmp_path / "wavs"), "--out", str(out),
         "--layout", "npy", "--duration", "0.5", "--split", "0.5", "0.25", "0.25"]
    )
    assert rc == 0
    x = np.load(out / "X_train.npy")
    y = np.load(out / "y_train.npy")
    assert x.shape == (6, 51, 40)  # 0.5s @ hop 160 -> 51 frames, 40 mels
    assert set(np.unique(y)) <= {0, 1}

    # batch=1 over 12 clips pushes the pipelined loop past its 8-batch
    # in-flight window (the mid-loop host materialization path); chunking
    # must not change the emitted features
    out_b1 = tmp_path / "npy_b1"
    rc = extract_main(
        ["--wav-dir", str(tmp_path / "wavs"), "--out", str(out_b1),
         "--layout", "npy", "--duration", "0.5", "--batch", "1",
         "--split", "0.5", "0.25", "0.25"]
    )
    assert rc == 0
    np.testing.assert_array_equal(np.load(out_b1 / "X_train.npy"), x)

    # the emitted layout round-trips through the standard data pipeline
    from cmoop_audio_processing_tpu.core.config import DataConfig
    from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset

    data = prepare_dataset(DataConfig(source="npy", path=str(out)))
    assert data["x_train"].shape[-1] == 1


def test_every_preset_runs(tmp_path):
    """All 12 reference-script presets execute end-to-end on the fake
    evaluator and emit their final front artifact."""
    from cmoop_audio_processing_tpu.core.config import PRESETS
    import pandas as pd
    from cmoop_audio_processing_tpu.core.genome import GENE_ORDER, all_genomes

    # PSI presets need a stage-1 seed file
    seed_rows = [
        {"Accuracy": 0.93, "Size_MB": 1.2, "FPR": 0.05,
         **{k: g[k] for k in GENE_ORDER}}
        for g in all_genomes()[::50][:5]
    ]
    seed_file = tmp_path / "Final.csv"
    pd.DataFrame(seed_rows).to_csv(seed_file, index=False)

    for preset in sorted(PRESETS):
        argv = ["--fake-eval", "--max-gen", "2", "--pop-size", "5",
                "--out", str(tmp_path / "runs"), "--seed", "1"]
        if preset.startswith("psi"):
            argv += ["--psi-seed-file", str(seed_file)]
        assert cli_main(argv, preset=preset) == 0, preset
        run_dir = tmp_path / "runs" / preset
        front = "mobo_pareto.csv" if PRESETS[preset].algorithm == "mobo" else "final_pareto.csv"
        assert (run_dir / front).exists(), preset
        assert (run_dir / "progress.jsonl").exists(), preset
