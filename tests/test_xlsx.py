"""Stdlib .xlsx writer/reader tests — the literal artifact-format parity
layer (reference: all_generations.xlsx nsga_penalty.py:785-788, Final.xlsx
psi_init_sa_nsga.py:365-379). This image has no Excel engine, so these tests
run the branches that actually execute in production here."""

import zipfile

import numpy as np
import pandas as pd
import pytest

from cmoop_audio_processing_tpu.core.config import Constraints
from cmoop_audio_processing_tpu.core.genome import GENE_ORDER, all_genomes
from cmoop_audio_processing_tpu.utils.xlsx import (
    read_xlsx,
    sheet_names,
    write_xlsx,
)


def _mixed_df():
    return pd.DataFrame(
        {
            "name": ["alpha", "beta & <gamma>", ""],
            "count": [1, 22, 333],
            "score": [0.5, -1.25, 3.0],
            "flag": [True, False, True],
        }
    )


def test_roundtrip_types(tmp_path):
    df = _mixed_df()
    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, df)
    back = read_xlsx(path)
    assert list(back.columns) == list(df.columns)
    assert back["name"].tolist() == df["name"].fillna("").tolist()
    assert back["count"].tolist() == df["count"].tolist()
    assert back["score"].tolist() == df["score"].tolist()
    assert back["flag"].tolist() == df["flag"].tolist()
    # ints survive as exact ints, not floats (genome columns depend on it)
    assert all(isinstance(v, (int, np.integer)) for v in back["count"])


def test_roundtrip_nan_becomes_blank(tmp_path):
    df = pd.DataFrame({"a": [1.0, float("nan")], "b": ["x", "y"]})
    path = str(tmp_path / "nan.xlsx")
    write_xlsx(path, df)
    back = read_xlsx(path)
    assert back["a"][0] == 1.0
    assert pd.isna(back["a"][1])


def test_multi_sheet_by_index_and_name(tmp_path):
    path = str(tmp_path / "multi.xlsx")
    write_xlsx(
        path,
        [("Gen_0", pd.DataFrame({"x": [1]})), ("Gen_1", pd.DataFrame({"x": [2]}))],
    )
    assert sheet_names(path) == ["Gen_0", "Gen_1"]
    assert read_xlsx(path, 1)["x"].tolist() == [2]
    assert read_xlsx(path, "Gen_1")["x"].tolist() == [2]
    with pytest.raises(ValueError, match="no sheet named"):
        read_xlsx(path, "Gen_9")


def test_roundtrip_fuzz_unicode_and_extremes(tmp_path):
    """Randomized round-trip: unicode text (incl. XML-special chars and
    non-BMP emoji), extreme/denormal floats, and negative/large ints must
    survive write->read bitwise (floats via repr round-trip)."""
    rng = np.random.default_rng(7)
    alphabet = list("abc<>&\"' \t𝛼中ß€😀\n") + ["&amp;", "]]>"]
    for trial in range(5):
        n = int(rng.integers(1, 9))
        text = [
            "".join(rng.choice(alphabet, size=rng.integers(0, 12)))
            for _ in range(n)
        ]
        floats = rng.choice(
            [0.0, -0.0, 1e-308, -1e308, 3.141592653589793, 1e300], size=n
        ) * (1 + rng.random(n))
        ints = rng.integers(-(2**62), 2**62, size=n)
        df = pd.DataFrame({"t": text, "f": floats, "i": ints})
        path = str(tmp_path / f"fuzz{trial}.xlsx")
        write_xlsx(path, {"S": df})
        back = read_xlsx(path, "S")
        assert back["t"].fillna("").tolist() == text
        assert back["f"].tolist() == list(floats)
        # exact-int comparison: values near 2**62 exceed float53 precision,
        # so the read side must parse them via int(), not float()
        assert [int(v) for v in back["i"]] == [int(v) for v in ints]


def test_roundtrip_large_ints_exact(tmp_path):
    """Integers beyond 2**53 must survive bitwise — float parsing would
    silently round them to the nearest representable double."""
    vals = [2**62 + 1, -(2**62 + 3), 2**53 + 1, 10**19]
    df = pd.DataFrame({"i": vals})
    path = str(tmp_path / "big.xlsx")
    write_xlsx(path, df)
    back = read_xlsx(path)
    assert [int(v) for v in back["i"]] == vals
    assert all(int(v) - ref == 0 for v, ref in zip(back["i"], vals))


def test_roundtrip_mixed_dtype_frame_keeps_int_columns_exact(tmp_path):
    """A frame mixing float and int columns must keep the int column exact:
    the writer iterates rows with per-column dtypes (df.itertuples), because
    df.values would upcast the whole frame to float64 and round ints beyond
    2**53 before they ever reach the cell serializer."""
    df = pd.DataFrame({
        "f": [float("inf"), 0.5, float("nan")],
        "i": [2**62 + 1, -(2**62 + 3), 7],
        "s": ["a", "b", "c"],
    })
    path = str(tmp_path / "mixed.xlsx")
    write_xlsx(path, df)
    back = read_xlsx(path)
    assert [int(v) for v in back["i"]] == [2**62 + 1, -(2**62 + 3), 7]
    assert back["f"].iloc[0] == float("inf") and back["f"].iloc[1] == 0.5
    assert pd.isna(back["f"].iloc[2])
    assert back["s"].tolist() == ["a", "b", "c"]


def test_roundtrip_infinities_spec_conformant(tmp_path):
    """Non-finite floats serialize as the xsd:double spellings INF/-INF
    (Python's 'inf' repr is not valid OOXML) and read back as infinities."""
    df = pd.DataFrame({"f": [float("inf"), float("-inf"), 1.5]})
    path = str(tmp_path / "inf.xlsx")
    write_xlsx(path, df)
    with zipfile.ZipFile(path) as zf:
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    assert "<v>INF</v>" in sheet and "<v>-INF</v>" in sheet
    assert "<v>inf</v>" not in sheet
    back = read_xlsx(path)
    assert back["f"].tolist() == [float("inf"), float("-inf"), 1.5]


def test_sheet_names_default_for_nameless_sheet(tmp_path):
    """A <sheet> element without a name attribute gets Sheet{position}
    counted over SHEETS, not over every XML element in the workbook part."""
    path = str(tmp_path / "nameless.xlsx")
    write_xlsx(path, [("X", pd.DataFrame({"a": [1]}))])
    import re as _re

    with zipfile.ZipFile(path) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    parts["xl/workbook.xml"] = _re.sub(
        rb'name="X" ', b"", parts["xl/workbook.xml"]
    )
    with zipfile.ZipFile(path, "w") as zf:
        for n, data in parts.items():
            zf.writestr(n, data)
    assert sheet_names(path) == ["Sheet1"]


def test_sheet_name_with_quotes_and_angles(tmp_path):
    """Sheet names land in an XML attribute: quotes and angle brackets must
    be escaped or the workbook part is malformed."""
    path = str(tmp_path / "quoted.xlsx")
    name = 'Q3 "final" <draft>'
    write_xlsx(path, [(name, pd.DataFrame({"x": [1]}))])
    assert sheet_names(path) == [name]
    assert read_xlsx(path, name)["x"].tolist() == [1]


def test_is_a_real_zip_package(tmp_path):
    """The artifact must be an actual OOXML package (zip with the workbook
    part), not a renamed CSV."""
    path = str(tmp_path / "pkg.xlsx")
    write_xlsx(path, pd.DataFrame({"a": [1]}))
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert "[Content_Types].xml" in names
    assert "xl/workbook.xml" in names
    assert "xl/worksheets/sheet1.xml" in names


def _front(genomes, acc):
    return pd.DataFrame(
        [
            {"Accuracy": acc, "Size_MB": 1.0, "FPR": 0.05,
             **{k: g[k] for k in GENE_ORDER}}
            for g in genomes
        ]
    )


def test_final_xlsx_roundtrip_into_psi_init(tmp_path):
    """The full reference handoff at the FORMAT level: stage-1 fronts merged
    into a real Final.xlsx, which the stage-2 PSI loader consumes."""
    from cmoop_audio_processing_tpu.algorithms.initializers import psi_init
    from cmoop_audio_processing_tpu.cli.psi_merge import main as merge_main

    gs = all_genomes()[::40][:5]
    a = tmp_path / "a.csv"
    _front(gs, 0.92).to_csv(a, index=False)
    out = tmp_path / "Final.xlsx"
    assert merge_main([str(a), "--out", str(out)]) == 0
    assert zipfile.is_zipfile(out)  # really a workbook, not a CSV fallback
    pop = psi_init(str(out), Constraints(0.9, 2.5, 0.09))
    assert len(pop) == 5
    assert all(p["CV"] == 0 for p in pop)
    assert [p["hparams"] for p in pop] == list(gs)
    # bools decode as bools, not ints
    assert all(isinstance(p["hparams"]["use_bn"], bool) for p in pop)


def test_psi_merge_reads_xlsx_inputs(tmp_path):
    from cmoop_audio_processing_tpu.cli.psi_merge import merge

    gs = all_genomes()
    a = tmp_path / "a.xlsx"
    b = tmp_path / "b.csv"
    write_xlsx(str(a), _front(gs[:3], 0.91))
    _front(gs[5:7], 0.93).to_csv(b, index=False)
    df = merge([str(a), str(b)])
    assert len(df) == 5
    assert df.iloc[0]["Accuracy"] == 0.91


def test_psi_merge_skips_corrupt_xlsx(tmp_path, capsys):
    from cmoop_audio_processing_tpu.cli.psi_merge import merge

    gs = all_genomes()
    good = tmp_path / "good.csv"
    _front(gs[:2], 0.91).to_csv(good, index=False)
    corrupt = tmp_path / "corrupt.xlsx"
    corrupt.write_bytes(b"this is not a zip archive")
    empty = tmp_path / "zero.xlsx"
    empty.write_bytes(b"")
    df = merge([str(corrupt), str(empty), str(good)])
    assert len(df) == 2
    err = capsys.readouterr().err
    assert err.count("skipping") == 2


def test_psi_init_missing_file_clean_exit(tmp_path, capsys):
    """Reference behavior psi_mobo_2.py:365-369: a missing Final.xlsx prints
    an error and yields empty results instead of raising."""
    from cmoop_audio_processing_tpu.algorithms.initializers import psi_init

    missing = str(tmp_path / "Final.xlsx")
    pop = psi_init(missing, Constraints(0.9, 2.5, 0.09))
    assert pop == []
    assert f"Error: The file '{missing}' was not found." in capsys.readouterr().err


def test_nsga2_psi_missing_file_noop_run(tmp_path):
    """Driver-level grace: the search returns an empty front cleanly."""
    import dataclasses

    from cmoop_audio_processing_tpu.algorithms.nsga2 import run_nsga2
    from cmoop_audio_processing_tpu.core.config import get_preset
    from cmoop_audio_processing_tpu.engine.evaluator import FakeEvaluator

    cfg = get_preset("psi_init_sa_nsga").search
    cfg = dataclasses.replace(
        cfg, psi_seed_file=str(tmp_path / "nope.xlsx"), max_gen=2
    )
    pareto, gen_dfs = run_nsga2(cfg, FakeEvaluator())
    assert pareto == [] and gen_dfs == []


def test_sa_nsga2_psi_missing_file_noop_run(tmp_path):
    """The driver every PSI preset actually routes through (algorithm=
    'sa_nsga2') gets the same empty-init grace — a missing Final.xlsx must
    not reach the surrogate fit or the EA with an empty population."""
    import dataclasses

    from cmoop_audio_processing_tpu.algorithms.sa_nsga2 import run_sa_nsga2
    from cmoop_audio_processing_tpu.core.config import get_preset
    from cmoop_audio_processing_tpu.engine.evaluator import FakeEvaluator

    cfg = get_preset("psi_init_sa_nsga").search
    cfg = dataclasses.replace(
        cfg, psi_seed_file=str(tmp_path / "nope.xlsx"), max_gen=2
    )
    pareto, gen_dfs = run_sa_nsga2(cfg, FakeEvaluator())
    assert pareto == [] and gen_dfs == []


def test_psi_init_corrupt_workbook_clean_exit(tmp_path, capsys):
    """A zero-byte or truncated Final.xlsx (torn stage-1 export) is skipped
    with a message like the missing-file case, mirroring psi_merge's
    handling of the identical inputs."""
    from cmoop_audio_processing_tpu.algorithms.initializers import psi_init

    corrupt = tmp_path / "Final.xlsx"
    corrupt.write_bytes(b"")
    pop = psi_init(str(corrupt), Constraints(0.9, 2.5, 0.09))
    assert pop == []
    assert "could not be read" in capsys.readouterr().err


def test_mobo_psi_missing_file_noop_run(tmp_path):
    import dataclasses

    from cmoop_audio_processing_tpu.algorithms.mobo import run_mobo
    from cmoop_audio_processing_tpu.core.config import get_preset
    from cmoop_audio_processing_tpu.engine.evaluator import FakeEvaluator

    cfg = get_preset("psi_mobo_2").mobo
    cfg = dataclasses.replace(
        cfg, psi_seed_file=str(tmp_path / "nope.xlsx"), max_iterations=2
    )
    pareto, gen_dfs = run_mobo(cfg, FakeEvaluator())
    assert pareto == [] and gen_dfs == []


def test_reporter_all_generations_writes_real_workbook(tmp_path):
    from cmoop_audio_processing_tpu.utils.reporting import RunReporter

    rep = RunReporter(str(tmp_path), "run")
    rep.gen_dfs.append(pd.DataFrame({"Generation": [0], "Accuracy": [0.9]}))
    rep.gen_dfs.append(pd.DataFrame({"Generation": [1], "Accuracy": [0.92]}))
    path = rep.all_generations()
    assert path.endswith("all_generations.xlsx") and zipfile.is_zipfile(path)
    assert sheet_names(path) == ["Gen_0", "Gen_1"]
    assert read_xlsx(path, "Gen_1")["Accuracy"].tolist() == [0.92]
    # the combined CSV twin still exists for grep-ability
    combined = pd.read_csv(str(tmp_path / "run" / "all_generations.csv"))
    assert len(combined) == 2


def _tear_sheet_xml(src: str, dst: str) -> None:
    """Rewrite a valid workbook with its sheet1.xml member truncated mid-tag:
    the zip container stays valid, the XML does not."""
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(dst, "w") as zout:
        for info in zin.infolist():
            data = zin.read(info.filename)
            if info.filename == "xl/worksheets/sheet1.xml":
                data = data[: len(data) // 2]
            zout.writestr(info.filename, data)


def test_psi_init_torn_sheet_xml_clean_exit(tmp_path, capsys):
    """A workbook whose zip is intact but whose sheet XML is truncated (torn
    write) raises xml ParseError, not ValueError — it must take the same
    clean no-op path as a corrupt zip."""
    from cmoop_audio_processing_tpu.algorithms.initializers import psi_init

    good = tmp_path / "good.xlsx"
    write_xlsx(str(good), _front(all_genomes()[:3], 0.91))
    torn = tmp_path / "Final.xlsx"
    _tear_sheet_xml(str(good), str(torn))
    pop = psi_init(str(torn), Constraints(0.9, 2.5, 0.09))
    assert pop == []
    assert "could not be read" in capsys.readouterr().err


def test_psi_init_wrong_schema_clean_exit(tmp_path, capsys):
    """A readable workbook that is not a stage-1 Pareto export (e.g. a
    ranked_MOBO.xlsx with no genome columns) must no-op with a message, not
    crash with KeyError in the row loop."""
    from cmoop_audio_processing_tpu.algorithms.initializers import psi_init

    wrong = tmp_path / "ranked.xlsx"
    write_xlsx(str(wrong), pd.DataFrame({"rank": [1, 2], "score": [0.1, 0.2]}))
    pop = psi_init(str(wrong), Constraints(0.9, 2.5, 0.09))
    assert pop == []
    assert "not a stage-1 Pareto export" in capsys.readouterr().err


def test_psi_init_malformed_row_skips_only_that_row(tmp_path, capsys):
    """One malformed VALUE mid-file (NaN in a gene column) must not discard
    the previously-parsed valid rows or turn the stage-2 run into a no-op:
    schema is validated up front, then bad rows skip with a warning
    (round-3 advisor finding, initializers.py row loop)."""
    from cmoop_audio_processing_tpu.algorithms.initializers import psi_init

    gs = all_genomes()
    df = _front(gs[:3], 0.91)
    df.loc[1, "filters"] = float("nan")  # int(NaN) -> ValueError
    path = tmp_path / "partial.csv"
    df.to_csv(path, index=False)
    pop = psi_init(str(path), Constraints(0.9, 2.5, 0.09))
    assert len(pop) == 2
    assert [p["hparams"] for p in pop] == [gs[0], gs[2]]
    err = capsys.readouterr().err
    assert "skipping malformed row 1" in err


def test_psi_init_engine_style_parse_error_is_clean(tmp_path, capsys):
    """Parse failures are normalized by utils/xlsx.read_table regardless of
    exception type — the clean no-op contract cannot be broken by an
    engine-specific error class (e.g. lxml's XMLSyntaxError is a
    SyntaxError subclass that the old (ValueError, ...) envelope missed)."""
    from cmoop_audio_processing_tpu.algorithms.initializers import psi_init
    from cmoop_audio_processing_tpu.utils.xlsx import (
        UnreadableTableError, read_table,
    )

    bad = tmp_path / "bad.xlsx"
    bad.write_bytes(b"PK\x03\x04 definitely not a workbook")
    with pytest.raises(UnreadableTableError):
        read_table(str(bad))
    pop = psi_init(str(bad), Constraints(0.9, 2.5, 0.09))
    assert pop == []
    assert "could not be read" in capsys.readouterr().err


def test_psi_merge_skips_torn_sheet_xml(tmp_path, capsys):
    from cmoop_audio_processing_tpu.cli.psi_merge import merge

    gs = all_genomes()
    good_csv = tmp_path / "good.csv"
    _front(gs[:2], 0.91).to_csv(good_csv, index=False)
    good_x = tmp_path / "good.xlsx"
    write_xlsx(str(good_x), _front(gs[3:4], 0.93))
    torn = tmp_path / "torn.xlsx"
    _tear_sheet_xml(str(good_x), str(torn))
    df = merge([str(torn), str(good_csv)])
    assert len(df) == 2
    assert "skipping" in capsys.readouterr().err
