"""Run reporting: the reference's CSV/Excel output contract.

Schemas (the compatibility contract, SURVEY.md §5 "Metrics/logging"):

* per-generation rows {Generation, Accuracy, Size_MB, FPR, CV, filters,
  kernel_size, use_bn, residual_blocks, fc_layers, use_dropout}
  (sa_nsga_penalty.py:606-612)
* periodic Pareto CSV every N generations (nsga_penalty.py:737-763)
* final Pareto CSV {Accuracy, Size_MB, FPR, **hparams}
  (nsga_penalty.py:800-821; MOBO adds CV, mobo_penalty.py:513-528)
* all-generations Excel workbook, one sheet per generation
  (nsga_penalty.py:785-788) — written as sheet-per-CSV files when no Excel
  engine is installed (this image lacks openpyxl), plus a combined CSV.

Also emits a structured JSONL timing/progress log (the reference's ad-hoc
perf_counter prints, sa_nsga_penalty.py:537-542,602-603, made machine-
readable).
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from ..core.records import Individual, generation_row, pareto_row


def _excel_available() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        try:
            import xlsxwriter  # noqa: F401

            return True
        except ImportError:
            return False


class RunReporter:
    def __init__(
        self, output_dir: str, run_name: str, periodic_every: int = 5,
        resume: bool = False,
    ):
        self.dir = os.path.join(output_dir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self.run_name = run_name
        self.periodic_every = periodic_every
        self.gen_dfs: List[pd.DataFrame] = []
        self._gen_ids: List[int] = []
        # basenames of final artifacts THIS process wrote — the alias step
        # must not re-alias a previous run's stale files after a no-op run
        self.artifacts_written: set = set()
        self._combined_path = os.path.join(self.dir, "all_generations.csv")
        self._log_path = os.path.join(self.dir, "progress.jsonl")
        self._t0 = time.perf_counter()
        if resume:
            self._restore_generations()
        elif os.path.exists(self._combined_path):
            # fresh run into an existing dir: stale per-generation rows from
            # a previous run must not leak into this run's workbook
            os.unlink(self._combined_path)

    def _restore_generations(self) -> None:
        """Reload the per-generation rows flushed by a previous (crashed or
        completed) process so a resumed run's final ``all_generations``
        workbook still contains the pre-resume generations instead of
        clobbering them. MOBO sheets carry no Generation column (cumulative
        archive snapshots) — the MOBO driver rebuilds them from its restored
        archive instead."""
        if not os.path.exists(self._combined_path):
            return
        try:
            df = pd.read_csv(self._combined_path)
        except Exception:
            return  # torn/empty file; the resumed loop re-records its gens
        if df.empty or "Generation" not in df.columns:
            return
        for g, sub in df.groupby("Generation", sort=True):
            self.gen_dfs.append(sub.reset_index(drop=True))
            self._gen_ids.append(int(g))

    # -- structured progress log ----------------------------------------------

    def log(self, event: str, **fields) -> None:
        rec = {"t": time.perf_counter() - self._t0, "event": event, **fields}
        with open(self._log_path, "a") as f:
            f.write(json.dumps(rec, default=float) + "\n")

    # -- per-generation -------------------------------------------------------

    def record_generation(self, gen: int, pop_data: Sequence[Individual]) -> pd.DataFrame:
        df = pd.DataFrame([generation_row(ind, gen) for ind in pop_data])
        if gen in self._gen_ids:
            # a crash landed between this generation's flush and its
            # checkpoint: the resumed loop re-runs it, superseding the row set
            cut = self._gen_ids.index(gen)
            del self.gen_dfs[cut:]
            del self._gen_ids[cut:]
        self.gen_dfs.append(df)
        self._gen_ids.append(gen)
        self._flush_combined()
        feasibles = [ind for ind in pop_data if ind["CV"] == 0]
        self.log(
            "generation",
            gen=gen,
            frac_feasible=len(feasibles) / max(len(pop_data), 1),
            avg_cv=float(np.mean([ind["CV"] for ind in pop_data])) if pop_data else 0.0,
        )
        return df

    def periodic_pareto(
        self,
        gen: int,
        pareto_set: Sequence[Individual],
        include_cv: bool = False,
        prefix: str = "pareto",
        force: bool = False,
    ) -> Optional[str]:
        """Write the every-N-generations Pareto CSV
        (nsga_penalty.py:738-763: filename pattern *_iteration_{gen+1}.csv;
        the MOBO driver passes prefix="mobo" for its
        mobo_iteration_{it+1}.csv naming, mobo_penalty.py:464, and
        force=True on the last iteration — the reference saves there
        regardless of the every-N schedule, mobo_penalty.py:427)."""
        if not force and (gen + 1) % self.periodic_every != 0:
            return None
        path = os.path.join(self.dir, f"{prefix}_iteration_{gen + 1}.csv")
        pd.DataFrame(
            [pareto_row(ind, include_cv) for ind in pareto_set]
        ).to_csv(path, index=False)
        return path

    # -- final artifacts ------------------------------------------------------

    def final_pareto(
        self, pareto_set: Sequence[Individual], include_cv: bool = False,
        filename: str = "final_pareto.csv",
    ) -> str:
        path = os.path.join(self.dir, filename)
        pd.DataFrame(
            [pareto_row(ind, include_cv) for ind in pareto_set]
        ).to_csv(path, index=False)
        self.artifacts_written.add(filename)
        self.log("final_pareto", n=len(pareto_set), path=path)
        return path

    def all_generations(self, filename: str = "all_generations.xlsx") -> str:
        """Excel workbook with one sheet per generation — the literal
        artifact format of nsga_penalty.py:785-788 (sheet names ``Gen_{i}``).
        Written through pandas when an Excel engine is installed, else
        through the stdlib writer (utils/xlsx.py); a combined CSV twin is
        emitted alongside for grep-ability."""
        path = os.path.join(self.dir, filename)
        if _excel_available():
            with pd.ExcelWriter(path) as writer:
                for i, df in enumerate(self.gen_dfs):
                    df.to_excel(writer, sheet_name=f"Gen_{i}", index=False)
        else:
            from .xlsx import write_xlsx

            sheets = [(f"Gen_{i}", df) for i, df in enumerate(self.gen_dfs)]
            write_xlsx(path, sheets or [("Gen_0", pd.DataFrame())])
        self.artifacts_written.add(filename)
        self._flush_combined()
        return path

    def _flush_combined(self) -> None:
        """Rewrite the combined per-generation CSV after every recorded
        generation — both the grep-able twin of the workbook and the durable
        store ``_restore_generations`` reloads on ``--resume``."""
        if self.gen_dfs:
            pd.concat(self.gen_dfs, ignore_index=True).to_csv(
                self._combined_path, index=False
            )


class StageTimer:
    """Context-manager stage timing feeding the reporter's JSONL log — the
    structured equivalent of the reference's bracketing perf_counter prints
    (sa_nsga_local.py:452-467)."""

    def __init__(self, reporter: Optional[RunReporter], stage: str, **fields):
        self.reporter = reporter
        self.stage = stage
        self.fields = fields
        self.seconds: float = 0.0

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t
        if self.reporter is not None:
            self.reporter.log("stage", stage=self.stage, seconds=self.seconds, **self.fields)
        return False
