"""Tchebycheff scalarization ranking of a Pareto front.

Reproduces the reference notebook ("Tchebycheff s_rank.ipynb" cell 1):
objectives in minimization form (1-Accuracy, Size_MB, FPR); ideal point z* is
the per-column min; equal weights normalized to 1/3; score is the max weighted
|f - z*|; rank is ascending with ties sharing the min rank (pandas
rank(method='min'))."""

from __future__ import annotations

import numpy as np
import pandas as pd


def tchebycheff_score(
    fx: np.ndarray, z_star: np.ndarray, weights: np.ndarray
) -> np.ndarray:
    diff = np.abs(fx - z_star)
    return np.max(weights * diff, axis=1)


def rank_front(df: pd.DataFrame) -> pd.DataFrame:
    """Input: DataFrame with Accuracy, Size_MB, FPR columns (plus genome
    columns). Output: copy with 1-Accuracy, Tchebycheff Score and Rank
    columns, sorted by Rank ascending."""
    out = df.copy()
    out["1-Accuracy"] = 1.0 - out["Accuracy"]
    fx = out[["1-Accuracy", "Size_MB", "FPR"]].to_numpy(dtype=np.float64)
    z_star = fx.min(axis=0)
    weights = np.array([1.0, 1.0, 1.0])
    weights = weights / weights.sum()
    out["Tchebycheff Score"] = tchebycheff_score(fx, z_star, weights)
    out["Rank"] = out["Tchebycheff Score"].rank(method="min", ascending=True).astype(int)
    return out.sort_values(by="Rank")
