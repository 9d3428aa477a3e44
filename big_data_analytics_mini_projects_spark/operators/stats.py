"""Per-group standardized OLS with t-tests + Bonferroni (SURVEY.md §2.8).

Reference: 1,000 parallel regressions, one per top word, each fit with numpy
inside ``mapValues`` (a3_p1.py:71-96 simple, :104-131 multivariate). The
engine keeps the numpy math but runs it as a grouped-map pandas UDF
(``applyInPandas``): Arrow-batched columnar transfer, one group per word —
the one place per SURVEY.md §7.3 where numpy legitimately survives.

Math notes (mirroring the reference exactly):
- predictors and outcome are z-scored with *population* std (np.std,
  a3_p1.py:80-84), intercept appended, solve via pinv -> for the simple case
  the standardized β equals Pearson r (the closed form the DuckDB oracle
  uses).
- t = β / sqrt(s²/Σx²) with s² = RSS/df, Σx² over the z-scored predictor
  (a3_p1.py:89-93); df = n-2 simple, n-3 multivariate; the multivariate SE
  deliberately reproduces the reference's formula (no (X'X)⁻¹ off-diagonal),
  so our numbers match *its* semantics, not the textbook's.
- two-sided p from Student-t sf, Bonferroni-scaled by the number of groups
  tested (the reference hardcodes ×1000 = its word count; we scale by the
  actual K).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.stats_math import t_sf

SIMPLE_SCHEMA = (
    "word string, n long, beta double, t_stat double, p_value double, p_bonf double"
)
MULTI_SCHEMA = (
    "word string, n long, beta double, beta_ctrl double, t_stat double, "
    "p_value double, p_bonf double"
)


def _fit(
    x_mat: np.ndarray, y: np.ndarray, df_resid: int, use_pinv: bool = True
) -> tuple[np.ndarray, float]:
    """Z-score columns (population std), append intercept, solve the normal
    equations, return (weights, t-stat of the first predictor) —
    a3_p1.py:77-93 in matrix form. The simple fit uses pinv (a3_p1.py:86),
    the multivariate one plain inv (a3_p1.py:122, LinAlgError -> NaN row)."""
    nan_out = np.full(x_mat.shape[1] + 1, np.nan), math.nan
    xs = x_mat.std(axis=0)
    ys = y.std()
    if ys == 0.0 or np.any(xs == 0.0):
        return nan_out
    xz = (x_mat - x_mat.mean(axis=0)) / xs
    yz = (y - y.mean()) / ys
    n = len(y)
    design = np.hstack([xz, np.ones((n, 1))])
    gram = design.T @ design
    try:
        g_inv = np.linalg.pinv(gram) if use_pinv else np.linalg.inv(gram)
    except np.linalg.LinAlgError:
        return nan_out
    w = g_inv @ design.T @ yz.reshape(-1, 1)
    rss = float(np.sum((yz.reshape(-1, 1) - design @ w) ** 2))
    s2 = rss / df_resid
    se = float(np.sum(xz[:, 0] ** 2))
    t = float(w[0, 0] / math.sqrt(s2 / se)) if s2 > 0 else math.nan
    return w[:, 0], t


def ols_simple_grouped(
    obs: DataFrame, group_col: str = "word", x_col: str = "x", y_col: str = "y",
    bonferroni_k: int | None = None,
) -> DataFrame:
    """Per-group standardized simple OLS + t-test (a3_p1.py:71-96)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        k = bonferroni_k or 1
        x = pdf[x_col].to_numpy(dtype=float).reshape(-1, 1)
        y = pdf[y_col].to_numpy(dtype=float)
        w, t = _fit(x, y, n - 2)
        p = 2.0 * t_sf(abs(t), n - 2)
        return pd.DataFrame(
            {
                "word": [pdf[group_col].iloc[0]],
                "n": [n],
                "beta": [w[0]],
                "t_stat": [t],
                "p_value": [p],
                "p_bonf": [min(1.0, p * k)],
            }
        )

    return obs.groupBy(group_col).applyInPandas(fit, SIMPLE_SCHEMA)


def ols_multi_grouped(
    obs: DataFrame, group_col: str = "word", x_col: str = "x", ctrl_col: str = "ctrl",
    y_col: str = "y", bonferroni_k: int | None = None,
) -> DataFrame:
    """Per-group standardized 2-covariate OLS, controlling for a second
    covariate (a3_p1.py:104-131; control = `verified` in the reference)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        k = bonferroni_k or 1
        x = pdf[[x_col, ctrl_col]].to_numpy(dtype=float)
        y = pdf[y_col].to_numpy(dtype=float)
        w, t = _fit(x, y, n - 3, use_pinv=False)
        p = 2.0 * t_sf(abs(t), n - 3)
        return pd.DataFrame(
            {
                "word": [pdf[group_col].iloc[0]],
                "n": [n],
                "beta": [w[0]],
                "beta_ctrl": [w[1]],
                "t_stat": [t],
                "p_value": [p],
                "p_bonf": [min(1.0, p * k)],
            }
        )

    return obs.groupBy(group_col).applyInPandas(fit, MULTI_SCHEMA)
