"""PCA / dimensionality reduction (SURVEY.md §2.10 U1/U5).

The reference only *schedules* PCA: job descriptors carry dim/dim_high
(LASERInputValidator.java:162,176-177) and an external LASER binary
produces reference_pc.txt / reference_pc_var.txt
(ReferencePCAOutputFormat.java:9-15). The engine runs the computation
itself, two ways:

- global_pca: pyspark.ml PCA over assembled vectors — the distributed
  path for one big matrix.
- grouped_pca: per-group numpy SVD inside applyInPandas — the
  reference's per-chunk study-PCA pattern (one black-box analysis per
  chunk, LASERInputValidator.java:169-182), deterministic via a sign
  convention and stable input ordering.

Procrustes projection (study onto reference PC space) is provided for
the TRACE analogue, per-group in numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sign_fix(components: np.ndarray) -> np.ndarray:
    """Deterministic sign convention: largest-|loading| entry positive
    per component (SURVEY.md §7.4 watch-list #4)."""
    flips = np.sign(components[np.abs(components).argmax(axis=0), np.arange(components.shape[1])])
    flips[flips == 0] = 1.0
    return components * flips


def _pca_numpy(x: np.ndarray, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Centered SVD PCA -> (scores n x dim, variance_explained dim)."""
    xc = x - x.mean(axis=0, keepdims=True)
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    comps = _sign_fix(vt.T[:, :dim])
    scores = xc @ comps
    var = (s**2) / max(len(x) - 1, 1)
    var_ratio = var[:dim] / var.sum() if var.sum() > 0 else var[:dim]
    return scores, var_ratio


def global_pca(
    df: DataFrame, *, feature_cols: list[str], id_cols: list[str], dim: int
) -> DataFrame:
    """Distributed PCA via pyspark.ml: (id_cols..., pc array<double>).

    The 100 TB path: the Gramian accumulates in one pass (tree
    aggregation), only k x k eigen-work happens on the driver.
    """
    from pyspark.ml.feature import PCA, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembled = VectorAssembler(inputCols=feature_cols, outputCol="__features").transform(df)
    model = PCA(k=dim, inputCol="__features", outputCol="__pc").fit(assembled)
    out = model.transform(assembled)
    return out.select(*id_cols, vector_to_array("__pc").alias("pc"))


def explained_variance(
    df: DataFrame, *, feature_cols: list[str], dim: int
) -> list[float]:
    """Variance-explained ratios from the ml PCA model (driver-side k values)."""
    from pyspark.ml.feature import PCA, VectorAssembler

    assembled = VectorAssembler(inputCols=feature_cols, outputCol="__features").transform(df)
    model = PCA(k=dim, inputCol="__features", outputCol="__pc").fit(assembled)
    return [float(v) for v in model.explainedVariance]


def grouped_pca(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    feature_cols: list[str],
    dim: int,
) -> DataFrame:
    """U1+U5: per-group PCA scores via applyInPandas.

    One Arrow batch per group -> numpy SVD; rows sorted by id inside the
    group so float summation order is stable across runs.
    Output: (group, id, pc array<double>).
    """
    n_feat = len(feature_cols)
    k = min(dim, n_feat)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        x = pdf[feature_cols].to_numpy(dtype=np.float64)
        scores, _ = _pca_numpy(x, k)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].to_numpy(),
                id_col: pdf[id_col].to_numpy(),
                "pc": [row.tolist() for row in scores],
            }
        )

    schema = f"{group_col} string, {id_col} string, pc array<double>"
    cols = [group_col, id_col, *feature_cols]
    return df.select(*cols).groupBy(group_col).applyInPandas(run, schema)


def procrustes_project(
    study_scores: np.ndarray, reference_scores: np.ndarray
) -> np.ndarray:
    """Procrustes transform mapping study PCs onto the reference PC
    frame (the TRACE step the reference delegates to its binary).

    Orthogonal Procrustes with scaling+translation on the shared rows;
    returns the transformed study coordinates.
    """
    mu_s = study_scores.mean(axis=0, keepdims=True)
    mu_r = reference_scores.mean(axis=0, keepdims=True)
    xs, xr = study_scores - mu_s, reference_scores - mu_r
    u, s, vt = np.linalg.svd(xs.T @ xr, full_matrices=False)
    rot = u @ vt
    scale = s.sum() / max((xs**2).sum(), 1e-300)
    return scale * xs @ rot + mu_r
